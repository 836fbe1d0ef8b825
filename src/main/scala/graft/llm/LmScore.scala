package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the KenLM-shaped quality signal of
  * web-corpus curation (CCNet/RefinedWeb): train count tables on a
  * trusted reference slice, score every candidate document by how
  * typical its token transitions are, filter or bucket on the score.
  *
  * Model: bigram STUPID BACKOFF (Brants et al. 2007 — the scheme built
  * for web-scale distributed count tables, which is exactly this
  * setting): a seen bigram scores its MLE `c2/c1`; an unseen one backs
  * off to the add-one unigram `α · (cU+1)/(N+V)` with α = 2/5. Plain
  * add-one bigram smoothing is NOT used deliberately: it gives a
  * fully-OOV token probability 1/V (an unseen CONTEXT contributes no
  * denominator mass), which can score gibberish above natural text with
  * frequent contexts — the backoff-to-unigram path is what makes the
  * signal monotone in typicality (R6Spec pins natural < gibberish
  * surprisal).
  *
  * Numeric design (same discipline as [[Retrieval]]'s log-free IDF):
  * everything after tokenization is EXACT INTEGER arithmetic, so scores
  * are associative — independent of partition merge order — and
  * bit-identical cross-engine:
  *
  *  - fixed-point probability, adaptive scale `S = min(10^9,
  *    2^61 div (N+V))` chosen at train time so `c2·S ≤ N·S ≤ 2^61`
  *    never overflows Long at ANY corpus size (at 10^13 training
  *    tokens S degrades to ~2·10^5 — still 17+ bits of score
  *    resolution);
  *  - seen:    `p = (c2·S) div c1`;
  *  - unseen:  `p = (2 · (((cU+1)·S) div (N+V))) div 5` — the two-step
  *    division order IS the contract (both engines compute
  *    numerator-first, so the result is identical, not merely close);
  *  - integer surprisal in whole bits, no floating log anywhere:
  *    `bits = length(bin(S div max(p,1))) − 1` =
  *    `floor(log2(S/p))` — low = fluent/typical; saturates at
  *    `log2(S)` ≈ 30 bits when p rounds to zero (the probability
  *    floor).
  *
  * Scale shape: training is two map-side-combinable aggregations on
  * content-uniform keys (bigram and unigram counts; context counts
  * reduce the bigram TABLE, not the corpus) plus two driver scalars
  * (N, V). Scoring explodes each doc's bigrams once, LEFT-equi-joins
  * the count tables (model side is vocabulary-sized — AQE broadcasts it
  * when small, hash-joins when not), and reduces per doc. No window, no
  * cartesian, no driver data. */
object LmScore {

  /** Fixed-point scale ceiling; the adaptive scale never exceeds it. */
  val MaxScale = 1000000000L

  private val ScaleBudget = 1L << 61

  /** The train-time scale for a corpus of `n` tokens and `v` vocab. */
  def adaptiveScale(n: Long, v: Long): Long =
    math.max(1L, math.min(MaxScale, ScaleBudget / math.max(n + v, 1L)))

  /** A trained stupid-backoff bigram model: `bigrams(a, b, c2)`,
    * `contexts(a, c1)` with c1 = Σ_b c2(a,b), `unigrams(b, cU)`, vocab
    * size V, total token count N, and the fixed-point scale S. */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         unigrams: DataFrame, vocab: Long, tokens: Long,
                         scale: Long)

  private def bigramsOf(toks: Column): Column = {
    val n = size(toks)
    when(n >= 2,
        transform(sequence(lit(1), n - 1), i =>
          struct(element_at(toks, i.cast("int")).as("a"),
            element_at(toks, (i + 1).cast("int")).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  /** Train the count tables over `docs`. One explode + groupBy each for
    * the bigram and unigram tables; contexts reduce the bigram table
    * (vocabulary-sized input, not corpus-sized); N and V ride on the
    * unigram aggregation — bounded driver scalars, not data. */
  def train(docs: DataFrame, textCol: String): Model = {
    val toks = Dedup.tokens(col(textCol))
    val bigrams = docs
      .select(explode(bigramsOf(toks)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy(col("a")).agg(sum(col("c2")).as("c1"))
    val unigrams = docs.select(explode(toks).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cu"))
    // coalesce: an empty/all-null training corpus must fail the vocab>0
    // require in score() with a clear message, not NPE here on a null SUM
    val nv = unigrams.agg(coalesce(sum(col("cu")), lit(0L)), count(lit(1)))
      .collect()(0)
    val (n, v) = (nv.getLong(0), nv.getLong(1))
    Model(bigrams, contexts, unigrams, vocab = v, tokens = n,
      scale = adaptiveScale(n, v))
  }

  /** Score every document: `n_bigrams`, `sum_p` (Σ fixed-point backoff
    * probability — high = typical) and `sum_bits` (Σ integer surprisal
    * bits — low = typical; the filterable perplexity-family signal).
    * Documents with fewer than two tokens score (0, 0, 0). */
  def score(docs: DataFrame, textCol: String, idCol: String,
            model: Model): DataFrame = {
    require(model.vocab > 0, "LmScore.score: empty model vocabulary")
    val toks = Dedup.tokens(col(textCol))
    // per-doc bigram MULTIPLICITY first (map-side combinable): p and bits
    // are constants per (a, b), so the model join only needs one row per
    // DISTINCT doc-bigram and the sums weight by count — on natural text
    // this shrinks the join input (and its shuffle) several-fold with
    // bit-identical results
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(bigramsOf(toks)).as("p"))
      .groupBy(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val s = model.scale
    val nv = model.tokens + model.vocab
    val pExpr = expr(
      s"""CASE WHEN c2 IS NOT NULL THEN (c2 * ${s}L) div c1
         |     ELSE (2L * (((coalesce(cu, 0L) + 1L) * ${s}L) div ${nv}L)) div 5L
         |END""".stripMargin)
    val scored = pairs
      .join(model.bigrams, Seq("a", "b"), "left")
      .join(model.contexts, Seq("a"), "left")
      .join(model.unigrams, Seq("b"), "left")
      .select(col("doc_id"), col("cnt"), pExpr.as("p_scaled"))
      .select(col("doc_id"), col("cnt"), col("p_scaled"),
        (length(bin(expr(s"${s}L div greatest(p_scaled, 1L)"))) - 1)
          .cast("long").as("bits"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("p_scaled") * col("cnt")).as("sum_p"),
        sum(col("bits") * col("cnt")).as("sum_bits"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_p"), lit(0L)).as("sum_p"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"))
  }
}
