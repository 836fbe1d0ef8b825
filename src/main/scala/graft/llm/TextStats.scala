package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality scoring, language
  * identification, document fingerprinting. All pure per-row projections
  * (higher-order Column functions, no UDF, no shuffle) — they hold
  * unchanged at any scale.
  *
  * Numeric note: every score is built from integer counts and single IEEE
  * divisions/multiplications (no transcendentals), so results are
  * bit-identical across engines — required by the DuckDB oracle gate.
  */
object TextStats {

  /** Whitespace token count (empties dropped). */
  def wsTokenCount(text: Column): Column =
    size(Dedup.tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * every other non-space char count as one token each — the standard
    * cheap pre-tokenizer shape. */
  def regexTokenCount(text: Column): Column =
    size(expr(s"regexp_extract_all(lower(${text.toString}), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(expr(s"regexp_extract_all(${text.toString}, '[.,!?;:]', 0)"))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality metrics + a composite score in [0,1]:
    * 0.4·min(len,500)/500 + 0.3·stopword_ratio + 0.3·(1 − punct_ratio).
    * Long-enough, naturally-worded, low-punctuation-noise docs score high —
    * the usual pretraining-quality heuristic family. */
  def qualityMetrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val nTok = wsTokenCount(t).cast("double")
    val stopHits = size(filter(Dedup.tokens(t), c => array_contains(typedLit(Stopwords), c)))
    val stopRatio = when(nTok > 0, stopHits.cast("double") / nTok).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punctCount(t).cast("double") / nChars).otherwise(lit(0.0))
    val lenNorm = least(nChars, lit(500.0)) / lit(500.0)
    df.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      stopRatio.as("stopword_ratio"),
      punctRatio.as("punct_ratio"),
      (lit(0.4) * lenNorm + lit(0.3) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio))
        .as("quality_score"))
  }

  /** Language profiles: marker tokens per language. A frequency-profile
    * mechanism demo — swap in real per-language n-gram profiles for
    * production use (the harness corpus shares one vocabulary across its
    * `lang` labels, so no profile can recover those labels). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "row", "fast"),
    "de" -> Seq("table", "hash", "batch", "window"),
    "es" -> Seq("data", "query", "scan", "stream"),
    "fr" -> Seq("order", "merge", "group", "line"),
    "zh" -> Seq("spark", "join", "column", "part"))

  /** Predicted language = argmax of marker-token hit count (with
    * multiplicity); ties break by profile order above (first wins). */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val scores = LangProfiles.map { case (lang, markers) =>
      lang -> size(filter(toks, c => array_contains(typedLit(markers), c)))
    }
    // first profile with score >= all others wins (deterministic ties)
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit(LangProfiles.head._1)) { case ((lang, s), acc) =>
      when(s === maxScore, lit(lang)).otherwise(acc)
    }
  }

  /** Corpus vocabulary head: the k most frequent whitespace tokens.
    * The classic map-side-combinable shape — explode + hash aggregate
    * (partial per partition, one k-bounded exchange via
    * TakeOrderedAndProject) — so the shuffle carries one partial count
    * per distinct token per mapper, never the token stream. Ties break
    * on the token string, making the cut at rank k deterministic. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(k)

  /** Windowed min-fingerprint (winnowing-lite): hash every `w`-char
    * window (md5 prefix standing in for a Rabin rolling hash — same
    * windowed-min structure, engine-portable), keep the minimum — a
    * locality-sensitive document fingerprint for clone detection. */
  def fingerprint(text: Column, window: Int = 8): Column = {
    val t = s"lower(${text.toString})"
    expr(
      s"""array_min(transform(
            sequence(1, greatest(length($t) - ${window - 1}, 1)),
            i -> cast(conv(substring(md5(substring($t, i, $window)), 1, 8), 16, 10) as bigint)))""")
  }
}
