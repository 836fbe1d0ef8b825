package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023),
  * the hashed-n-gram importance weighting used to pick pretraining
  * documents that "look like" a trusted target corpus: featurize every
  * document as a bag of HASHED unigrams+bigrams over `nBuckets`
  * buckets, fit two smoothed multinomials (raw corpus vs target), and
  * score each document by how much more likely its buckets are under
  * the target than under the raw distribution.
  *
  * Numeric design (the [[LmScore]] discipline — no floating log
  * anywhere): bucket probabilities are fixed-point integers under ONE
  * shared scale `S = min(10^9, 2^61 div (max(T_r, T_t) + nBuckets))`,
  * add-one smoothed:
  *
  *   `q_x[b] = ((c_x[b] + 1) · S) div (T_x + nBuckets)`
  *
  * and each bucket's cost under distribution x is its integer surprisal
  * in whole bits, `bits_x[b] = length(bin(S div max(q_x[b], 1))) − 1 =
  * floor(log2(S / q_x[b]))`. The importance score is the per-doc sum
  *
  *   `dsir_bits = Σ_b c_doc[b] · (bits_raw[b] − bits_target[b])`
  *
  * — positive means the document costs fewer bits under the target
  * model, i.e. is more target-like (the paper's log-ratio with log2
  * floored to bits; exact-integer, associative, bit-identical
  * cross-engine). Resampling is one [[Sampling]] call on the score.
  *
  * Scale shape: features hash into a FIXED bucket space, so both
  * models are `nBuckets`-row tables regardless of corpus size. The raw
  * corpus gram-explodes exactly ONCE, into the persisted per-(doc,
  * bucket) count frame that scoring needs anyway; the raw model is a
  * bucket-space aggregate over it (rawC[b] = Σ_doc c_doc[b]) and the
  * target model is one explode + map-side-combinable count over the
  * (small) trusted corpus. Scoring joins the two collected
  * broadcast-sized model tables and reduces per doc. No window, no
  * driver data beyond the two nBuckets-row models. */
object Dsir {

  /** Fixed-point scale ceiling, shared with [[LmScore.MaxScale]]. */
  val MaxScale = 1000000000L
  private val ScaleBudget = 1L << 61

  def adaptiveScale(maxTotal: Long): Long =
    math.max(1L, math.min(MaxScale, ScaleBudget / math.max(maxTotal, 1L)))

  /** Unigrams + bigrams WITH multiplicity (the paper's feature set;
    * [[Dedup.wordGrams]] dedups, which is the wrong tool here). */
  private[llm] def grams(toks: Column): Column = {
    val n = size(toks)
    val bi = when(n >= 2,
        transform(sequence(lit(1), n - 1), i =>
          concat_ws(" ", element_at(toks, i.cast("int")),
            element_at(toks, (i + 1).cast("int")))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bi)
  }

  /** Hashed-gram bucket counts: (bucket, cnt), `nBuckets` rows max. */
  def bucketCounts(docs: DataFrame, textCol: String, nBuckets: Int): DataFrame =
    docs.select(explode(grams(Dedup.tokens(col(textCol)))).as("g"))
      .select(pmod(Dedup.h32(col("g")), lit(nBuckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document importance score in whole bits against a fitted
    * (raw, target) bucket-model pair. Output: (idCol, n_grams,
    * dsir_bits); a doc with no tokens scores (0, 0).
    *
    * The result is MATERIALIZED (eager localCheckpoint — one narrow row
    * per doc) so the per-(doc, bucket) cache can be released before
    * return; [[scorePlan]] is the lazy form whose caches the caller
    * owns (plan pins live there). */
  def score(raw: DataFrame, target: DataFrame,
            textCol: String, idCol: String,
            nBuckets: Int = 10000): DataFrame = {
    val (out, caches) = scorePlan(raw, target, textCol, idCol, nBuckets)
    val r = out.localCheckpoint(true)
    caches.foreach(_.unpersist())
    r
  }

  /** The lazy serve plan plus its live caches — the
    * [[MinHashIndex.nearDupPairsIncrementalPlan]] split: callers of
    * this form own the returned caches. */
  private[llm] def scorePlan(raw: DataFrame, target: DataFrame,
                             textCol: String, idCol: String,
                             nBuckets: Int): (DataFrame, Seq[DataFrame]) = {
    require(nBuckets > 0, "Dsir.score: nBuckets must be positive")
    // ONE gram pass over the raw corpus total (PLANS.md rule 7, round-10
    // rework): the per-(doc, bucket) counts — needed for scoring anyway —
    // SUBSUME the raw model (rawC[b] = Σ_doc c_doc[b]), so the raw side
    // explodes once into the persisted reduced frame and the model falls
    // out of a bucket-space aggregate over it. The target corpus (the
    // small trusted set) pays its own single pass. Both fitted models are
    // <= nBuckets rows: collected once, totals derived locally, and the
    // broadcast build sides rebuilt as local relations — no corpus
    // subtree ever re-executes.
    val perDoc = raw
      .select(col(idCol).as("doc_id"),
        explode(grams(Dedup.tokens(col(textCol)))).as("g"))
      .select(col("doc_id"), pmod(Dedup.h32(col("g")), lit(nBuckets.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c_doc"))
      .persist()
    val rawRows = perDoc.groupBy("bucket")
      .agg(sum(col("c_doc")).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val tgtRows = bucketCounts(target, textCol, nBuckets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val out = scoreTail(perDoc, raw.select(col(idCol).as("doc_id")).distinct(),
      Model(rawRows, tgtRows, nBuckets), idCol)
    (out, Seq(perDoc))
  }

  // ---- frozen-model (fit-once / score-daily) form ---------------------

  /** A fitted DSIR model pair — the shipped artifact of [[fit]]: two
    * bucket-space count tables plus the derived totals. `nBuckets` rows
    * per side regardless of corpus size: METADATA, not data. */
  case class Model(rawRows: Seq[(Long, Long)], tgtRows: Seq[(Long, Long)],
                   nBuckets: Int) {
    require(nBuckets > 0, "Dsir.Model: nBuckets must be positive")
    val tRaw: Long = rawRows.map(_._2).sum
    val tTgt: Long = tgtRows.map(_._2).sum
  }

  /** Fit the (raw, target) multinomials ONCE — the production posture:
    * the reference corpus pays one gram pass per side at fit time, then
    * daily batches are scored against the frozen artifact without ever
    * touching it again ([[scoreWith]]). */
  def fit(raw: DataFrame, target: DataFrame, textCol: String,
          nBuckets: Int = 10000): Model = {
    require(nBuckets > 0, "Dsir.fit: nBuckets must be positive")
    def rows(df: DataFrame) =
      bucketCounts(df, textCol, nBuckets).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    Model(rows(raw), rows(target), nBuckets)
  }

  /** Persist a fitted model: (side, bucket, cnt) rows + an nBuckets
    * meta row — a few KB of parquet any session can [[readModel]].
    * Published atomically via a `v_<seq>` + `_SUCCESS` version dir
    * ([[VersionedArtifact]]): a crash between the two tables leaves
    * the previous committed model readable, never a torn artifact. */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    val vdir = VersionedArtifact.nextVersionDir(spark, path)
    (model.rawRows.map { case (b, c) => ("raw", b, c) } ++
      model.tgtRows.map { case (b, c) => ("target", b, c) })
      .toDF("side", "bucket", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/counts")
    Seq(model.nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/_meta")
    VersionedArtifact.commitAndPrune(spark, path, vdir,
      legacyEntries = Seq("counts", "_meta"))
  }

  def readModel(spark: SparkSession, path: String): Model = {
    val dir = VersionedArtifact.currentDir(spark, path).getOrElse(path)
    val rows = spark.read.parquet(s"$dir/counts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nb = spark.read.parquet(s"$dir/_meta").head().getInt(0)
    Model(rows.filter(_._1 == "raw").map(r => (r._2, r._3)).toSeq,
      rows.filter(_._1 == "target").map(r => (r._2, r._3)).toSeq, nb)
  }

  /** Score a batch against a FROZEN model: one gram pass over the BATCH
    * plus two broadcast joins of nBuckets-row local relations — the
    * corpora that fit the model are never read. Bit-identical to
    * [[score]] when the model was fit on (raw ⊇ batch, target): the
    * scale, smoothing, and surprisal arithmetic depend only on the
    * model. Output contract matches [[score]] (one row per batch doc;
    * empty docs score (0, 0)). */
  def scoreWith(model: Model, batch: DataFrame,
                textCol: String, idCol: String): DataFrame = {
    val perDoc = batch
      .select(col(idCol).as("doc_id"),
        explode(grams(Dedup.tokens(col(textCol)))).as("g"))
      .select(col("doc_id"),
        pmod(Dedup.h32(col("g")), lit(model.nBuckets.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c_doc"))
    scoreTail(perDoc, batch.select(col(idCol).as("doc_id")).distinct(),
      model, idCol)
  }

  /** Shared scoring tail: per-(doc, bucket) counts × frozen model →
    * per-doc (n_grams, dsir_bits), docs without grams included at 0. */
  private def scoreTail(perDoc: DataFrame, ids: DataFrame,
                        model: Model, idCol: String): DataFrame = {
    val spark = perDoc.sparkSession
    import spark.implicits._
    val nBuckets = model.nBuckets
    val s = adaptiveScale(math.max(model.tRaw, model.tTgt) + nBuckets)
    // bits tables are bucket-space sized; add-one smoothing covers EMPTY
    // buckets through the left joins below (c = 0 -> q = S div (T + B)).
    // Integer `div` throughout: the (c+1)·S product reaches S·T <= 2^61
    // by the shared-scale choice, and floor-log2 is bin-string length.
    def bitsOf(cntCol: String, total: Long): Column =
      length(bin(expr(s"${s}L div greatest(" +
        s"((coalesce($cntCol, 0L) + 1L) * ${s}L) div ${total + nBuckets}L, 1L)"))) - 1
    val rawC = model.rawRows.toDF("bucket", "c_raw")
    val tgtC = model.tgtRows.toDF("bucket", "c_tgt")
    val joined = perDoc
      .join(broadcast(rawC), Seq("bucket"), "left")
      .join(broadcast(tgtC), Seq("bucket"), "left")
      .select(col("doc_id"), col("c_doc"),
        (bitsOf("c_raw", model.tRaw) - bitsOf("c_tgt", model.tTgt))
          .cast("long").as("dbits"))
    val scored = joined.groupBy("doc_id")
      .agg(sum(col("c_doc")).as("n_grams"),
        sum(col("c_doc") * col("dbits")).as("dsir_bits"))
    ids.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_bits"), lit(0L)).as("dsir_bits"))
  }
}
