package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale selection by score quantiles — "keep the top 25% by
  * quality" without a global sort.
  *
  * Every score this library emits is a discrete integer (fixed-point
  * per-mille ratios, whole-bit surprisals, token counts — the [[LmScore]]
  * / [[Dsir]] numeric discipline), so a corpus's score DISTRIBUTION is
  * exactly representable as a value histogram of at most |score domain|
  * rows — independent of corpus size. Exact quantiles then cost:
  *
  *   1. ONE map-side-combinable `groupBy(score)` pass (the histogram —
  *      partial aggregation collapses each task to ≤ |domain| rows
  *      before the only exchange);
  *   2. a cumulative sum over the tiny histogram (a single-partition
  *      window over BOUNDED rows — histogram data, never corpus data);
  *   3. a broadcast threshold comparison.
  *
  * No global sort, no approximation — and the same histogram audits
  * Spark's `percentile_approx` sketch against the exact answer (the
  * `heavy_hitters` posture: the sketch is the one-pass mergeable
  * production shape; the exact path certifies it at gate scale).
  *
  * Contrast with `ORDER BY score` + `row_number`: the naive exact
  * quantile funnels the full corpus through one reducer. Contrast with
  * `approx_percentile` alone: rank error `n/accuracy` is invisible until
  * it silently moves a 100 TB keep-threshold by millions of documents.
  *
  * Quantile convention (pinned by the gates, DuckDB `quantile_disc`
  * direction): `q(p) = min{ v : |{score ≤ v}| ≥ ceil(p·n/1000) }` — the
  * p-per-mille-th smallest value; integer arithmetic throughout
  * (`ceil(a/b) = (a + b − 1) div b`, no floating division anywhere). */
object Selection {

  /** Score histogram: `(score, c)`, one row per distinct value — the
    * bounded summary every other operator here reads. One corpus pass,
    * map-side combinable. */
  def histogram(df: DataFrame, scoreCol: String): DataFrame =
    df.select(col(scoreCol).cast("long").as("score"))
      .groupBy("score").agg(count(lit(1)).as("c"))

  /** Exact per-mille quantiles, plus a rank-audit of Spark's
    * `percentile_approx` sketch against each exact answer.
    *
    * Output, one row per requested p: `(p_mille, target_rank, q_value,
    * approx_ok)` where `q_value` is exact and `approx_ok` certifies that
    * the sketch's returned value occupies a rank interval within
    * `max(1, n div accuracy)` of the target — the documented
    * `percentile_approx` guarantee. The histogram/corpus never reaches
    * the driver; the only collected values are n (one row) and the
    * sketch's output (|ps| doubles). */
  def exactQuantiles(df: DataFrame, scoreCol: String, psPerMille: Seq[Int],
                     approxAccuracy: Int = 10000): DataFrame = {
    require(psPerMille.nonEmpty, "Selection.exactQuantiles: need at least one p")
    require(psPerMille.forall(p => p >= 1 && p <= 1000),
      "Selection.exactQuantiles: p is per-mille in [1, 1000]")
    val spark = df.sparkSession
    import spark.implicits._

    // rule 7: the histogram feeds the cumulative branch, the total and
    // the audit join — persist the ≤|domain|-row frame, not the corpus.
    val h = histogram(df, scoreCol).persist()
    val n = h.agg(coalesce(sum(col("c")), lit(0L))).as[Long].head()
    if (n == 0L) { h.unpersist(); return emptyQuantiles(spark) }

    val cum = h.withColumn("cc",
      sum(col("c")).over(Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // target rank per p: ceil(p·n/1000) in exact integer arithmetic
    val psFix = psPerMille.distinct.sorted
      .map(p => (p, (p.toLong * n + 999L) / 1000L)).toDF("p_mille", "target_rank")

    // q(p) = min score whose cumulative count reaches the target rank.
    // Theta-join, but both sides are bounded (|ps| × |domain|): the
    // broadcast nested loop is over histogram rows, never corpus rows.
    val exact = cum.join(broadcast(psFix), col("cc") >= col("target_rank"))
      .groupBy("p_mille", "target_rank").agg(min(col("score")).as("q_value"))

    // Sketch audit: percentile_approx over the CORPUS (the production
    // one-pass path), then locate each returned value's rank interval
    // [cc − c + 1, cc] in the exact histogram.
    val fracs = psPerMille.distinct.sorted.map(_ / 1000.0)
    val approxVals = df.agg(
      percentile_approx(col(scoreCol).cast("long"),
        typedLit(fracs), lit(approxAccuracy)).as("vs"))
      .as[Seq[Double]].head()
    val tol = math.max(1L, n / approxAccuracy)
    val audit = psPerMille.distinct.sorted.zip(approxVals)
      .map { case (p, v) => (p, v.toLong) }.toDF("p_mille", "approx_value")
    val auditOk = audit.join(cum, col("approx_value") === col("score"))
      .select(col("p_mille"),
        col("cc").as("a_hi"), (col("cc") - col("c") + 1L).as("a_lo"))

    val out = exact.join(broadcast(auditOk), Seq("p_mille"), "left")
      .select(col("p_mille"), col("target_rank"), col("q_value"),
        (col("a_lo").isNotNull &&
          col("a_lo") <= col("target_rank") + lit(tol) &&
          col("a_hi") >= col("target_rank") - lit(tol)).as("approx_ok"))
      .orderBy("p_mille")
      .localCheckpoint(true)
    h.unpersist()
    out
  }

  private def emptyQuantiles(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("p_mille", IntegerType),
        StructField("target_rank", LongType), StructField("q_value", LongType),
        StructField("approx_ok", BooleanType))))
  }

  /** The keep-threshold for "keep the top `keepPerMille` by score":
    * `t = max{ v : |{score ≥ v}| ≥ k }` with `k = ceil(keep·n/1000)` —
    * keeping `score ≥ t` retains at least k documents, and t is the
    * highest threshold that does (ties at t are kept INCLUSIVELY; the
    * overshoot is exactly the tie mass at t). Returns (t, n, kept).
    * Driver cost: one histogram aggregate + one ≤|domain|-row reduction. */
  def topFractionThreshold(df: DataFrame, scoreCol: String,
                           keepPerMille: Int): (Long, Long, Long) = {
    require(keepPerMille >= 1 && keepPerMille <= 1000,
      "Selection.topFractionThreshold: keepPerMille in [1, 1000]")
    val spark = df.sparkSession
    import spark.implicits._
    val h = histogram(df, scoreCol).persist()
    val n = h.agg(coalesce(sum(col("c")), lit(0L))).as[Long].head()
    if (n == 0L) { h.unpersist(); return (Long.MinValue, 0L, 0L) }
    val k = (keepPerMille.toLong * n + 999L) / 1000L
    // descending cumulative: count of scores >= v
    val ccd = h.withColumn("ccd",
      sum(col("c")).over(Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val row = ccd.filter(col("ccd") >= k)
      .agg(max(col("score")).as("t")).as[Long].head()
    val kept = ccd.filter(col("score") >= row)
      .agg(max(col("ccd"))).as[Long].head()
    h.unpersist()
    (row, n, kept)
  }

  /** CCNet-style per-group quantile buckets (Wenzek et al. 2020 split
    * each language's corpus into head/middle/tail by per-language
    * perplexity terciles — a GLOBAL threshold would let high-resource
    * languages define "good" for everyone). For each group, the cut
    * thresholds `q_g(p) = min{ v : |{score ≤ v, group = g}| ≥
    * ceil(p·n_g/1000) }` are computed from the per-group histogram;
    * every row gets `bucket` = how many of its group's cuts its score
    * exceeds (0 = lowest … |cuts| = highest).
    *
    * Scale shape: the histogram is one map-side-combinable
    * `groupBy(group, score)` corpus pass bounded by |groups|·|domain|
    * rows; the per-group cumulative window partitions BY GROUP (each
    * partition ≤ |domain| rows — histogram data, never corpus data);
    * thresholds (|groups|·|cuts| rows) broadcast back onto the corpus.
    * No global sort, no per-row driver state. Output: input columns +
    * `bucket` (int). */
  def groupQuantileBuckets(df: DataFrame, groupCol: String, scoreCol: String,
                           cutsPerMille: Seq[Int]): DataFrame = {
    require(cutsPerMille.nonEmpty, "Selection.groupQuantileBuckets: need cuts")
    require(cutsPerMille.forall(p => p >= 1 && p <= 999),
      "Selection.groupQuantileBuckets: cuts are per-mille in [1, 999]")
    require(cutsPerMille == cutsPerMille.sorted,
      "Selection.groupQuantileBuckets: cuts must be ascending")
    val spark = df.sparkSession
    import spark.implicits._
    val h = df.select(col(groupCol).as("__g"), col(scoreCol).cast("long").as("__s"))
      .groupBy("__g", "__s").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("__g").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("__g")
    val cum = h
      .withColumn("cc", sum(col("c")).over(wCum))
      .withColumn("n_g", sum(col("c")).over(wTot))
    val cuts = cutsPerMille.toDF("p_mille")
    // per (group, cut): min score reaching the group's target rank
    val thr = cum.crossJoin(broadcast(cuts))
      .filter(col("cc") * lit(1000L) >= col("p_mille").cast("long") * col("n_g"))
      .groupBy(col("__g"), col("p_mille"))
      .agg(min(col("__s")).as("q"))
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(struct(col("p_mille"), col("q"))))
        .as("qs"))
      .select(col("__g"), expr("transform(qs, x -> x.q)").as("qs"))
    df.join(broadcast(thr), df(groupCol) === thr("__g"), "left")
      .withColumn("bucket",
        coalesce(aggregate(col("qs"), lit(0),
          (acc, q) => acc + when(col(scoreCol).cast("long") > q, 1).otherwise(0)),
          lit(0)))
      .drop("__g", "qs")
  }

  /** Keep the top `keepPerMille` of `df` by `scoreCol` (ties at the
    * threshold kept inclusively — deterministic, never score-order-
    * dependent). Two corpus passes: the histogram aggregate and a
    * literal-threshold filter (a pushdown-able comparison when the score
    * is a stored column; a cheap projection otherwise). The threshold is
    * ONE long — no per-row join, no sort. */
  def keepTopFraction(df: DataFrame, scoreCol: String,
                      keepPerMille: Int): DataFrame = {
    val (t, n, _) = topFractionThreshold(df, scoreCol, keepPerMille)
    if (n == 0L) df else df.filter(col(scoreCol).cast("long") >= lit(t))
  }
}
