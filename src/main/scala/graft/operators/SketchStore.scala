package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch store: per-partition (per-day) HyperLogLog sketches
  * persisted as binary columns, re-aggregable across any partition range
  * WITHOUT touching raw rows again — the incremental distinct-count
  * pattern every long-running pipeline needs (daily unique users /
  * unique documents / unique urls over arbitrary date windows). The
  * reference library's BigQuery lineage has exactly this in
  * HLL_COUNT.MERGE over pre-aggregated sketches; here it is Spark's
  * Datasketches HLL (`hll_sketch_agg` / `hll_union_agg` — codegen'd,
  * map-side-combinable partial aggregates).
  *
  * Scale posture: the daily build is one pass over that day's rows with
  * constant per-group state (lgK=12 → ≤ ~16 KB per sketch); a served
  * window reads |days × groups| SKETCH ROWS under a planning-time
  * partition filter — serving cost is independent of raw-row count.
  * Appending the same day twice is SAFE for the estimate (HLL union is
  * idempotent on duplicates — re-ingested rows cannot inflate the
  * distinct count), which makes retry semantics trivial.
  *
  * The estimate is approximate by construction, so the correctness gate
  * follows the repo's sketch-audit pattern (`heavy_hitters`,
  * `approx_distinct_users`): exact counts cross the oracle, the sketch
  * crosses as a bounded-relative-error flag. */
object SketchStore {

  /** Build and APPEND one partition's sketches: one hash-aggregate pass
    * over `df` (which should already be filtered to the partition's
    * rows), written under `part=<part>/`. */
  def append(df: DataFrame, groupCols: Seq[String], valueCol: String,
             path: String, part: String, lgK: Int = 12): Unit = {
    require(groupCols.nonEmpty, "SketchStore.append: need group columns")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
      .withColumn("part", lit(part))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** Build sketches for MANY partitions in one pass (initial backfill):
    * one hash aggregate keyed by (part, groups), one partitioned append
    * write. Daily increments then use [[append]]. */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
            partCol: String, path: String, lgK: Int = 12): Unit = {
    require(groupCols.nonEmpty, "SketchStore.build: need group columns")
    df.groupBy((col(partCol).cast("string").as("part") +: groupCols.map(col)): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** Union-serve the store over a partition subset (None = all): reads
    * only the named `part=` directories (planning-time PartitionFilter),
    * merges per group, returns (groupCols..., n_approx). */
  def estimate(spark: SparkSession, path: String, groupCols: Seq[String],
               parts: Option[Seq[String]] = None): DataFrame = {
    val base = spark.read.parquet(path)
    val pruned = parts.map(p => base.filter(col("part").isin(p: _*))).getOrElse(base)
    pruned.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_approx"))
  }

  /** Audit a served window against the exact distinct count over the
    * same raw rows: (groupCols..., n_exact, hll_ok) where hll_ok pins
    * |approx − exact| ≤ tolPct% of exact. */
  def estimateAudit(raw: DataFrame, groupCols: Seq[String], valueCol: String,
                    spark: SparkSession, path: String,
                    parts: Option[Seq[String]] = None,
                    tolPct: Double = 5.0): DataFrame = {
    val exact = raw.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    val approx = estimate(spark, path, groupCols, parts)
    exact.join(approx, groupCols)
      .select(groupCols.map(col) :+ col("n_exact") :+
        (abs(col("n_approx") - col("n_exact")) <=
          lit(tolPct / 100.0) * col("n_exact")).as("hll_ok"): _*)
  }
}
