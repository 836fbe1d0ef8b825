package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — turn an irregular event
  * stream into one row per (key, grid instant) carrying the most recent
  * observation at or before that instant. The standard time-series
  * regularization step (gap-fill, downsample-to-grid) ahead of window
  * features or model training.
  *
  * Built by composition: grid generation (one sequence() explode per
  * key, rows ∝ span/step — data-proportional) + AsOfJoin (union+window,
  * one shuffle). No per-instant subqueries, no dense cross join against
  * a calendar table.
  */
object Resample {

  /** @param payload observation columns to forward-fill onto the grid
    * @param stepSeconds grid step; instants are aligned to step
    *        boundaries (date_trunc-style), spanning each key's
    *        [min(ts), max(ts)] — the leading instant before the first
    *        observation carries nulls (nothing to fill from yet)
    * @param toleranceUs optional staleness bound: observations older
    *        than this at a grid instant surface as null (gap, not fill)
    *
    * The observation side must be unique per (key, ts) — pre-aggregate
    * duplicates to one row (AsOfJoin contract). */
  def ffill(
      obs: DataFrame, key: String, ts: String,
      payload: Seq[String], stepSeconds: Long,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(stepSeconds > 0, "ffill: stepSeconds must be positive")
    val stepUs = stepSeconds * 1000000L
    // floor-align the bounds (RangeJoin.bucketOf): plain `div` truncates
    // toward zero and would misalign pre-1970 grids vs the floor the
    // DuckDB oracle's `//` computes
    val grid = obs.groupBy(col(key))
      .agg(min(col(ts)).as("__lo"), max(col(ts)).as("__hi"))
      .withColumn("__lo_us", unix_micros(col("__lo").cast("timestamp")))
      .withColumn("__hi_us", unix_micros(col("__hi").cast("timestamp")))
      .select(col(key), explode(sequence(
        timestamp_micros(RangeJoin.bucketOf("__lo_us", stepUs) * stepUs),
        timestamp_micros(RangeJoin.bucketOf("__hi_us", stepUs) * stepUs),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("grid_ts"))
    AsOfJoin.asOf(grid, obs, key, "grid_ts", ts, payload, toleranceUs)
  }
}
