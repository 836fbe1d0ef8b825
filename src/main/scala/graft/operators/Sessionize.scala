package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since the
  * previous event of the same key exceeds `gapUs`. One shuffle on the key,
  * one sort — the same two window passes (lag, running sum) fuse into a
  * single sort+window stage in the physical plan.
  *
  * Tie-safety: rows with equal timestamps produce a gap of 0 in whatever
  * intra-tie order the sort emits them, so session assignment is
  * deterministic even with duplicate times — no tie-break column needed.
  */
object Sessionize {

  /** Adds a `session_idx` column: 1-based running session ordinal per key. */
  def withSessionIdx(df: DataFrame, key: String, ts: String, gapUs: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts))
    val run = Window.partitionBy(key).orderBy(col(ts))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tus = unix_micros(col(ts).cast("timestamp"))
    val prev = lag(tus, 1).over(order)
    val isNew = when(prev.isNull || tus - prev > gapUs, 1L).otherwise(0L)
    df.withColumn("session_idx", sum(isNew).over(run))
  }

  /** Per-session aggregate rows: (key, session_idx, n_events, start_us,
    * end_us). Epoch-microsecond bounds keep the output engine-portable. */
  def sessions(df: DataFrame, key: String, ts: String, gapUs: Long): DataFrame =
    withSessionIdx(df, key, ts, gapUs)
      .groupBy(col(key), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(ts).cast("timestamp"))).as("start_us"),
        max(unix_micros(col(ts).cast("timestamp"))).as("end_us"))
}
