package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column null counts, exact/approx distinct
  * cardinality, and min/max — the "what is in this table" artifact that
  * fronts every curation decision (which columns are keys, which are
  * dead, what ranges partitioning should target). The dbt ecosystem
  * ships this as a package over the reference's host warehouse; here it
  * is one declarative Spark job.
  *
  * Two variants, one contract:
  *
  *  - [[profile]] — EXACT distinct counts. Multiple `count(distinct)`
  *    aggregates compile to Catalyst's Expand: the scan is read once
  *    but the aggregation input is replicated once per profiled column.
  *    Exactness costs a ~k× wider exchange on a k-column profile —
  *    right for gate-sized certification and modest tables;
  *  - [[profileApprox]] — HLL++ (`approx_count_distinct`, rsd
  *    configurable) for every distinct count. Single pass, NO Expand,
  *    one 1-row final aggregate: the 100 TB shape, where a 2% relative
  *    error on cardinality answers every profiling question and the
  *    exact variant's replicated exchange would be the bottleneck.
  *
  * min/max are computed on the NATIVE column type (so ordering is the
  * type's, not lexicographic) and rendered to strings only at the end —
  * the report schema is fixed regardless of profiled types. Null
  * handling follows SQL: `n_nulls = n_rows − count(col)`, distinct
  * counts exclude NULL on both engines. */
object Profile {

  private def report(df: DataFrame, cols: Seq[String],
                     distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "Profile: no columns given")
    cols.foreach(c => require(df.columns.contains(c),
      s"Profile: no such column '$c'"))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      distinctAgg(c).as(s"__dist_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dist_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Exact profile (Expand-based multi-distinct; see object scaladoc). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    report(df, cols, c => countDistinct(col(c)))

  /** Single-pass HLL++ profile — the at-scale variant. `rsd` is the
    * relative standard deviation of each distinct estimate. */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.02): DataFrame =
    report(df, cols, c => approx_count_distinct(col(c), rsd))
}
