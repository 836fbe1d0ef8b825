package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dirty-data routing: evaluate named validity rules per row and split
  * the stream into clean rows and a quarantine with per-row violation
  * labels — the ingest-edge pattern that keeps one bad record from
  * failing a 100 TB load (contrast raise_error guards, which are for
  * conditions that mean the JOB is wrong, not the row).
  *
  * Pure projection: every rule is one boolean column, the violation list
  * is a filtered literal array — no shuffle, no UDF, scale-free.
  */
object Quarantine {

  /** Adds `violations: array<string>` — the names of all failed rules
    * (empty for clean rows). A rule fails when its predicate is FALSE or
    * NULL (null-safe: unknown is not clean). */
  def tag(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "tag: at least one rule required")
    val arr = array(rules.map { case (name, pred) =>
      when(pred <=> lit(true), lit(null).cast("string")).otherwise(lit(name))
    }: _*)
    df.withColumn("violations", filter(arr, v => v.isNotNull))
  }

  /** (clean, quarantined) split; the quarantine side keeps `violations`.
    *
    * Both sides filter the SAME tagged lineage, so consuming both scans
    * the source and evaluates every rule twice — at ingest scale,
    * persist `tag()`'s output first, or write it once partitioned by an
    * is-clean flag and read the two sides back (which also protects a
    * nondeterministic upstream from landing a row on both sides). */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val tagged = tag(df, rules)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }
}
