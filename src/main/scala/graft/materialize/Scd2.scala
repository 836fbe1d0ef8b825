package graft.materialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt snapshots, Spark-first: SCD Type-2 change tracking — the
  * capability behind the reference project's `snapshots/` directory
  * (reference `dbt_project.yml:19` declares `snapshot-paths:
  * ["snapshots"]`; the semantics are dbt-core's public snapshot
  * contract, "check" strategy). A snapshot table holds every version a
  * row has ever had, bracketed by `valid_from`/`valid_to`, with the
  * current version carrying `valid_to = NULL`.
  *
  * One run folds a new source state into the previous snapshot state:
  *
  *  - a key present in both whose ANY check column differs (null-safe
  *    comparison — NULL -> value and value -> NULL are changes) closes
  *    the current row at `asOf` and opens a new current version;
  *  - a key present only in the source opens its first version;
  *  - a key missing from the source is closed at `asOf` when
  *    `hardDeletes` (dbt `invalidate_hard_deletes`), else left current;
  *  - historical rows (`valid_to` already set) pass through UNTOUCHED.
  *
  * Scale shape: the change detection is ONE full-outer equi-join on the
  * key between the CURRENT slice and the source — the two "live" sizes.
  * History never joins anything: at 100 TB the snapshot table is
  * dominated by closed versions, and they stream through (or better,
  * are never read at all — partition the state table on an
  * `is_current` derivative and this run's input prunes to the current
  * partition, the [[MergeIntoPartitioned]] discipline). The join keys
  * are the table's unique key, so the shuffle is the minimum any exact
  * SCD2 fold needs; AQE broadcasts a small source (the trickle-update
  * case). Change comparison is a codegen'd null-safe predicate, not a
  * row hash — no spurious versions from hash collisions, no UDF.
  *
  * Determinism: `asOf` is caller-supplied (the dbt run timestamp), so
  * the fold is a pure function of (prev, source, asOf) — re-runs are
  * byte-identical, and the cross-engine gate pins the whole state
  * machine against an independent SQL derivation. */
object Scd2 {

  /** First snapshot of a fresh source: every row current from `asOf`. */
  def init(source: DataFrame, asOf: Column): DataFrame =
    source
      .withColumn("valid_from", asOf.cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))

  /** Fold one new source state into the previous snapshot state.
    *
    * `prev` must carry `valid_from`/`valid_to` plus exactly the source
    * columns; `source` must carry `keyCols ++ checkCols` (extra payload
    * columns ride along from the source side of each new version). */
  def snapshot(
      prev: DataFrame, source: DataFrame,
      keyCols: Seq[String], checkCols: Seq[String],
      asOf: Column, hardDeletes: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "Scd2.snapshot: keyCols must be non-empty")
    require(checkCols.nonEmpty, "Scd2.snapshot: checkCols must be non-empty")
    val payload = prev.columns.filterNot(c =>
      keyCols.contains(c) || c == "valid_from" || c == "valid_to").toSeq
    require(payload.toSet == source.columns.filterNot(keyCols.contains).toSet,
      s"Scd2.snapshot: prev payload ${payload.mkString(",")} must match " +
        s"source payload ${source.columns.filterNot(keyCols.contains).mkString(",")}")

    val history = prev.filter(col("valid_to").isNotNull)
    val current = prev.filter(col("valid_to").isNull)

    val s = source.select(
      keyCols.map(col) ++ payload.map(c => col(c).as(s"__s_$c")): _*)
    // presence flags: any non-key column is NULL on an absent side, so
    // presence must come from the join itself — tag both sides first
    val cur = current.withColumn("__in_cur", lit(true))
    val src = s.withColumn("__in_src", lit(true))
    val joined = cur.join(src, keyCols, "full_outer")
      .withColumn("__in_cur", coalesce(col("__in_cur"), lit(false)))
      .withColumn("__in_src", coalesce(col("__in_src"), lit(false)))
    val changed = checkCols
      .map(c => !(col(c) <=> col(s"__s_$c")))
      .reduce(_ || _)

    val ts = asOf.cast("timestamp")
    val keep = keyCols.map(col) ++ payload.map(col) :+
      col("valid_from") :+ col("valid_to")
    val keepSrc = keyCols.map(col) ++ payload.map(c => col(s"__s_$c").as(c))

    // unchanged current rows survive as-is; changed / hard-deleted ones
    // close at asOf
    val carried = joined.filter(col("__in_cur"))
      .withColumn("valid_to",
        when(col("__in_src") && changed, ts)
          .when(!col("__in_src") && lit(hardDeletes), ts)
          .otherwise(col("valid_to")))
      .select(keep: _*)
    // changed and brand-new keys open a new current version from the
    // SOURCE side's values
    val opened = joined
      .filter(col("__in_src") && (!col("__in_cur") || changed))
      .select(keepSrc: _*)
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .select(keep: _*)

    history.select(keep: _*)
      .unionByName(carried)
      .unionByName(opened)
  }
}
