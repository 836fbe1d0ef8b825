package graft.materialize

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TableId
import graft.warehouse.Warehouse

/** Config for incremental_partition_merge — the reference's config surface
  * (incremental_partition_merge.sql:22-63, macro_docs.yml:50-81). */
final case class MergeConfig(
    partitionField: String,
    partitionGranularity: String = "day",
    uniqueKey: Seq[String],
    eventTime: Option[String] = None,
    mergeUpdateColumns: Option[Seq[String]] = None,
    mergeExcludeColumns: Option[Seq[String]] = None,
    // cluster_by analog (incremental_partition_merge.sql:12,80,231): sort
    // within written partitions to tighten parquet row-group stats
    clusterBy: Seq[String] = Nil,
    // post-build hooks (incremental_partition_merge.sql:312-314):
    // apply_grants + persist_docs after every build
    grants: Map[String, Seq[String]] = Map.empty,
    docs: Option[graft.warehouse.TableDocs] = None,
    // standing-takedown guard: when set, every batch is anti-joined
    // against the Denylist at the target's guardRoot on this column
    // BEFORE resolving — an upsert of a since-forgotten key must not
    // re-land it (same contract as IncrementalLogConfig.denyIdColumn).
    denyIdColumn: Option[String] = None) {
  require(partitionGranularity.toLowerCase == "day",
    s"incremental_partition_merge: only DAY partition granularity is supported (got '$partitionGranularity')")
  require(uniqueKey.nonEmpty,
    "incremental_partition_merge: config.unique_key is required and cannot be empty")
}

/** A2+A3 — partition-pruned upsert into a day-partitioned table.
  * Reference: macros/materialization/incremental_partition_merge.sql:1-322.
  *
  * Spark has no MERGE INTO for plain parquet, so this is the one genuinely
  * novel operator (SURVEY §7.5): a join-based resolve + dynamic partition
  * rewrite with the reference's exact BigQuery-MERGE semantics:
  *
  *  - ON = `DATE(T.pf) IN (touched) AND T.k=S.k …` — the partition
  *    restriction is part of the MATCH condition, so a target row with the
  *    same key in an UNtouched partition does NOT match and the batch row is
  *    inserted (duplicate key across partitions — faithful, tested).
  *  - WHEN MATCHED [AND S.et > T.et] THEN UPDATE SET <common cols> = S.…;
  *    a matched-but-stale row keeps ALL target values.
  *  - WHEN NOT MATCHED THEN INSERT (common cols) — target columns outside
  *    the common set become NULL on insert.
  *  - common cols = (batch ∩ target, batch order) ∩ whitelist − blacklist;
  *    empty ⇒ error (`:182-187`).
  *  - NULL keys never match (BigQuery `=`), so NULL-keyed batch rows insert.
  *  - empty batch: first run ⇒ create empty table; else no-op 0-row insert.
  *
  * Scale design (the reason this works at 100 TB):
  *  - The target side reads ONLY the touched partitions — a partition-pruned
  *    scan (PartitionFilters on `part_date`), the analog of the reference's
  *    literal IN-list that satisfies require_partition_filter.
  *  - The join shuffles `touched-partitions + batch`, never the full table;
  *    with AQE on, a small batch side is broadcast at runtime.
  *  - The write rewrites ONLY the touched partition directories, via the
  *    warehouse's crash-safe stage + journal + rename-swap protocol
  *    (`Warehouse.overwriteTouchedPartitions`) — the analog of BigQuery's
  *    ATOMIC MERGE rewriting only matched partitions: a crash mid-commit
  *    leaves the target readable, and the next run rolls back and retries.
  *  - If an UPDATE moves a row's partition field across days (allowed in
  *    BigQuery MERGE), the destination partitions are read and preserved
  *    too, so the dynamic overwrite cannot drop their unmatched rows.
  */
final class MergeIntoPartitioned(wh: Warehouse, spark: SparkSession) {

  private val Part = wh.PartCol

  /** Stage a batch with the target's physical layout: derived day-partition
    * column, repartitioned by it (incremental_partition_merge.sql:74-83 —
    * "same partitioning … as the target to optimize the MERGE"). */
  private def staged(batch: DataFrame, pf: String): DataFrame =
    batch.withColumn(Part, to_date(col(pf)))

  def run(
      batch: DataFrame,
      target: TableId,
      cfg: MergeConfig,
      fullRefresh: Boolean = false): Unit =
    // one writer per table, ENFORCED: a racing materialization fails fast
    // instead of interleaving stage/swap state with this one
    wh.withWriterLease(target) { runLocked(batch, target, cfg, fullRefresh) }

  private def runLocked(
      batch: DataFrame,
      target: TableId,
      cfg: MergeConfig,
      fullRefresh: Boolean): Unit = {

    // Heal any interrupted earlier swap BEFORE any listing of the target:
    // Spark lists parquet files eagerly at read time, so planning against
    // a half-swapped directory would bake the crashed state into this
    // merge's output (and rename-missing dirs fail the write midway).
    wh.recoverPendingSwap(target)

    // standing-takedown guard: denied keys leave the batch before the
    // resolve, so neither the insert nor the update route re-lands
    // them. Explicit config wins; otherwise an ARMED guard (the
    // takedown recorded its own key column at the guard root) is
    // honored — this is what keeps the config-less SQL MERGE surface
    // inside the takedown story.
    val guarded = {
      // both the configured key and an armed guard's key, distinct —
      // one anti-join when they agree; specs may be composite ("c1+c2")
      val keys = (cfg.denyIdColumn.toSeq ++ wh.guardColumn(target).toSeq).distinct
      keys.foldLeft(batch)((d, k) =>
        graft.llm.Denylist.excludeKey(d, k, spark, wh.guardRoot(target)))
    }
    val b = staged(guarded, cfg.partitionField).cache()
    // post-build hooks (incremental_partition_merge.sql:312-314), plus the
    // table-level partition-field declaration the SQL MERGE surface reads
    def applyHooks(): Unit = {
      if (cfg.grants.nonEmpty) wh.applyGrants(target, cfg.grants)
      cfg.docs.foreach(d => wh.persistDocs(target, d))
      wh.writePartitionMeta(target, cfg.partitionField)
    }
    try {
      // A3 — touched-partition list; the ONLY collect, bounded by #days
      val touched: Seq[java.sql.Date] =
        b.select(col(Part)).distinct().collect().map(_.getDate(0)).toSeq.sorted

      val exists = wh.exists(target)

      if (touched.isEmpty) {
        // empty batch (incremental_partition_merge.sql:269-298)
        if (!exists) wh.createEmpty(target, b.schema) // empty table, batch schema
        // else: 0-row insert == no-op
        applyHooks()
        return
      }

      if (!exists || fullRefresh) {
        // first run / full refresh: CTAS from the staged batch (:218-235)
        wh.overwritePartitioned(target, b)
        applyHooks()
        return
      }

      // --- incremental MERGE path (:239-265) ---
      val tgtAll = wh.read(target)
      val common = commonColumns(b, tgtAll, cfg)

      // partition-pruned target scan: only touched day-dirs are listed/read
      val t = wh.readPartitions(target, touched)

      val resolved = resolve(t, b, cfg, common, tgtAll.columns.filterNot(_ == Part).toSeq)

      // When pf ∈ common, every output row's partition is provably in
      // `touched` (an insert/update takes S.pf, staged ∈ touched; a kept
      // row takes T.pf, read from a touched partition), so the resolve
      // join executes exactly ONCE — in the write below. The one escape:
      // pf excluded from the common set leaves T.pf/NULL values (inserts
      // get NULL pf), so output rows can land outside `touched`; that
      // destination check needs a second pass over `resolved`, so persist
      // it rather than re-executing the full-outer join, and preserve ALL
      // existing rows of the extra destination partitions (they never
      // matched the ON clause, which requires DATE(T.pf) ∈ touched).
      val pfMerged = common.contains(cfg.partitionField)
      val resolvedP = if (pfMerged) resolved else resolved.persist()
      try {
        val out =
          if (pfMerged) resolvedP
          else {
            val outParts = resolvedP.select(col(Part)).distinct().collect()
              .flatMap(r => Option(r.getDate(0))).toSeq
            val extra = outParts.filterNot(touched.contains)
            if (extra.isEmpty) resolvedP
            else resolvedP.unionByName(wh.readPartitions(target, extra))
          }
        val clustered =
          if (cfg.clusterBy.nonEmpty) out.sortWithinPartitions(cfg.clusterBy.map(col): _*)
          else out
        wh.overwriteTouchedPartitions(target, clustered)
        applyHooks()
      } finally if (!pfMerged) { resolvedP.unpersist(); () }
    } finally b.unpersist()
  }

  /** (batch ∩ target, in batch column order) ∩ whitelist − blacklist
    * (incremental_partition_merge.sql:144-187). */
  private def commonColumns(b: DataFrame, tgt: DataFrame, cfg: MergeConfig): Seq[String] = {
    val tgtCols = tgt.columns.toSet - Part
    var common = b.columns.toSeq.filterNot(_ == Part).filter(tgtCols.contains)
    cfg.mergeUpdateColumns.foreach(w => common = common.filter(w.contains))
    cfg.mergeExcludeColumns.foreach(x => common = common.filterNot(x.contains))
    if (common.isEmpty)
      throw new IllegalStateException(
        "incremental_partition_merge: no overlapping columns between batch and " +
          "target after applying merge_update_columns / merge_exclude_columns.")
    common
  }

  /** The MERGE resolve as one full-outer join + per-column winner selection.
    * Emits the target schema (+ recomputed part_date). */
  private def resolve(
      t: DataFrame, b: DataFrame, cfg: MergeConfig,
      common: Seq[String], tgtCols: Seq[String]): DataFrame = {
    val T = t.withColumn("__t", lit(1)).alias("T")
    val S = b.withColumn("__s", lit(1)).alias("S")
    // BigQuery `T.k = S.k`: NULL keys never match
    val on: Column = cfg.uniqueKey.map(k => col(s"T.$k") === col(s"S.$k")).reduce(_ && _)
    val j = T.join(S, on, "full_outer")

    val tPresent = col("T.__t").isNotNull
    val sPresent = col("S.__s").isNotNull
    // WHEN MATCHED [AND S.et > T.et]: a NULL comparison means no update
    val updatePred: Column = cfg.eventTime match {
      case Some(et) => (col(s"S.$et") > col(s"T.$et")).isNotNull &&
        (col(s"S.$et") > col(s"T.$et"))
      case None => lit(true)
    }
    val commonSet = common.toSet
    // batch wins on insert (no target row) or on a passing matched-update
    val sWins: Column = !tPresent || (sPresent && updatePred)

    val outCols: Seq[Column] = tgtCols.map { c =>
      if (commonSet.contains(c)) when(sWins, col(s"S.$c")).otherwise(col(s"T.$c")).as(c)
      else col(s"T.$c").as(c) // target-only column: NULL on insert rows
    }
    j.select(outCols: _*)
      .withColumn(Part, to_date(col(cfg.partitionField)))
  }

}
