package graft.operators

import org.apache.spark.sql.SparkSession

/** Retention for the maintained-store family: delete every
  * `part=<value>` leaf of a store table — the lifecycle half every
  * windowed store needs at 100 TB ("drop days older than N",
  * data-subject erasure). Works on both layouts:
  *
  *  - slotted additive stores (Hist/Quantile/Cms/TopK/Sample/Edge):
  *    `table/run=<id>/part=<v>/…` — the part leaf is removed from the
  *    folded `__base__` and `__adhoc__` slots; the manifest is untouched
  *    (dropping rows cannot resurrect a FOLDED batch). A target part
  *    living under a LIVE batch slot (`run=b<n>` / named) makes the call
  *    REFUSE: those slots are replay targets — an at-least-once replay
  *    statically overwrites its whole `run=<id>` subtree and would
  *    silently re-land the dropped rows (ADVICE r13). Compact first
  *    (folds live slots into `__base__`, manifest makes replays no-ops),
  *    then drop;
  *  - flat idempotent stores (Sketch `path/part=<v>`, Bloom): the part
  *    dir is removed from the root.
  *
  * Deletion is per-directory and therefore only PREFIX-atomic: a crash
  * midway leaves some of the named parts gone and the rest intact —
  * the correct failure mode for retention (never a torn part: part
  * dirs are removed whole) — and a re-run completes it (idempotent:
  * missing parts are skipped). Serving concurrently sees each part
  * either fully present or fully absent, the same isolation
  * PartitionFilter pruning already implies.
  *
  * Returns the number of part directories actually deleted. Refuses a
  * path that contains NEITHER layout marker (wrong path beats silent
  * no-op). */
object StoreRetention {

  def dropParts(spark: SparkSession, table: String,
                values: Seq[String]): Int = {
    require(values.nonEmpty, "StoreRetention.dropParts: no part values")
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root),
      s"StoreRetention.dropParts: no store at $table")
    val targets = values.map(v => s"part=$v").toSet
    val top = fs.listStatus(root).toSeq.filter(_.isDirectory)
    val runDirs = top.filter(_.getPath.getName.startsWith("run="))
    val flatParts = top.filter(_.getPath.getName.startsWith("part="))
    require(runDirs.nonEmpty || flatParts.nonEmpty,
      s"StoreRetention.dropParts: $table has neither run= slots nor " +
        "part= dirs — not a maintained-store table (wrong path?)")
    val candidates =
      if (runDirs.nonEmpty) {
        // a PARTIAL live slot (no _SUCCESS — crash mid-write) refuses
        // regardless of whether the target part dir exists in it YET:
        // its eventual content is unknown, and the replay statically
        // rewrites the whole slot — it could create the dropped part
        // right after this call deleted it from the base (round-14
        // review: the existence-keyed check below misses this)
        val partial = runDirs
          .map(r => (r.getPath.getName.stripPrefix("run="), r.getPath))
          .filter { case (id, _) => id != graft.llm.RunSlots.Base &&
            id != graft.llm.RunSlots.Adhoc }
          .filterNot { case (_, p) =>
            fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
          .map(_._1).sorted
        require(partial.isEmpty,
          s"StoreRetention.dropParts: slot(s) ${partial.mkString(", ")} at " +
            s"$table have no _SUCCESS marker — a crash mid-write; their " +
            "replay rewrites the whole slot and could re-land dropped " +
            "parts. Let the owning stream replay them (then compact), " +
            "or remove them, before dropping")
        val hits = runDirs.flatMap(r => fs.listStatus(r.getPath).toSeq
          .filter(s => s.isDirectory && targets(s.getPath.getName))
          .map(s => (r.getPath.getName.stripPrefix("run="), s)))
        // a target part under a LIVE batch slot is a replay hazard: the
        // at-least-once replay of that batch overwrites its whole
        // run=<id> subtree and re-lands the dropped rows — erasure
        // silently undone. Refuse; the remedy folds the slot first.
        val live = hits.map(_._1)
          .filter(id => id != graft.llm.RunSlots.Base &&
            id != graft.llm.RunSlots.Adhoc)
          .distinct.sorted
        require(live.isEmpty,
          s"StoreRetention.dropParts: target part(s) exist under live " +
            s"run slot(s) ${live.mkString(", ")} at $table — a replayed " +
            "batch would statically rewrite its whole slot and re-land " +
            "the dropped rows. Compact the store first (folds slots into " +
            "run=__base__; the fold manifest turns replays into no-ops), " +
            "then re-run the drop")
        hits.map(_._2)
      } else flatParts.filter(s => targets(s.getPath.getName))
    candidates.foreach(c => fs.delete(c.getPath, true))
    candidates.size
  }
}
