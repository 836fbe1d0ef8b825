package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Run-scoped append slots — [[ChunkStore]]'s `manifest/run=<id>`
  * idempotency discipline generalized to every materialized index
  * (r10 verdict "What's missing #1"): foreachBatch is at-least-once,
  * and a plain `mode("append")` lands a replayed batch's postings
  * TWICE. With run slots, each batch's rows live under their own
  * `table/run=<id>/…` subtree and a replay OVERWRITES exactly that
  * subtree, so replay converges to the single-delivery state.
  *
  * Layout: `table/run=<id>/<partCol>=<b>/part-*.parquet`. The `run`
  * level is an outer Hive partition column — bucket pruning on the
  * inner `partCol` still resolves at planning time (partition
  * pruning composes across levels), readers that select explicit
  * columns never see `run`, and base builds stamp `run=__base__` so
  * one store never mixes directory depths (Spark refuses conflicting
  * partition structures). Ad-hoc (non-replayable) appends accumulate
  * under `run=__adhoc__` in plain append mode — the pre-slot
  * behavior, scoped so the tree stays uniform.
  *
  * Crash contract: a slot overwrite that dies mid-write leaves a
  * partial `run=<id>` subtree; readers may briefly over-count that
  * run, and the replay (same id, same deterministic rows) rewrites
  * the slot whole. Compaction collapses all slots back into
  * `__base__` — replaying a PRE-compact run id after a compact
  * re-lands its rows (the ChunkStore caveat; compact is an offline
  * maintenance op, not a mid-stream one). */
private[graft] object RunSlots {
  val Base = "__base__"
  val Adhoc = "__adhoc__"

  /** Run ids become directory names: keep them path- and
    * partition-value-safe, and non-numeric-looking is guaranteed by
    * the caller prefix convention (`b<batchId>`) plus the reserved
    * names — mixed numeric/string values would flip the inferred
    * partition type between reads. */
  def validate(id: String): String = {
    require(id.nonEmpty && id.matches("[A-Za-z_][A-Za-z0-9._-]*"),
      s"RunSlots: run id '$id' must match [A-Za-z_][A-Za-z0-9._-]* " +
        "(prefix numeric batch ids, e.g. b42)")
    id
  }

  def slotDir(table: String, id: String): String =
    s"$table/run=${validate(id)}"

  private def fsOf(df: DataFrame, table: String) = {
    val p = new Path(table)
    (p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration), p)
  }

  /** Refuse to graft run slots onto a pre-slot flat store: mixed
    * directory depths make partition discovery throw on every
    * subsequent read. Legacy stores are upgraded by compact (which
    * restamps into `run=__base__`) or a rebuild. */
  private def requireSlotLayout(df: DataFrame, table: String,
                                partCol: String): Unit = {
    val (fs, root) = fsOf(df, table)
    if (fs.exists(root)) {
      val legacy = fs.listStatus(root).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      require(!legacy,
        s"RunSlots: $table has a pre-slot flat layout ($partCol= dirs at " +
          "the root); compact it (restamps into run=__base__) before " +
          "run-scoped appends")
    }
  }

  /** Write `df` into its run slot: with a run id, a STATIC overwrite
    * of `table/run=<id>` (the idempotent replay target — static so
    * the whole slot is replaced even under a dynamic-overwrite
    * session default); without one, a plain append under
    * `run=__adhoc__`. */
  def write(df: DataFrame, table: String, partCol: String,
            runId: Option[String]): Unit = {
    requireSlotLayout(df, table, partCol)
    runId match {
      case Some(id) =>
        df.write.mode("overwrite")
          .option("partitionOverwriteMode", "static")
          .partitionBy(partCol).parquet(slotDir(table, id))
      case None =>
        df.write.mode("append").partitionBy(partCol)
          .parquet(slotDir(table, Adhoc))
    }
  }

  /** [[write]] for unbucketed side tables (e.g. the lexical `_stats`
    * delta rows): same slot semantics, no inner partition level. */
  def writeFlat(df: DataFrame, table: String,
                runId: Option[String]): Unit =
    runId match {
      case Some(id) =>
        df.write.mode("overwrite")
          .option("partitionOverwriteMode", "static")
          .parquet(slotDir(table, id))
      case None =>
        df.write.mode("append").parquet(slotDir(table, Adhoc))
    }

  /** Full-rebuild reset: drop EVERY slot (a slot-scoped overwrite
    * only replaces `__base__`, and a rebuild must not leave stale
    * run slots from the previous index generation alive). */
  def reset(spark: SparkSession, table: String): Unit = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Per-table slot accounting from FS metadata only (no data read):
    * one row per `run=` slot with its file count and bytes — the
    * compaction trigger every slotted store needs (a long-running
    * stream lands one slot per batch; compact folds them back into
    * `__base__` once slot count or small-file count crosses the
    * operator's threshold). A pre-slot flat table reports a single
    * `(legacy)` row. */
  def stats(spark: SparkSession, table: String): Seq[SlotStat] = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    def filesUnder(dir: Path): (Long, Long) = {
      val it = fs.listFiles(dir, true)
      var n = 0L; var b = 0L
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")) { n += 1; b += f.getLen }
      }
      (n, b)
    }
    val slots = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("run="))
    if (slots.isEmpty) {
      val (n, b) = filesUnder(p)
      if (n == 0) Seq.empty else Seq(SlotStat("(legacy)", n, b))
    } else slots.map { s =>
      val (n, b) = filesUnder(s.getPath)
      SlotStat(s.getPath.getName.stripPrefix("run="), n, b)
    }.sortBy(_.run)
  }

  final case class SlotStat(run: String, files: Long, bytes: Long)

  /** Does `table` hold any `partCol=` partition directory — at the
    * root (legacy flat layout) or inside any `run=` slot? The
    * empty-seed guard readers use before `spark.read.parquet`. */
  def hasParts(spark: SparkSession, table: String,
               partCol: String): Boolean = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partDirIn(dir: Path): Boolean =
      fs.listStatus(dir).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
    fs.exists(p) && (partDirIn(p) ||
      fs.listStatus(p).exists(s => s.isDirectory &&
        s.getPath.getName.startsWith("run=") && partDirIn(s.getPath)))
  }
}
