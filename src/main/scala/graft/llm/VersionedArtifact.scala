package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe publish for small model/sidecar artifacts (r11 verdict
  * "What's missing #3") — two disciplines, both derived from the
  * versioned label-store commit
  * ([[graft.streaming.StreamingIncremental]] `writeLabels`):
  *
  *  - MULTI-TABLE artifacts (a model = weights + `_meta`): each publish
  *    lands in a fresh `v_<seq>` dir whose explicit `_SUCCESS` marker
  *    is written LAST — the version counts only once every member
  *    table is fully committed, so a crash between (or inside) the
  *    member writes leaves the previous committed version readable.
  *    No pointer file: the marker IS the commit.
  *  - SINGLE-TABLE sidecars at a fixed path (`_centroids`,
  *    `_codebooks`): staged write + rename-install. The window between
  *    delete and rename leaves the sidecar ABSENT — a loud
  *    path-does-not-exist on read — never a torn parquet directory
  *    that silently reads back with missing rows.
  *
  * Single-writer assumption throughout, like every store here. */
private[graft] object VersionedArtifact {

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versions(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
      .flatMap(s => s.getPath.getName.stripPrefix("v_").toLongOption
        .map(_ -> s.getPath))

  private def committed(fs: FileSystem, v: Path): Boolean =
    fs.exists(new Path(v, "_SUCCESS"))

  /** The next (uncommitted) version dir to write member tables into.
    * Counts EVERY v_ dir — committed or wreckage — so a new publish
    * never collides with a torn one. */
  def nextVersionDir(spark: SparkSession, root: String): String = {
    val (fs, p) = fsOf(spark, root)
    val seq = versions(fs, p).map(_._1).maxOption.getOrElse(0L) + 1L
    new Path(p, f"v_$seq%06d").toString
  }

  /** Commit `vdir` (write its `_SUCCESS` marker) and only THEN prune
    * superseded versions plus any `legacyEntries` from the
    * pre-versioning flat layout. A crash mid-cleanup leaves
    * stale-but-ignored dirs the next publish removes. */
  def commitAndPrune(spark: SparkSession, root: String, vdir: String,
                     legacyEntries: Seq[String] = Seq.empty): Unit = {
    val (fs, p) = fsOf(spark, root)
    val v = new Path(vdir)
    fs.create(new Path(v, "_SUCCESS"), true).close()
    // listStatus paths are fully qualified (file:/…) while vdir need
    // not be — compare by version-dir NAME (unique within root)
    versions(fs, p).foreach { case (_, dir) =>
      if (dir.getName != v.getName) fs.delete(dir, true)
    }
    legacyEntries.foreach(e => fs.delete(new Path(p, e), true))
  }

  /** The highest COMMITTED version dir, if any. None = legacy flat
    * layout (or empty store) — the caller's fallback. Uncommitted
    * wreckage with no committed version and no fallback surfaces as
    * the caller's read failure on the legacy path (loud, not empty). */
  def currentDir(spark: SparkSession, root: String): Option[String] = {
    val (fs, p) = fsOf(spark, root)
    versions(fs, p).sortBy(-_._1)
      .collectFirst { case (_, dir) if committed(fs, dir) => dir.toString }
  }

  /** Staged install for a single-table sidecar at a fixed path: write
    * beside, delete live, rename into place. Any `__stage` leftover
    * from a crash is overwritten by the next attempt and ignored by
    * readers (they address exact paths).
    *
    * The whole contract rides on the install RENAME being atomic — on
    * an object store where rename is copy+delete, a crash mid-install
    * leaves exactly the torn half-readable sidecar this method exists
    * to prevent, so the same requireAtomicRename guard every other
    * rename-install path applies (IvfLayout.compact, SketchStore)
    * applies here (ADVICE r12). */
  def writeStaged(df: DataFrame, live: String): Unit = {
    val spark = df.sparkSession
    val (fs, p) = fsOf(spark, live)
    graft.warehouse.Warehouse.requireAtomicRename(
      Option(fs.getScheme).getOrElse(""),
      spark.conf.getOption("spark.graft.warehouse.allowNonAtomicRename")
        .exists(_.equalsIgnoreCase("true")))
    val tmp = new Path(live + "__stage")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    require(fs.rename(tmp, p),
      s"VersionedArtifact.writeStaged: install rename to $live failed")
  }
}
