package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone mechanics for the materialized stores (MinHash /
  * lexical / IVF / IVF+PQ indexes): deletion as an append-only marker
  * table, honored at serve time immediately and physically purged at
  * compact — the MERGE-style "update without rewrite" discipline the
  * reference applies to tables
  * (`incremental_partition_merge.sql:114-130`), applied to index
  * layouts. A real training-data pipeline deletes (takedowns,
  * opt-outs, license changes); rebuilding every index per takedown is
  * the alternative this buys out of.
  *
  * Layout: `<store>/_tombstones/` parquet with a single `id` column —
  * the underscore prefix keeps it invisible to the store's own
  * `spark.read.parquet(store)` data discovery, the `_centroids` /
  * `_stats` sidecar convention. All filesystem probes go through the
  * store path's own Hadoop FileSystem (NOT java.io) so the markers are
  * honored on HDFS/object stores too, not just the local disk.
  *
  * Serve-side exclusion is a LEFT ANTI join, broadcast-hinted only
  * while the marker dir's parquet bytes stay under the denylist
  * ceiling (`spark.graft.denylist.broadcastMaxBytes`, default 64 MB —
  * [[Denylist.sizedByBytes]]); past it the hint is dropped and the
  * join degrades to a shuffle. Takedown sets are normally tiny, but
  * markers ACCUMULATE between compacts — a decade of deletions (or one
  * court-ordered bulk purge) must cost a shuffle, never a driver OOM.
  * The dir listing is one metadata call, already paid by the
  * existence probe.
  *
  * RE-INGEST TRAP (deliberate semantics, documented at every
  * deleteDocs): a marker hides its id WHEREVER it appears — rows
  * appended AFTER the deletion are hidden too, and the next compact
  * purges them with the old ones. To re-add a deleted id, compact
  * first (clears the marker) or use a fresh id. ChunkStore's
  * seq-ranked tombstones support in-place revival instead; the index
  * stores trade that for marker simplicity (indexes rarely re-admit
  * the same id inside one maintenance cycle). */
private[llm] object Tombstones {

  private def dir(path: String) = s"$path/_tombstones"

  /** Record ids as deleted (append-only; duplicates are harmless —
    * exclusion is a semi-join and compact purges the marker table). */
  def add(ids: DataFrame, idCol: String, path: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(dir(path))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(dir(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** The marker table, if any markers exist. */
  def readOpt(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(dir(path))) else None

  /** A projection of the marker table sized for joining: broadcast
    * under the denylist byte ceiling, bare (Spark shuffles) past it. */
  def sizedSide(spark: SparkSession, path: String,
                proj: DataFrame): DataFrame =
    Denylist.sizedByBytes(spark, proj, Denylist.dirBytes(spark, dir(path)))

  /** `df` minus rows whose `idColName` is tombstoned — identity when no
    * tombstones exist, so untouched stores pay nothing. */
  def exclude(df: DataFrame, idColName: String,
              spark: SparkSession, path: String): DataFrame =
    readOpt(spark, path) match {
      case None => df
      case Some(t) =>
        df.join(sizedSide(spark, path, t.select(col("id").as(idColName))),
          Seq(idColName), "left_anti")
    }

  /** Drop the marker table (call after a purge has applied it). */
  def clear(spark: SparkSession, path: String): Unit = {
    val p = new Path(dir(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
