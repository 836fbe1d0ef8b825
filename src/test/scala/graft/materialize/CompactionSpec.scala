package graft.materialize

import java.nio.file.Files
import graft.SparkSpec
import graft.core.TableId
import graft.warehouse.Warehouse
import org.apache.spark.sql.functions._

/** Warehouse.compactPartitions: small-file maintenance through the
  * crash-safe swap — data identical, healthy partitions untouched. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(Files.createTempDirectory("graft_cmp_wh_").toString, spark)

  private val tid = TableId("proj", "cmp", "t")

  private def filesOf(wh: Warehouse, part: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"${wh.pathOf(tid)}/part_date=$part")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => (s.getPath.getName, s.getLen)).sortBy(_._1)
  }

  private def mkRows(part: String, ids: Seq[Long]) =
    ids.map(i => (i, s"v$i", java.sql.Date.valueOf(part)))
      .toDF("id", "v", "part_date")

  test("fragmented partition collapses to one file; data identical; healthy partition untouched") {
    val wh = freshWh()
    // 8 tiny appends fragment partition A; B gets one clean write
    (1 to 8).foreach(k =>
      wh.appendPartitioned(tid, mkRows("2024-01-01", Seq(k.toLong)).coalesce(1)))
    wh.appendPartitioned(tid, mkRows("2024-01-02", Seq(100L, 101L)).coalesce(1))
    val before = wh.read(tid).as[(Long, String, java.sql.Date)]
      .collect().sortBy(_._1).toSeq
    val bFilesBefore = filesOf(wh, "2024-01-02")
    assert(filesOf(wh, "2024-01-01").size === 8)

    val rewritten = wh.compactPartitions(tid)
    assert(rewritten === Seq("2024-01-01"))
    assert(filesOf(wh, "2024-01-01").size === 1)
    // healthy partition byte-identical (same files, same sizes)
    assert(filesOf(wh, "2024-01-02") === bFilesBefore)
    val after = wh.read(tid).as[(Long, String, java.sql.Date)]
      .collect().sortBy(_._1).toSeq
    assert(after === before)
  }

  test("a second compaction is a no-op") {
    val wh = freshWh()
    (1 to 5).foreach(k =>
      wh.appendPartitioned(tid, mkRows("2024-01-01", Seq(k.toLong)).coalesce(1)))
    assert(wh.compactPartitions(tid) === Seq("2024-01-01"))
    assert(wh.compactPartitions(tid) === Seq.empty)
  }

  test("tiny targetBytes splits a partition into multiple right-sized files") {
    val wh = freshWh()
    (1 to 6).foreach(k =>
      wh.appendPartitioned(tid,
        mkRows("2024-01-01", (k * 100L) to (k * 100L + 50L)).coalesce(1)))
    val bytes = filesOf(wh, "2024-01-01").map(_._2).sum
    // target a third of the data -> ceil gives >= 3 desired files
    val rewritten = wh.compactPartitions(tid, targetBytes = bytes / 3)
    assert(rewritten === Seq("2024-01-01"))
    val n = filesOf(wh, "2024-01-01").size
    assert(n >= 2 && n < 6, s"expected right-sizing, got $n files")
  }

  test("missing table returns empty instead of failing") {
    val wh = freshWh()
    assert(wh.compactPartitions(TableId("proj", "nope", "t")) === Seq.empty)
  }
}
