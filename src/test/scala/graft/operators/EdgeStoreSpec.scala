package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** EdgeStore: slot-summed reads equal one-pass extraction, and a
  * replayed batch cannot double edge weights (a silent double-land
  * here would BIAS every downstream PageRank — worse than a candidate
  * index duplicate, which only over-generates). */
class EdgeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*) =
    rows.toDF("src", "dst", "w")

  private def readMap(path: String) =
    EdgeStore.read(spark, path)
      .as[(Long, Long, Long)].collect()
      .map { case (s, d, w) => (s, d) -> w }.toMap

  test("append sums parallel edges across slots; replay lands once") {
    val path = Files.createTempDirectory("graft_es_").toString
    EdgeStore.write(edges((1L, 2L, 5L)),
      "src", "dst", Some("w"), path, nBuckets = 8)
    EdgeStore.appendBatch(edges((1L, 2L, 3L), (2L, 3L, 1L)),
      "src", "dst", Some("w"), path, nBuckets = 8, batchId = 0L)
    // the at-least-once replay: identical batch, identical slot
    EdgeStore.appendBatch(edges((1L, 2L, 3L), (2L, 3L, 1L)),
      "src", "dst", Some("w"), path, nBuckets = 8, batchId = 0L)
    assert(readMap(path) === Map((1L, 2L) -> 8L, (2L, 3L) -> 1L),
      "replayed batch must not double weights")
    // an ad-hoc append (no slot) intentionally accumulates
    EdgeStore.append(edges((1L, 2L, 1L)), "src", "dst", Some("w"), path,
      nBuckets = 8)
    assert(readMap(path) === Map((1L, 2L) -> 9L, (2L, 3L) -> 1L))
  }

  test("compact folds slots; read and a warm rank are unchanged") {
    val path = Files.createTempDirectory("graft_es_cmp_").toString
    EdgeStore.write(edges((1L, 2L, 1L), (2L, 1L, 1L)),
      "src", "dst", Some("w"), path, nBuckets = 8)
    EdgeStore.appendBatch(edges((3L, 1L, 2L)), "src", "dst", Some("w"), path,
      nBuckets = 8, batchId = 0L)
    val before = readMap(path)
    def rank() = PageRank.rank(EdgeStore.read(spark, path),
        "src", "dst", Some("w"), iters = 3)
      .as[(Long, Long)].collect().toMap
    val rBefore = rank()
    EdgeStore.compact(spark, path)
    assert(readMap(path) === before)
    assert(rank() === rBefore)
  }

  test("dropNodes erases every mention (src AND dst), leaves clean buckets untouched") {
    val path = Files.createTempDirectory("graft_es_drop_").toString
    // buckets are by SRC only: (1,2) lives in eb=1, (5,2) in eb=5 —
    // node 2's in-edges sit in FOREIGN buckets the census must find
    EdgeStore.write(edges((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 7L),
        (10L, 11L, 2L)),
      "src", "dst", Some("w"), path, nBuckets = 8)
    EdgeStore.appendBatch(edges((1L, 2L, 3L), (5L, 2L, 4L)),
      "src", "dst", Some("w"), path, nBuckets = 8, batchId = 0L)
    EdgeStore.compact(spark, path)
    // snapshot a clean bucket: (3,4) is alone in eb=3, untouched by the drop
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cleanDir = new org.apache.hadoop.fs.Path(
      s"$path/edges/run=__base__/eb=3")
    val cleanBefore = fs.listStatus(cleanDir)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSeq
    val (buckets, removed) = EdgeStore.dropNodes(spark, path,
      Seq(2L).toDF("n"), "n")
    assert(removed === 3L, "(1,2), (2,3), (5,2) all mention node 2")
    assert(buckets > 0)
    assert(readMap(path) === Map((3L, 4L) -> 7L, (10L, 11L) -> 2L))
    assert(fs.listStatus(cleanDir)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSeq
      === cleanBefore, "clean buckets must not be rewritten")
    // erasure durable under at-least-once: the folded batch's replay
    // must stay a write-level no-op — not re-land (1,2)/(5,2)
    EdgeStore.appendBatch(edges((1L, 2L, 3L), (5L, 2L, 4L)),
      "src", "dst", Some("w"), path, nBuckets = 8, batchId = 0L)
    assert(readMap(path) === Map((3L, 4L) -> 7L, (10L, 11L) -> 2L),
      "replay of a folded batch must not resurrect dropped edges")
    // idempotent: nothing left to remove
    assert(EdgeStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n")
      === ((0, 0L)))
  }

  test("dropNodes refuses live slots, full wipes, and crash leftovers with phase-accurate remedies") {
    val path = Files.createTempDirectory("graft_es_dref_").toString
    EdgeStore.write(edges((1L, 2L, 1L), (3L, 4L, 1L)),
      "src", "dst", Some("w"), path, nBuckets = 4)
    EdgeStore.appendBatch(edges((5L, 6L, 1L)), "src", "dst", Some("w"),
      path, nBuckets = 4, batchId = 0L)
    val e = intercept[IllegalArgumentException] {
      EdgeStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n")
    }
    assert(e.getMessage.contains("Compact first"), e.getMessage)
    EdgeStore.compact(spark, path)
    // full wipe refused: an empty installed base breaks later reads
    val e2 = intercept[IllegalArgumentException] {
      EdgeStore.dropNodes(spark, path,
        Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("n"), "n")
    }
    assert(e2.getMessage.contains("no edge survives"), e2.getMessage)
    // crash leftovers: staged children present => restore remedy
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/edges/_drop_tmp/eb=0"))
    val e3 = intercept[IllegalArgumentException] {
      EdgeStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n")
    }
    assert(e3.getMessage.contains("did not finish"), e3.getMessage)
    // childless tmp + bare backup => cleanup-phase remedy (remove only)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/edges/_drop_tmp/eb=0"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/edges/_drop_old_eb=1"))
    val e4 = intercept[IllegalArgumentException] {
      EdgeStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n")
    }
    assert(e4.getMessage.contains("do NOT restore"), e4.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/edges/_drop_tmp"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/edges/_drop_old_eb=1"), true)
    // remedy re-run completes
    val (_, removed) = EdgeStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n")
    assert(removed === 1L)
    assert(readMap(path) === Map((3L, 4L) -> 1L, (5L, 6L) -> 1L))
  }
}
