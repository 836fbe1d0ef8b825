package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ChunkStore.diff: corpus-version diff straight off the manifests —
  * statuses from ordered-chunk-list identity (list equality IS text
  * equality), churn from the per-doc content multiset delta. */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_diff_spec_").toString

  // long repetitive bodies so CDC actually cuts multiple chunks
  private def body(seed: String) =
    (1 to 60).map(i => s"$seed-token-$i").mkString(" ")

  test("statuses: unchanged / changed / removed / added") {
    val v1 = Seq(
      (1L, body("alpha")), (2L, body("beta")),
      (3L, body("gamma")), (4L, body("delta")))
      .toDF("doc_id", "text")
    val root = tmpDir()
    ChunkStore.write(v1, "text", "doc_id", root, nBuckets = 8) // seq 0 baseline
    // doc 2 edited (suffix patch), doc 5 new; doc 4 deleted
    val batch = Seq(
      (2L, body("beta") + " PATCHED"), (5L, body("epsilon")))
      .toDF("doc_id", "text")
    ChunkStore.append(batch, "text", "doc_id", root, nBuckets = 8) // seq 1
    ChunkStore.deleteDocs(Seq(4L).toDF("doc_id"), "doc_id", root)  // seq 2
    val d = ChunkStore.diff(spark, root, seqA = 0L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(d(1L)._1 === "unchanged" && d(1L)._2 === 0L && d(1L)._3 === 0L)
    assert(d(3L)._1 === "unchanged")
    assert(d(2L)._1 === "changed")
    assert(d(4L)._1 === "removed")
    assert(d(5L)._1 === "added")
    // a suffix edit shares every chunk outside the edit neighborhood:
    // churn is small relative to the doc's chunk count
    val chunks2 = Curation.cdcChunks(
      Seq((2L, body("beta"))).toDF("doc_id", "text"), "text", "doc_id").count()
    assert(d(2L)._2 >= 1L && d(2L)._2 < chunks2)
    // removed doc: every chunk removed, none added
    assert(d(4L)._2 === 0L && d(4L)._3 > 0L)
    // added doc: every chunk added
    assert(d(5L)._2 > 0L && d(5L)._3 === 0L)
  }

  test("reversed sequence bounds refuse loudly") {
    val root = tmpDir()
    ChunkStore.write(Seq((1L, body("a"))).toDF("doc_id", "text"),
      "text", "doc_id", root, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      ChunkStore.diff(spark, root, seqA = 5L, seqB = 2L)
    }
    assert(e.getMessage.contains("must not exceed"))
  }

  test("diff against live of an untouched store is all-unchanged") {
    val v1 = Seq((1L, body("a")), (2L, body("b"))).toDF("doc_id", "text")
    val root = tmpDir()
    ChunkStore.write(v1, "text", "doc_id", root, nBuckets = 8)
    val d = ChunkStore.diff(spark, root, seqA = 0L)
    assert(d.filter(col("status") =!= "unchanged").count() === 0L)
    assert(d.agg(sum("chunks_added") + sum("chunks_removed"))
      .first().getLong(0) === 0L)
  }

  test("point-in-time A-side honors only tombstones issued by seqA") {
    val v1 = Seq((1L, body("x")), (2L, body("y"))).toDF("doc_id", "text")
    val root = tmpDir()
    ChunkStore.write(v1, "text", "doc_id", root, nBuckets = 8) // seq 0
    ChunkStore.deleteDocs(Seq(1L).toDF("doc_id"), "doc_id", root) // seq 1
    // at seq 0 doc 1 existed; live it is deleted -> removed
    val d01 = ChunkStore.diff(spark, root, seqA = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d01 === Map(1L -> "removed", 2L -> "unchanged"))
    // at seq 1 vs live: doc 1 already gone on both sides
    val d11 = ChunkStore.diff(spark, root, seqA = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d11 === Map(2L -> "unchanged"))
  }
}
