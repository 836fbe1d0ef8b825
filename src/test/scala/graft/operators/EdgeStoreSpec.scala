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
}
