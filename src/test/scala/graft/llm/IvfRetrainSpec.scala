package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IvfIndex.retrain: quantizer drift repaired from the index's own
  * stored vectors, crash-ordered swap, tombstone purge. */
class IvfRetrainSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated, internally SPREAD clusters in 4-d: A around +1,
  // B around -1 (with per-id variation so a retrained quantizer can
  // split each side into sub-cells)
  private def cluster(ids: Range, sign: Float) =
    ids.map { i =>
      (i.toLong, Array(sign * 1f + i % 4 * 0.1f, sign * 1f - i % 3 * 0.1f,
        sign * 1f + i % 5 * 0.1f, sign * 1f))
    }.toDF("vec_id", "embedding")

  private def maxCellRows(idx: String): Long =
    spark.read.parquet(idx).groupBy("cid").count()
      .agg(max("count")).first().getLong(0)

  private def exhaustiveEqualsBrute(idx: String,
      corpus: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, nCells: Int): Unit = {
    val served = IvfIndex.topK(spark, idx, queries, "embedding", "vec_id",
        k = 5, nProbe = nCells)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(served === brute, "exhaustive probe must equal brute force")
  }

  test("retrain rebalances a drift-bloated cell and keeps serving exact") {
    val a = cluster(0 until 64, 1f)
    val b = cluster(100 until 164, -1f) // appears AFTER training — drift
    val all = a.unionByName(b)
    val idx = Files.createTempDirectory("graft_ivf_rt_").toString
    IvfIndex.write(a, "embedding", "vec_id", idx, nCells = 8)
    IvfIndex.appendBatch(b, "embedding", "vec_id", idx, batchId = 0L)
    // frozen A-quantizer: every B vector packs into its nearest A cell —
    // one cell holds at least the whole B side (the drift pathology:
    // probing it scans half the corpus)
    val before = maxCellRows(idx)
    assert(before >= 64, s"drifted appends should bloat one cell, max=$before")
    val queriesB = cluster(100 until 110, -1f)
    exhaustiveEqualsBrute(idx, all, queriesB, nCells = 8)
    IvfIndex.retrain(spark, idx, nCells = 8)
    assert(spark.read.parquet(idx).count() === 128, "retrain must keep every vector")
    val after = maxCellRows(idx)
    assert(after < before,
      s"retrained quantizer must shrink the bloated cell (before=$before after=$after)")
    exhaustiveEqualsBrute(idx, all, queriesB, nCells = 8)
  }

  test("retrain purges tombstoned vectors physically") {
    val a = cluster(0 until 32, 1f)
    val idx = Files.createTempDirectory("graft_ivf_rt_del_").toString
    IvfIndex.write(a, "embedding", "vec_id", idx, nCells = 4)
    IvfIndex.deleteDocs(Seq(1L, 2L).toDF("vec_id"), "vec_id", idx)
    IvfIndex.retrain(spark, idx, nCells = 4)
    val ids = spark.read.parquet(idx).select("neighbor_id")
      .as[Long].collect().toSet
    assert(ids.size === 30 && !ids.contains(1L) && !ids.contains(2L))
  }

  test("a leftover __retrain_old refuses a re-run instead of compounding") {
    val a = cluster(0 until 16, 1f)
    val idx = Files.createTempDirectory("graft_ivf_rt_crash_").toString
    IvfIndex.write(a, "embedding", "vec_id", idx, nCells = 2)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx + "__retrain_old"))
    val e = intercept[IllegalArgumentException](IvfIndex.retrain(spark, idx, 2))
    assert(e.getMessage.contains("interrupted retrain"))
  }
}
