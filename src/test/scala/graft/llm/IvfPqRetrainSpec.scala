package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IvfPq.retrainFrom: quantizer + codebook drift repaired from an
  * externally-custodied vector corpus (the codes-only store cannot
  * retrain from itself), with IvfIndex.retrain's staged-install
  * discipline and fold-manifest carry. */
class IvfPqRetrainSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(ids: Range, sign: Float) =
    ids.map { i =>
      (i.toLong, Array(sign * 1f + i % 4 * 0.1f, sign * 1f - i % 3 * 0.1f,
        sign * 1f + i % 5 * 0.1f, sign * 1f))
    }.toDF("vec_id", "embedding")

  private def maxCellRows(idx: String): Long =
    spark.read.parquet(idx).groupBy("cid").count()
      .agg(max("count")).first().getLong(0)

  private def recallVsBrute(idx: String, corpus: DataFrame,
                            queries: DataFrame, nCells: Int): Double = {
    val served = IvfPq.topKRerank(spark, idx, queries, corpus,
        "embedding", "vec_id", k = 5, nProbe = 2, refine = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity
      .bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    served.intersect(brute).size.toDouble / brute.size
  }

  test("retrainFrom rebalances drift and restores recall") {
    val a = cluster(0 until 64, 1f)
    val b = cluster(100 until 164, -1f) // appears AFTER training — drift
    val all = a.unionByName(b).persist()
    val idx = Files.createTempDirectory("graft_pq_rt_").toString
    IvfPq.write(a, "embedding", "vec_id", idx, nCells = 8, m = 4, k = 16)
    IvfPq.appendBatch(b, "embedding", "vec_id", idx, batchId = 0L)
    val before = maxCellRows(idx)
    assert(before >= 64, s"drifted appends should bloat one cell, max=$before")
    val queriesB = cluster(100 until 110, -1f)
    val recallBefore = recallVsBrute(idx, all, queriesB, nCells = 8)
    IvfPq.retrainFrom(all, "embedding", "vec_id", idx,
      nCells = 8, m = 4, k = 16)
    assert(spark.read.parquet(idx).count() === 128,
      "retrain must keep every vector")
    assert(maxCellRows(idx) < before,
      s"retrained quantizer must shrink the bloated cell (before=$before)")
    val recallAfter = recallVsBrute(idx, all, queriesB, nCells = 8)
    assert(recallAfter >= recallBefore,
      s"recall must not regress (before=$recallBefore after=$recallAfter)")
    assert(recallAfter >= 0.9,
      s"low-probe recall on the drifted side must be restored ($recallAfter)")
    // fold manifest carried: the pre-retrain batch id stays a no-op
    assert(RunSlots.foldedRuns(spark, idx).contains("b0"))
    IvfPq.appendBatch(b, "embedding", "vec_id", idx, batchId = 0L)
    assert(spark.read.parquet(idx).count() === 128,
      "replay of a retrained-away batch id must be a no-op")
    all.unpersist()
  }

  test("retrainFrom excludes tombstoned ids and clears the markers") {
    val a = cluster(0 until 32, 1f)
    val idx = Files.createTempDirectory("graft_pq_rt_del_").toString
    IvfPq.write(a, "embedding", "vec_id", idx, nCells = 4, m = 4, k = 8)
    IvfPq.deleteDocs(Seq(1L, 2L).toDF("vec_id"), "vec_id", idx)
    IvfPq.retrainFrom(a, "embedding", "vec_id", idx, nCells = 4, m = 4, k = 8)
    val ids = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(ids.size === 30 && !ids.contains(1L) && !ids.contains(2L))
  }

  test("leftover __retrain_old refuses a re-run; empty corpus refused with a clear message") {
    val a = cluster(0 until 16, 1f)
    val idx = Files.createTempDirectory("graft_pq_rt_crash_").toString
    IvfPq.write(a, "embedding", "vec_id", idx, nCells = 2, m = 4, k = 8)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx + "__retrain_old"))
    val e = intercept[IllegalArgumentException](
      IvfPq.retrainFrom(a, "embedding", "vec_id", idx, nCells = 2))
    assert(e.getMessage.contains("interrupted retrain"))
    fs.delete(new org.apache.hadoop.fs.Path(idx + "__retrain_old"), true)
    val e2 = intercept[IllegalArgumentException](
      IvfPq.retrainFrom(a.limit(0), "embedding", "vec_id", idx, nCells = 2))
    assert(e2.getMessage.contains("live vector"), e2.getMessage)
  }
}
