package graft.tools

import org.apache.spark.sql.functions._

/** Probe for the ann_ivfpq_retrain gate knobs: recall@5 of reranked
  * IVF+PQ serving on the drift fixture, before vs after retrainFrom,
  * across nProbe/refine, at a given sf dir. */
object ProbePqRetrain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.core.GraftSession.builder("local[8]", Some(8)).appName("probe-pq-retrain").getOrCreate()
    import java.nio.file.Files
    import graft.llm.{IvfPq, Similarity}
    val emb = graft.Tables.read(spark, dir, "embeddings")
    val a = emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
    val b = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        transform(col("embedding"), x => x + lit(2.0f)).as("embedding"))
    val all = a.unionByName(b).persist()
    val queries = b.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Files.createTempDirectory("graft_probe_pqrt_").toString
    IvfPq.write(a, "embedding", "vec_id", idx, nCells = 8, m = 8, k = 16)
    IvfPq.appendBatch(b, "embedding", "vec_id", idx, batchId = 0L)
    def recall(np: Int, rf: Int): Double = {
      val served = IvfPq.topKRerank(spark, idx, queries, all,
          "embedding", "vec_id", k = 5, nProbe = np, refine = rf)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      served.intersect(brute).size.toDouble / brute.size
    }
    for (np <- Seq(4, 8); rf <- Seq(8, 16))
      println(f"[probe] BEFORE nProbe=$np refine=$rf recall=${recall(np, rf)}%.3f")
    IvfPq.retrainFrom(all, "embedding", "vec_id", idx, nCells = 8, m = 8, k = 16)
    for (np <- Seq(4, 8); rf <- Seq(8, 16))
      println(f"[probe] AFTER  nProbe=$np refine=$rf recall=${recall(np, rf)}%.3f")
    spark.stop()
  }
}
