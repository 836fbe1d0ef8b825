package graft.tools

import org.apache.spark.sql.functions._

import graft.llm.{IvfIndex, Similarity}

/** Scaling probe for the ANN paths at 1x vs 10x corpus size (SCALING.md).
  * The corpus scales by id-offset replication (like ScaleProbe's docs);
  * queries stay fixed at 10 — the serving shape. The quantity under test
  * is the round-5 rework: bruteForceTopK's bounded top-k aggregate (was a
  * single-reducer rank window) and ivfTopK's projection-only cell
  * assignment (was an n×nCells crossJoin + window). */
object ScaleProbeAnn {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def corpus(k: Int) = (0 until k).map(i =>
      emb0.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.1f s   rows=$n")
    }

    for (k <- Seq(1, 10)) {
      val c = corpus(k).cache(); val n = c.count()
      val q = c.filter(col("vec_id") < 10)
      println(s"=== x$k  (corpus=$n) ===")
      time(s"brute_topk x$k") {
        Similarity.bruteForceTopK(c, q, "embedding", "vec_id", 10).count()
      }
      time(s"ivf_topk x$k") {
        Similarity.ivfTopK(c, q, "embedding", "vec_id", 10,
          corpusRows = Some(n)).count()
      }
      val idxPath = java.nio.file.Files
        .createTempDirectory(s"graft_ivf_probe_$k").toString
      time(s"ivf_index_build x$k") {
        IvfIndex.write(c, "embedding", "vec_id", idxPath, corpusRows = Some(n)); 0L
      }
      time(s"ivf_index_topk x$k") {
        IvfIndex.topK(spark, idxPath, q, "embedding", "vec_id", 10).count()
      }
      c.unpersist()
    }
    spark.stop()
  }
}
