package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._
/** Scaling probe: dedup operators at 1x vs 10x corpus size (10x = union
  * with id offsets — exact-duplicate-heavy, the realistic crawl shape). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def corpus(k: Int) = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-36s ${(System.nanoTime()-t0)/1e9}%8.1f s   rows=$n")
    }
    for (k <- Seq(1, 10)) {
      val docs = corpus(k).cache(); docs.count()
      println(s"=== corpus x$k (${5000*k} docs) ===")
      time(s"exact_dedup x$k")(Dedup.exact(docs, "text", "doc_id").count())
      time(s"simhash_pairs x$k")(Dedup.simhashNearDupPairs(docs, "text", "doc_id").count())
      time(s"minhash_lsh_pairs x$k")(Dedup.minhashNearDupPairs(docs, "text", "doc_id").count())
      time(s"ngram_jaccard_pairs x$k")(Dedup.ngramJaccardPairs(docs, "text", "doc_id").count())
      docs.unpersist()
    }
    spark.stop()
  }
}

/** The production composition: exact-collapse first, then near-dup mine
  * the survivors — input-linear even on duplicate-heavy corpora. */
object ScaleProbeComposed {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until 10).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).cache()
    docs.count()
    val t0 = System.nanoTime()
    val survivors = graft.llm.Dedup.exact(docs, "text", "doc_id")
      .select(col("doc_id"))
      .join(docs, "doc_id") // texts of the survivors
      .cache()
    val nSurv = survivors.count()
    val nPairs = graft.llm.Dedup.simhashNearDupPairs(survivors, "text", "doc_id").count()
    println(f"exact-collapse(${docs.count()}%d -> $nSurv%d) + simhash pairs($nPairs%d): ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
