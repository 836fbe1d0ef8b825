package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.ChunkStore

/** Append-cost-vs-store-size probe: a FIXED 100-doc batch appended to a
  * 1x vs 10x chunk store, at gate bucket count (16) and a
  * corpus-sized one (256). Claim under test: append cost is bounded by
  * the TOUCHED-bucket volume, so it stays flat when nBuckets scales
  * with the corpus (store/nBuckets constant) and grows when it
  * doesn't. */
object ChunkStoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    def corpus(k: Int) = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val batch = base.filter(col("doc_id") < 100)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text")).cache()
    batch.count()
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }
    for ((k, nb) <- Seq((1, 16), (10, 16), (10, 256))) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_csp_${k}_$nb").toString
      val docs = corpus(k)
      timeIt(s"write x$k nBuckets=$nb")(
        ChunkStore.write(docs, "text", "doc_id", root, nb))
      timeIt(s"append 100 docs to x$k nBuckets=$nb")(
        ChunkStore.append(batch, "text", "doc_id", root, nb))
    }
    spark.stop()
  }
}
