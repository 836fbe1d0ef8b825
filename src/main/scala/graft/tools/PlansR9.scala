package graft.tools

/** Round-9 plan audit: print formatted plans for the new operators. */
object PlansR9 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.read(spark, dir, "documents")
    println("=== cdcChunks ===")
    graft.llm.Curation.cdcChunks(docs, "text", "doc_id").explain("formatted")
    println("=== containmentPairs ===")
    graft.llm.Dedup.containmentPairs(docs.select("doc_id","text"), "text", "doc_id", 0.9).explain("formatted")
    println("=== groupCentroids ===")
    graft.llm.Similarity.groupCentroids(graft.Tables.read(spark, dir, "embeddings"), "embedding", "label").explain("formatted")
    println("=== temperatureMix ===")
    graft.llm.Sampling.temperatureMix(docs.select("doc_id","source"), "doc_id", "source", 300L).explain("formatted")
    spark.stop()
  }
}
