package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, LabelStore}
import graft.llm.Dedup
object ProbeCcStore {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") < 250)
    val fresh = docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
        .withColumn("doc_id", col("doc_id") + 200000L))
    val oldPairs = timeIt("oldPairs (minhash corpus)") {
      val p = Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 0.8).localCheckpoint(true); p }
    val labels = timeIt("CC.run(oldPairs)") { ConnectedComponents.run(oldPairs, "id_a", "id_b") }
    val path = java.nio.file.Files.createTempDirectory("graft_probe_ccs_").toString
    timeIt("LabelStore.write (seed, 16 buckets)") { LabelStore.write(labels, path, nBuckets = 16) }
    val batchPairs = timeIt("batchPairs (incremental minhash)") {
      Dedup.minhashNearDupPairsIncremental(fresh, corpus, "text", "doc_id", 0.8).localCheckpoint(true) }
    timeIt("applyBatch") { LabelStore.applyStreamBatch(spark, path, batchPairs, "id_a", "id_b", 0L) }
    timeIt("read + count") { LabelStore.read(spark, path).count() }
    spark.stop()
  }
}
