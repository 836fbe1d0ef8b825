package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.operators.ConnectedComponents

/** CC cost probe at sf0.1: pair generation vs component resolution. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    var t0 = System.nanoTime()
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", 5).persist()
    println(f"pairs=${pairs.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val cc = ConnectedComponents.run(pairs, "id_a", "id_b")
    println(f"cc nodes=${cc.count()} comps=${cc.select("label").distinct().count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
