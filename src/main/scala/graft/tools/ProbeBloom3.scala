package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
import graft.llm._

object ProbeBloom3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val block = docs.filter(pmod(col("doc_id"), lit(20L)) === 0)
    val b = Dedup.shingleHashSets(block, "text", "doc_id", 3)
      .select(explode(col("hs")).as("h"))
    println("=== EXPLODE PLAN ===")
    println(b.queryExecution.explainString(FormattedMode))
  }
}
