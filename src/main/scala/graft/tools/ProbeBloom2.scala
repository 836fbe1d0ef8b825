package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Finer-grained: which stage of the blocklist gram build is slow? */
object ProbeBloom2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val block = docs.filter(pmod(col("doc_id"), lit(20L)) === 0)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    docs.count()
    time("shingleHashSets(block).count")(
      Dedup.shingleHashSets(block, "text", "doc_id", 3).count())
    time("shingleHashSets(block).count 2nd")(
      Dedup.shingleHashSets(block, "text", "doc_id", 3).count())
    time("+explode.count")(
      Dedup.shingleHashSets(block, "text", "doc_id", 3)
        .select(explode(col("hs")).as("h")).count())
    time("+distinct.count")(
      Dedup.shingleHashSets(block, "text", "doc_id", 3)
        .select(explode(col("hs")).as("h")).distinct().count())
    time("+persist.count")({
      val x = Dedup.shingleHashSets(block, "text", "doc_id", 3)
        .select(explode(col("hs")).as("h")).distinct().persist()
      x.count(); x.unpersist() })
    time("corpus shingle+explode.count")(
      Dedup.shingleHashSets(docs, "text", "doc_id", 3)
        .select(col("id"), explode(col("hs")).as("h")).count())
    spark.stop()
  }
}
