package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Stage-by-stage timing for decontaminateBloom at sf0.1 — where do the
  * seconds go relative to plain decontaminate? */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val block = docs.filter(pmod(col("doc_id"), lit(20L)) === 0)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    docs.count(); block.count()
    time("decontaminate (exact)")(
      Curation.decontaminate(docs, block, "text", "doc_id", minHits = 5L).count())
    val b = Dedup.shingleHashSets(block, "text", "doc_id", 3)
      .select(explode(col("hs")).as("h")).distinct()
    val bp = time("b persist+count")(
      { val x = b.persist(); x.count(); x })
    val bloom = time("bloomFilter build")(
      bp.stat.bloomFilter("h", math.max(bp.count(), 1L), 0.01))
    val cand = Dedup.shingleHashSets(docs, "text", "doc_id", 3)
      .select(col("id"), explode(col("hs")).as("h"))
      .filter(graft.functions.VectorFunctions.bloomMightContainLong(bloom, col("h")))
    time("cand count (prune only)")(cand.count())
    time("full decontaminateBloom")(
      Curation.decontaminateBloom(docs, block, "text", "doc_id", minHits = 5L).count())
    time("full decontaminateBloom (2nd)")(
      Curation.decontaminateBloom(docs, block, "text", "doc_id", minHits = 5L).count())
    spark.stop()
  }
}
