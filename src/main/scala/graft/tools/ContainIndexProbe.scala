package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.ContainIndex

/** Serve-cost-vs-index-size probe for the materialized containment
  * index: a FIXED batch served against a 1x vs 10x corpus index. The
  * 100 TB claim is that serve cost tracks the batch and its collision
  * neighborhood (gram-bucket pruned reads on all three tables), not the
  * corpus — so the 10x serve should be near-flat, moving only with the
  * true posting mass of the batch's own grams. */
object ContainIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    // 10x: replicate with disjoint ids AND disjoint vocabulary per copy
    // (suffix every token) so posting lists don't grow 10x for the same
    // gram — the copies model MORE corpus, not repeated corpus
    val corpus10 = (0 until 10).map { j =>
      base.select((col("doc_id") + lit(j * 1000000L)).as("doc_id"),
        if (j == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1x$j").as("text"))
    }.reduce(_ unionByName _)
    val batch = base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" probe footer tail words")).as("text"))

    for ((label, corpus) <- Seq("1x" -> base, "10x" -> corpus10)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_cidx_probe_$label").toString
      timeIt(s"write index $label (${corpus.count()} docs)") {
        ContainIndex.write(corpus, "text", "doc_id", path,
          threshold = 0.9, nBuckets = 64)
      }
      // cold-ish then warm serve of the SAME 50-doc batch
      val n1 = timeIt(s"serve 50-doc batch vs $label index") {
        ContainIndex.containmentPairsIncremental(
          spark, path, batch, "text", "doc_id").count()
      }
      val n2 = timeIt(s"serve again (warm) vs $label") {
        ContainIndex.containmentPairsIncremental(
          spark, path, batch, "text", "doc_id").count()
      }
      println(s"  pairs: $n1 / $n2")
    }
    spark.stop()
  }
}
