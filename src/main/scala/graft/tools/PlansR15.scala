package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 plan audit: the scale-relevant reads of the new erasure
  * operators, printed as formatted plans.
  *
  *  - EdgeStore.dropNodes' bucket census must read ONLY (eb, src, dst)
  *    from the edge tree (ReadSchema pruning — the census is the one
  *    unavoidable full scan, since a dropped node's in-edges live in
  *    buckets keyed by their OWN src; the weight column and everything
  *    else never move until the dirty-bucket rewrite, which reads
  *    explicit bucket paths);
  *  - TopKStore.dropKeys' touched-group discovery is a broadcast
  *    semi-join against the drop set over the summary table — the
  *    rewrite never touches corpus rows because the store holds none. */
object PlansR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.read(spark, dir, "documents")
    val ids = docs.select("doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_plans15_").toString

    graft.operators.EdgeStore.write(
      ids.select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"),
        lit(1L).as("w")),
      "src", "dst", Some("w"), s"$tmp/es", nBuckets = 16)
    println("=== EdgeStore.dropNodes census (eb, src, dst only — no w) ===")
    val dropB = broadcast(ids.filter(col("doc_id") % 7 === 3)
      .select(col("doc_id").as("node")).distinct())
    val e = spark.read.parquet(s"$tmp/es/edges").select("eb", "src", "dst")
    e.join(dropB.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .unionByName(e.join(dropB.withColumnRenamed("node", "dst"),
        Seq("dst"), "left_semi").select("eb", "src", "dst"))
      .distinct()
      .groupBy("eb").agg(count(lit(1)).as("n"))
      .explain("formatted")

    println("=== TopKStore.dropKeys touched-group discovery (broadcast semi-join) ===")
    graft.operators.TopKStore.write(docs, Seq.empty, "lang", "source",
      s"$tmp/tk", m = 4)
    spark.read.parquet(s"$tmp/tk/topk")
      .join(broadcast(Seq("en").toDF("value")), Seq("value"), "left_semi")
      .select("part").distinct()
      .explain("formatted")
    spark.stop()
  }
}
