package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for the forget_docs gate body: fixture builds (6 store
  * writes), the forgetDocs call, and the audit — with per-phase job
  * counts, so the job-count reduction work targets the right third. */
object ProbeForgetPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      })
    def phase[T](name: String)(body: => T): T = {
      val j0 = counter.get(); val t0 = System.nanoTime()
      val r = body
      Thread.sleep(100)
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs=${counter.get() - j0}")
      r
    }

    for (round <- 1 to 2) {
      println(s"== round $round")
      import java.nio.file.Files
      import graft.llm.{ChunkStore, Forget, MinHashIndex}
      import graft.operators.{ConnectedComponents, EdgeStore, LabelStore,
        SampleStore, TopKStore}
      val docs = graft.Tables.read(spark, sfDir, "documents")
      val ids = docs.select("doc_id")
      val pairs = ids.as("a").join(ids.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            col("a.doc_id") % 10 =!= 9)
        .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
      val base = Files.createTempDirectory("graft_probe_forget_").toString
      val (chP, mhP, edP, lbP, tkP, smP) = (s"$base/chunk", s"$base/mh",
        s"$base/edge", s"$base/label", s"$base/topk", s"$base/sample")
      phase("chunk write")(ChunkStore.write(docs.select("doc_id", "text"),
        "text", "doc_id", chP, nBuckets = 16))
      phase("minhash write")(MinHashIndex.write(docs.select("doc_id", "text"),
        "text", "doc_id", mhP, nBuckets = 16))
      phase("edge write")(EdgeStore.write(pairs.withColumn("w", lit(1L)),
        "u", "v", Some("w"), edP, nBuckets = 8))
      phase("cc + label write")(LabelStore.write(
        ConnectedComponents.run(pairs, "u", "v"), lbP, nBuckets = 8))
      phase("topk write")(TopKStore.write(docs, Seq.empty, "doc_id", "source",
        tkP, m = 50))
      phase("sample write")(SampleStore.write(docs, Seq.empty, "doc_id",
        "source", smP, kMax = 40))
      val dropped = ids.filter(col("doc_id") % 9 === 4)
      val stores = Forget.Stores(
        chunk = Some(chP), minhash = Some(mhP), edge = Some(edP),
        label = Some(Forget.LabelTarget(lbP, pairs, "u", "v")),
        topk = Some(tkP), sample = Some(smP))
      if (sys.env.get("PROBE_STEPWISE").isDefined) {
        // mirror forgetDocs' sequence step by step (no journal/denylist)
        val idsN = dropped.select(col("doc_id").as("id")).distinct().persist()
        idsN.count()
        phase(" chunk deleteDocs")(ChunkStore.deleteDocs(idsN, "id", chP))
        phase(" chunk gc")(ChunkStore.gc(spark, chP))
        phase(" chunk compact")(ChunkStore.compact(spark, chP))
        phase(" mh deleteDocs")(MinHashIndex.deleteDocs(idsN, "id", mhP))
        phase(" mh compact")(MinHashIndex.compact(spark, mhP))
        phase(" edge dropNodes")(EdgeStore.dropNodes(spark, edP, idsN, "id"))
        phase(" label dropNodes")(LabelStore.dropNodes(
          spark, lbP, idsN, "id", pairs, "u", "v"))
        phase(" topk dropKeys")(TopKStore.dropKeys(spark, tkP, idsN, "id"))
        phase(" sample dropKeys")(SampleStore.dropKeys(spark, smP, idsN, "id"))
        idsN.unpersist()
      } else
      phase("forgetDocs")(Forget.forgetDocs(spark, dropped, "doc_id", stores,
        chunkCompact = true))
      val audit = phase("audit")(Forget.audit(spark, dropped, "doc_id", stores))
      phase("final count")(audit.count())
    }
    spark.stop()
  }
}
