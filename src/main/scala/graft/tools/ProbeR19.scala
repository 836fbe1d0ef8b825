package graft.tools

import org.apache.spark.sql.functions._

/** Round-19 decomposition probe: the stream_cc_bucketed gate body with
  * each phase timed OUTSIDE the streaming engine, so the per-batch cost
  * separates into fixture / serve / index-append / label-fold /
  * query-start.  Usage: ProbeR19 <sfDir> */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    import java.nio.file.Files
    import graft.llm.{Dedup, MinHashIndex}
    import graft.operators.{ConnectedComponents, LabelStore}
    val docs = graft.Tables.read(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 250)
    val idxPath = Files.createTempDirectory("graft_p19_idx_").toString
    val storePath = Files.createTempDirectory("graft_p19_lab_").toString
    // warm run of the whole fixture+loop shape first (JIT)
    timeIt("warm everything (cold JIT)") {
      val ip = Files.createTempDirectory("graft_p19w_i_").toString
      val sp = Files.createTempDirectory("graft_p19w_l_").toString
      MinHashIndex.write(corpus, "text", "doc_id", ip, nBuckets = 16)
      LabelStore.write(ConnectedComponents.run(
        Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 0.8),
        "id_a", "id_b"), sp, nBuckets = 16)
      val b = docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
        .select("doc_id", "text")
      MinHashIndex.serveThenAppendBatch(spark, ip, b, "text", "doc_id",
        0.8, 3, 16, 0L) { pairs =>
        LabelStore.applyStreamBatch(spark, sp,
          pairs.localCheckpoint(true), "id_a", "id_b", 0L)
      }
    }
    timeIt("fixture: MinHashIndex.write") {
      MinHashIndex.write(corpus, "text", "doc_id", idxPath, nBuckets = 16)
    }
    timeIt("fixture: CC.run(minhash pairs)+LabelStore.write") {
      LabelStore.write(ConnectedComponents.run(
        Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 0.8),
        "id_a", "id_b"), storePath, nBuckets = 16)
    }
    val batch1 = docs.filter(col("doc_id") >= 250).select("doc_id", "text")
    val batch2 = docs.filter(pmod(col("doc_id"), lit(10L)) === 0 &&
        col("doc_id") < 250)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    for ((b, id) <- Seq((batch1, 0L), (batch2, 1L))) {
      timeIt(s"batch $id: maybeCompact slot counts") {
        graft.llm.RunSlots.slotCount(spark, s"$idxPath/bands")
        graft.llm.RunSlots.slotCount(spark, s"$storePath/byn")
      }
      timeIt(s"batch $id: serveThenAppend TOTAL") {
        MinHashIndex.serveThenAppendBatch(spark, idxPath, b, "text",
          "doc_id", 0.8, 3, 16, id) { pairs =>
          val cp = timeIt(s"batch $id:   pairs checkpoint (serve plan)") {
            pairs.localCheckpoint(true)
          }
          timeIt(s"batch $id:   LabelStore.applyStreamBatch") {
            LabelStore.applyStreamBatch(spark, storePath, cp,
              "id_a", "id_b", id)
          }
        }
      }
    }
    timeIt("final LabelStore.read count") {
      LabelStore.read(spark, storePath).count()
    }
    spark.stop()
  }
}
