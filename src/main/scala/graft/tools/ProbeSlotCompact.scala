package graft.tools

import org.apache.spark.sql.functions._

/** Compaction-cadence probe (r11 verdict ask #6): per-batch
  * LabelStore.applyBatch wall over a long batch sequence, with and
  * without threshold-triggered compaction, to pin the knee that picks
  * the default `autoCompactSlots` threshold.
  *
  * Fixture: seed a labeling of `seedNodes` singleton clusters, then
  * fold `nBatches` batches of `batchPairs` pairs each; every batch
  * links fresh nodes to existing ones (so reads touch real buckets and
  * deltas are non-empty). Usage:
  *   runMain graft.tools.ProbeSlotCompact [seedNodes] [nBatches] [batchPairs] [cadence...]
  * cadence 0 = never compact. */
object ProbeSlotCompact {
  def main(args: Array[String]): Unit = {
    val seedNodes = args.lift(0).map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(40)
    val batchPairs = args.lift(2).map(_.toInt).getOrElse(500)
    val cadences = if (args.length > 3) args.drop(3).map(_.toInt).toSeq
                   else Seq(0, 25)
    val spark = graft.core.GraftSession.builder("local[8]", Some(8))
      .appName("probe-slot-compact").getOrCreate()
    import graft.llm.RunSlots
    import graft.operators.LabelStore
    import java.nio.file.Files

    for (cadence <- cadences) {
      val path = Files.createTempDirectory(s"graft_psc_${cadence}_").toString
      val seed = spark.range(seedNodes.toLong)
        .select(col("id").as("node"), col("id").as("label"))
      LabelStore.write(seed, path, nBuckets = 64)
      var compactMs = 0L
      val walls = (0 until nBatches).map { i =>
        // batch i links fresh nodes [seed + i*bp, seed + (i+1)*bp) to
        // scattered existing nodes — non-trivial deltas every batch
        val lo = seedNodes.toLong + i.toLong * batchPairs
        val pairs = spark.range(lo, lo + batchPairs)
          .select(col("id").as("id_a"),
            pmod(col("id") * 2654435761L, lit(seedNodes.toLong)).as("id_b"))
        if (cadence > 0 &&
            RunSlots.slotCount(spark, s"$path/byn") >= cadence) {
          val c0 = System.nanoTime()
          LabelStore.compact(spark, path)
          compactMs += (System.nanoTime() - c0) / 1000000L
        }
        val t0 = System.nanoTime()
        LabelStore.applyStreamBatch(spark, path, pairs, "id_a", "id_b",
          batchId = i.toLong)
        (System.nanoTime() - t0) / 1000000L
      }
      // manifest read cost at the END of the horizon — the r12 verdict's
      // residual growth term (one full read+parse per RunSlots.write):
      // with the bounded manifest this must stay O(1) at any batch count
      val mt0 = System.nanoTime()
      val manifest = (1 to 50)
        .map(_ => RunSlots.foldedRuns(spark, s"$path/byn")).last
      val manifestUs = (System.nanoTime() - mt0) / 1000 / 50
      val mf = new org.apache.hadoop.fs.Path(
        s"$path/byn/${RunSlots.ManifestFile}")
      val mfs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mBytes = if (mfs.exists(mf)) mfs.getFileStatus(mf).getLen else 0L
      val q = (p: Double) => walls.sorted.apply(
        math.min(walls.size - 1, (p * walls.size).toInt))
      println(s"[probe] cadence=$cadence seed=$seedNodes batches=$nBatches " +
        s"pairs/batch=$batchPairs " +
        s"first5=${walls.take(5).mkString(",")}ms " +
        s"mid5=${walls.slice(nBatches / 2, nBatches / 2 + 5).mkString(",")}ms " +
        s"last5=${walls.takeRight(5).mkString(",")}ms " +
        s"p50=${q(0.5)}ms p90=${q(0.9)}ms " +
        s"totalApply=${walls.sum}ms totalCompact=${compactMs}ms " +
        s"slotsLeft=${RunSlots.slotCount(spark, s"$path/byn")} " +
        s"manifestBytes=$mBytes manifestReadUs=$manifestUs " +
        s"foldedUpTo=${manifest.foldedUpTo} " +
        s"exceptions=${manifest.exceptions.size}")
    }
    spark.stop()
  }
}
