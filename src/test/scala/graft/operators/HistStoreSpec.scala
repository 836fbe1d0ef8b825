package graft.operators

import graft.SparkSpec
import graft.llm.RunSlots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** HistStore: mergeable fixed-bin histograms — exact counts, window
  * pruning, quantile bin bounds, run-slot exactly-once (counts are
  * additive — the EdgeStore posture), fold-manifest compaction. */
class HistStoreSpec extends SparkSpec {
  import spark.implicits._

  // 2 days x 2 groups; values chosen to pin bins exactly:
  // layout lo=0, hi=100, nBins=10 (width 10)
  private def rows = Seq(
    ("d1", "a", 5L), ("d1", "a", 15L), ("d1", "a", 15L), ("d1", "b", 95L),
    ("d2", "a", 25L), ("d2", "b", -3L), ("d2", "b", 100L), ("d2", "b", 250L)
  ).toDF("day", "grp", "v")

  private def mk(): String = {
    val p = Files.createTempDirectory("graft_hist_").toString
    HistStore.write(rows.filter(col("day") === "d1"), Seq("grp"), "v", "day",
      p, lo = 0L, hi = 100L, nBins = 10)
    HistStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      p, batchId = 0L)
    p
  }

  private def countMap(p: String, parts: Option[Seq[String]] = None) =
    HistStore.counts(spark, p, Seq("grp"), parts)
      .as[(String, Long, Long)].collect()
      .map { case (g, b, c) => (g, b) -> c }.toMap

  test("exact bin counts; underflow/overflow bins; window pruning") {
    val p = mk()
    assert(countMap(p) === Map(
      ("a", 1L) -> 1L,  // 5 -> bin 1
      ("a", 2L) -> 2L,  // 15, 15 -> bin 2
      ("a", 3L) -> 1L,  // 25 -> bin 3
      ("b", 10L) -> 1L, // 95 -> bin 10
      ("b", 0L) -> 1L,  // -3 -> underflow
      ("b", 11L) -> 2L  // 100, 250 -> overflow
    ))
    assert(countMap(p, Some(Seq("d1"))) === Map(
      ("a", 1L) -> 1L, ("a", 2L) -> 2L, ("b", 10L) -> 1L))
  }

  test("quantile: rank rule, bin bounds, unbounded-bin NULLs") {
    val p = mk()
    // grp a: counts by bin (1->1, 2->2, 3->1), total 4
    //   median rank = max(1, 4*1/2)=2 -> cum 1,3,... -> bin 2 [10,20)
    //   p75 rank = 3 -> bin 2; p100 rank = 4 -> bin 3 [20,30)
    val q50 = HistStore.quantile(spark, p, Seq("grp"), 1L, 2L)
      .as[(String, Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q50("a") === ("a", 2L, Some(10L), Some(20L), 4L))
    // grp b: bins (0->1, 10->1, 11->2), total 4; rank 2 -> bin 10
    assert(q50("b") === ("b", 10L, Some(90L), Some(100L), 4L))
    val q100 = HistStore.quantile(spark, p, Seq("grp"), 1L, 1L)
      .as[(String, Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q100("a") === ("a", 3L, Some(20L), Some(30L), 4L))
    // overflow bin has no finite bounds
    assert(q100("b") === ("b", 11L, None, None, 4L))
  }

  test("replayed slot append cannot double-count; fold manifest makes it permanent") {
    val p = mk()
    val before = countMap(p)
    // replay BEFORE compact: slot overwrite
    HistStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      p, batchId = 0L)
    assert(countMap(p) === before, "slot replay must overwrite, not add")
    HistStore.compact(spark, p)
    assert(countMap(p) === before, "compact must not change counts")
    assert(RunSlots.foldedRuns(spark, s"$p/hist").contains("b0"))
    assert(HistStore.slotCount(spark, p) === 0)
    // replay AFTER compact: manifest no-op
    HistStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      p, batchId = 0L)
    assert(countMap(p) === before, "folded replay must be a no-op")
    // compacted layout: one file per part, appends still work
    HistStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      p, batchId = 1L)
    assert(countMap(p)(("a", 3L)) === 2L)
  }

  test("a pruned window serve carries a planning-time part PartitionFilter") {
    val p = mk()
    val served = HistStore.counts(spark, p, Seq("grp"), Some(Seq("d1")))
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("part") && l.contains("d1")),
      s"expected a part PartitionFilter, got: ${pf.mkString(" | ")}")
  }

  test("layout is fixed at seed time and appends cannot drift it") {
    val p = mk()
    assert(HistStore.readMeta(spark, p) === (0L, 100L, 10))
    intercept[IllegalArgumentException] {
      HistStore.write(rows, Seq("grp"), "v", "day", p, 0L, 100L, 7)
    } // 100 % 7 != 0 — inexact bounds refused
  }

  test("rebin coarsens exactly: counts and quantiles equal a from-scratch build") {
    val p = mk()
    HistStore.rebin(spark, p, newNBins = 5) // width 10 -> 20
    assert(HistStore.readMeta(spark, p) === (0L, 100L, 5))
    // a from-scratch store at nBins=5 over the same rows
    val fresh = Files.createTempDirectory("graft_hist_rb_ref_").toString
    HistStore.write(rows.filter(col("day") === "d1"), Seq("grp"), "v", "day",
      fresh, 0L, 100L, 5)
    HistStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      fresh, batchId = 0L)
    assert(countMap(p) === countMap(fresh),
      "coarsened counts must be bit-identical to a direct build")
    // quantile serves under the NEW width: grp a median rank 2 ->
    // bin 1 [0,20) (cum: bin1 holds 5,15,15)
    val q50 = HistStore.quantile(spark, p, Seq("grp"), 1L, 2L)
      .as[(String, Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q50("a") === ("a", 1L, Some(0L), Some(20L), 4L))
    // appends after the rebin land in the coarse layout
    HistStore.append(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      p, runId = Some("fresh_b"))
    assert(countMap(p)(("a", 2L)) === 2L, "25 -> bin 2 under width 20")
  }

  test("rebin refuses anything but an exact coarsening, with the remedy") {
    val p = mk()
    val e = intercept[IllegalArgumentException] {
      HistStore.rebin(spark, p, newNBins = 3) // 10 % 3 != 0
    }
    assert(e.getMessage.contains("divisor"), e.getMessage)
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    intercept[IllegalArgumentException] {
      HistStore.rebin(spark, p, newNBins = 20) // finer — underivable
    }
    intercept[IllegalArgumentException] {
      HistStore.rebin(spark, p, newNBins = 10) // no-op request
    }
    assert(countMap(p) === countMap(mk()), "refusal must be write-free")
  }

  test("rebin folds pending slots and replays stay no-ops; legacy sidecar migrates in-tree") {
    val p = mk()
    // simulate a pre-r13 store: move the sidecar beside the tree
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$p/hist/_hist_meta.json"),
      new org.apache.hadoop.fs.Path(s"$p/_hist_meta.json"))
    assert(HistStore.readMeta(spark, p) === (0L, 100L, 10),
      "legacy beside-the-tree sidecar must stay readable")
    HistStore.rebin(spark, p, newNBins = 2)
    assert(HistStore.readMeta(spark, p) === (0L, 100L, 2))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/_hist_meta.json")),
      "rebin migrates the sidecar into the tree")
    assert(RunSlots.foldedRuns(spark, s"$p/hist").contains("b0"),
      "rebin records folded slots like any compact")
    val before = countMap(p)
    HistStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v", "day",
      p, batchId = 0L)
    assert(countMap(p) === before, "replay of a rebin-folded id is a no-op")
  }

  test("drift: served from summaries, per-group totals, hand-pinned integers") {
    val p = mk()
    // ref = d1, cur = d2
    //  grp a ref bins: 1->1, 2->2 (tr=3); cur bins: 3->1 (tc=1)
    //   pm_ref: bin1 333, bin2 666, bin3 0; pm_cur: bin1 0, bin2 0, bin3 1000
    //   contrib: 333²·1000//333 + 666²·1000//666 + 1000²·1000//1000
    //          = 333000 + 666000 + 1000000 = 1999000
    //  grp b ref: 10->1 (tr=1); cur: 0->1, 11->2 (tc=3)
    //   pm_ref: bin10 1000; pm_cur: bin0 333, bin11 666
    //   contrib = 1000²·1000//1000 + 333²·1000//333 + 666²·1000//666
    //          = 1999000
    val d = HistStore.drift(spark, p, Seq("grp"), Seq("d1"), Seq("d2"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(d("a") === ("a", 1999000L, 3L, 1L))
    assert(d("b") === ("b", 1999000L, 1L, 3L))
    // identical windows: zero drift
    val z = HistStore.drift(spark, p, Seq("grp"), Seq("d1"), Seq("d1"))
      .as[(String, Long, Long, Long)].collect()
    assert(z.forall(_._2 === 0L))
    // a group absent from one window is dropped, not divided by zero
    val oneSided = Files.createTempDirectory("graft_hist_dr_").toString
    HistStore.write(rows.filter(col("grp") === "a" || col("day") === "d1"),
      Seq("grp"), "v", "day", oneSided, 0L, 100L, 10)
    val d2 = HistStore.drift(spark, oneSided, Seq("grp"),
      Seq("d1"), Seq("d2")).as[(String, Long, Long, Long)].collect()
    assert(d2.map(_._1).toSet === Set("a"),
      "grp b has no d2 rows in this store — no defined statistic")
  }

  test("streaming maintenance: exactly-once, checkpointed replay no-op, auto-compact") {
    import graft.streaming.StreamingIncremental
    val p = Files.createTempDirectory("graft_hist_st_").toString
    HistStore.write(rows.filter(col("day") === "d1"), Seq("grp"), "v", "day",
      p, 0L, 100L, 10)
    val srcDir = Files.createTempDirectory("graft_hist_src_").toString
    rows.filter(col("day") === "d2").limit(2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    rows.filter(col("day") === "d2")
      .except(rows.filter(col("day") === "d2").limit(2))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_hist_ck_").toString
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit =
      StreamingIncremental.streamingHistMaintenance(
        spark, srcDir, schema, p, ckpt, Seq("grp"), "v", "day",
        maxFilesPerTrigger = Some(1),
        autoCompactSlots = Some(1)).awaitTermination()
    runOnce()
    runOnce() // no new batches — counts unchanged
    assert(countMap(p) === Map(
      ("a", 1L) -> 1L, ("a", 2L) -> 2L, ("a", 3L) -> 1L,
      ("b", 10L) -> 1L, ("b", 0L) -> 1L, ("b", 11L) -> 2L))
    // threshold 1 with 2 batches: b0 folded before b1 landed
    assert(RunSlots.foldedRuns(spark, s"$p/hist").contains("b0"))
  }
}
