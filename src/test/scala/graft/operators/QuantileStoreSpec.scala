package graft.operators

import graft.SparkSpec
import graft.llm.RunSlots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** QuantileStore: sparse unbounded-range value summaries — exact
  * floor-div buckets over SIGNED values, window pruning, always-finite
  * quantile bounds, boundary-aligned countBelow, exact coarsen
  * migration, run-slot exactly-once + fold manifest. */
class QuantileStoreSpec extends SparkSpec {
  import spark.implicits._

  // 2 days x 2 groups; signed values, width 10:
  //  -25 -> bucket -3 ([-30,-20)), -10 -> -1, -1 -> -1, 0 -> 0,
  //   9 -> 0, 10 -> 1, 95 -> 9, 250 -> 25
  private def rows = Seq(
    ("d1", "a", -25L), ("d1", "a", 0L), ("d1", "a", 9L), ("d1", "b", 95L),
    ("d2", "a", 10L), ("d2", "b", -10L), ("d2", "b", -1L), ("d2", "b", 250L)
  ).toDF("day", "grp", "v")

  private def mk(width: Long = 10L): String = {
    val p = Files.createTempDirectory("graft_quant_").toString
    QuantileStore.write(rows.filter(col("day") === "d1"), Seq("grp"), "v",
      "day", p, width)
    QuantileStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v",
      "day", p, batchId = 0L)
    p
  }

  private def countMap(p: String, parts: Option[Seq[String]] = None) =
    QuantileStore.counts(spark, p, Seq("grp"), parts)
      .as[(String, Long, Long)].collect()
      .map { case (g, b, c) => (g, b) -> c }.toMap

  test("exact floor-div buckets on signed values; window pruning") {
    val p = mk()
    assert(countMap(p) === Map(
      ("a", -3L) -> 1L, // -25
      ("a", 0L) -> 2L,  // 0, 9
      ("a", 1L) -> 1L,  // 10
      ("b", -1L) -> 2L, // -10, -1 (floor(-10/10) = -1, floor(-1/10) = -1)
      ("b", 9L) -> 1L,  // 95
      ("b", 25L) -> 1L  // 250
    ))
    assert(countMap(p, Some(Seq("d1"))) === Map(
      ("a", -3L) -> 1L, ("a", 0L) -> 2L, ("b", 9L) -> 1L))
  }

  test("floor semantics pinned: -10 shares a bucket with -1, not with 0") {
    // truncating division would put -10/-1 at 0/-1 and split them; the
    // positive-operand identity must floor both to -1
    val p = mk()
    assert(countMap(p)(("b", -1L)) === 2L)
    assert(!countMap(p).contains(("b", 0L)))
  }

  test("quantile: rank rule, always-finite bounds, negative buckets first") {
    val p = mk()
    // grp a buckets ascending: (-3 ->1, 0 ->2, 1 ->1), total 4
    //   median rank = 2 -> cum 1,3 -> bucket 0, bounds [0, 10)
    //   p100 rank = 4 -> bucket 1, bounds [10, 20)
    val q50 = QuantileStore.quantile(spark, p, Seq("grp"), 1L, 2L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q50("a") === ("a", 0L, 0L, 10L, 4L))
    // grp b ascending: (-1 ->2, 9 ->1, 25 ->1); rank 2 -> bucket -1,
    // finite bounds [-10, 0) — where HistStore would report NULLs
    assert(q50("b") === ("b", -1L, -10L, 0L, 4L))
    val q100 = QuantileStore.quantile(spark, p, Seq("grp"), 1L, 1L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q100("a") === ("a", 1L, 10L, 20L, 4L))
    assert(q100("b") === ("b", 25L, 250L, 260L, 4L))
  }

  test("countBelow: exact on boundaries, refused off them") {
    val p = mk()
    val below0 = QuantileStore.countBelow(spark, p, Seq("grp"), 0L)
      .as[(String, Long)].collect().toMap
    assert(below0 === Map("a" -> 1L, "b" -> 2L))
    val below10 = QuantileStore.countBelow(spark, p, Seq("grp"), 10L)
      .as[(String, Long)].collect().toMap
    assert(below10 === Map("a" -> 3L, "b" -> 2L))
    val e = intercept[IllegalArgumentException] {
      QuantileStore.countBelow(spark, p, Seq("grp"), 5L)
    }
    assert(e.getMessage.contains("multiple of the store width"))
  }

  test("replayed slot append cannot double-count; fold manifest makes it permanent") {
    val p = mk()
    val before = countMap(p)
    QuantileStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v",
      "day", p, batchId = 0L)
    assert(countMap(p) === before, "slot replay must overwrite, not add")
    QuantileStore.compact(spark, p)
    assert(countMap(p) === before, "compact must not change counts")
    assert(RunSlots.foldedRuns(spark, s"$p/quant").contains("b0"))
    assert(QuantileStore.slotCount(spark, p) === 0)
    QuantileStore.appendBatch(rows.filter(col("day") === "d2"), Seq("grp"), "v",
      "day", p, batchId = 0L)
    assert(countMap(p) === before, "post-compact replay must be a no-op")
  }

  test("append width comes from the sidecar — cannot drift") {
    val p = mk()
    // an append never takes a width parameter; corrupt the sidecar to
    // prove reads go through it
    val w = QuantileStore.readWidth(spark, p)
    assert(w === 10L)
  }

  test("coarsen: exact widen equals from-scratch build; narrower refused") {
    val p = mk()
    QuantileStore.coarsen(spark, p, newWidth = 30L)
    assert(QuantileStore.readWidth(spark, p) === 30L)
    assert(RunSlots.foldedRuns(spark, s"$p/quant").contains("b0"))
    val direct = Files.createTempDirectory("graft_quant_direct_").toString
    QuantileStore.write(rows, Seq("grp"), "v", "day", direct, width = 30L)
    assert(countMap(p) === countMap(direct),
      "coarsened counts must equal a from-scratch build at the new width")
    // signed coarsen check: old bucket -3 (width 10) -> floor(-3/3) = -1
    assert(countMap(p).contains(("a", -1L)))
    val e = intercept[IllegalArgumentException] {
      QuantileStore.coarsen(spark, p, newWidth = 45L)
    }
    assert(e.getMessage.contains("multiple of the current width"))
    val e2 = intercept[IllegalArgumentException] {
      QuantileStore.coarsen(spark, p, newWidth = 30L)
    }
    assert(e2.getMessage.contains("WIDEN"))
  }

  test("log2 mode: exact buckets, value-space bounds, 2x guarantee") {
    val p = Files.createTempDirectory("graft_quant_lg_").toString
    // values spanning 5 decades: a linear width cannot hold both ends
    val wide = Seq(
      ("d1", "a", 0L), ("d1", "a", 1L), ("d1", "a", 3L),
      ("d1", "a", 900L), ("d1", "a", 1000000L),
      ("d1", "b", -7L), ("d1", "b", 5L)
    ).toDF("day", "grp", "v")
    QuantileStore.writeLog2(wide, Seq("grp"), "v", "day", p)
    // buckets: 0->0, 1->1, 3->2, 900->10, 1000000->20; -7->-1, 5->3
    val c = QuantileStore.counts(spark, p, Seq("grp"))
      .as[(String, Long, Long)].collect()
      .map { case (g, b, n) => (g, b) -> n }.toMap
    assert(c === Map(
      ("a", 0L) -> 1L, ("a", 1L) -> 1L, ("a", 2L) -> 1L,
      ("a", 10L) -> 1L, ("a", 20L) -> 1L,
      ("b", -1L) -> 1L, ("b", 3L) -> 1L))
    // grp a median rank 2 -> bucket 1 = [1, 2); p100 -> bucket 20 =
    // [2^19, 2^20) which contains 1000000: value pinned within 2x
    val q = QuantileStore.quantileLog2(spark, p, Seq("grp"), 1L, 2L)
      .select("grp", "q_bucket", "q_lo", "q_hi", "n_total")
      .as[(String, Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q("a") === ("a", 1L, Some(1L), Some(2L), 5L))
    // grp b rank 1 -> bucket -1 (negatives): bounds (NULL, 0)
    assert(q("b") === ("b", -1L, None, Some(0L), 2L))
    val q100 = QuantileStore.quantileLog2(spark, p, Seq("grp"), 1L, 1L)
      .select("grp", "q_bucket", "q_lo", "q_hi", "n_total")
      .as[(String, Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(q100("a") === ("a", 20L, Some(1L << 19), Some(1L << 20), 5L))
    assert(1L << 19 <= 1000000L && 1000000L < (1L << 20))
  }

  test("log2 appends are replay-safe and mode-guarded both directions") {
    val p = Files.createTempDirectory("graft_quant_lg2_").toString
    val d1 = Seq(("d1", "a", 10L)).toDF("day", "grp", "v")
    val d2 = Seq(("d2", "a", 100L)).toDF("day", "grp", "v")
    QuantileStore.writeLog2(d1, Seq("grp"), "v", "day", p)
    QuantileStore.appendBatchLog2(d2, Seq("grp"), "v", "day", p,
      batchId = 0L)
    QuantileStore.appendBatchLog2(d2, Seq("grp"), "v", "day", p,
      batchId = 0L) // replay: slot overwrite
    val c = QuantileStore.counts(spark, p, Seq("grp"))
      .as[(String, Long, Long)].collect().toSet
    assert(c === Set(("a", 4L, 1L), ("a", 7L, 1L))) // 10->4, 100->7
    // mode guards: raw linear calls refused on a log2 store...
    assert(intercept[IllegalArgumentException] {
      QuantileStore.appendBatch(d2, Seq("grp"), "v", "day", p, 1L)
    }.getMessage.contains("appendLog2"))
    assert(intercept[IllegalArgumentException] {
      QuantileStore.quantile(spark, p, Seq("grp"), 1L, 2L)
    }.getMessage.contains("quantileLog2"))
    assert(intercept[IllegalArgumentException] {
      QuantileStore.countBelow(spark, p, Seq("grp"), 8L)
    }.getMessage.contains("LOG2"))
    assert(intercept[IllegalArgumentException] {
      QuantileStore.coarsen(spark, p, 10L)
    }.getMessage.contains("log2"))
    // ...and log2 calls refused on a linear store
    val lin = mk()
    assert(intercept[IllegalArgumentException] {
      QuantileStore.appendLog2(d2, Seq("grp"), "v", "day", lin)
    }.getMessage.contains("LINEAR"))
    assert(intercept[IllegalArgumentException] {
      QuantileStore.quantileLog2(spark, lin, Seq("grp"), 1L, 2L)
    }.getMessage.contains("LINEAR"))
  }

  test("a pruned window serve carries a planning-time part PartitionFilter") {
    val p = mk()
    val plan = QuantileStore.counts(spark, p, Seq("grp"), Some(Seq("d1")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("part") && l.contains("d1")),
      s"expected a part PartitionFilter, got: ${pf.mkString(" | ")}")
  }

  test("drift: shared per-mille algebra over aligned buckets") {
    val p = mk()
    // grp a ref(d1) buckets {-3:1, 0:2} tr=3; cur(d2) {1:1} tc=1:
    //   333²·1000//333 + 666²·1000//666 + 1000²·1000//1000 = 1999000
    // grp b ref {9:1} tr=1; cur {-1:2, 25:1} tc=3: same by symmetry
    val d = QuantileStore.drift(spark, p, Seq("grp"), Seq("d1"), Seq("d2"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(d("a") === ("a", 1999000L, 3L, 1L))
    assert(d("b") === ("b", 1999000L, 1L, 3L))
    val z = QuantileStore.drift(spark, p, Seq("grp"), Seq("d1"), Seq("d1"))
      .as[(String, Long, Long, Long)].collect()
    assert(z.forall(_._2 === 0L))
  }

  test("empty store serve and non-store path fail loudly") {
    val p = Files.createTempDirectory("graft_quant_none_").toString
    val e = intercept[IllegalArgumentException] {
      QuantileStore.counts(spark, p, Seq("grp"))
    }
    assert(e.getMessage.contains("not a quantile store"))
  }

  test("streaming maintenance: auto-compact folds mid-stream; replay is a no-op") {
    val p = Files.createTempDirectory("graft_quant_st_").toString
    QuantileStore.write(rows.filter(col("day") === "d1"), Seq("grp"), "v",
      "day", p, width = 10L)
    val srcDir = Files.createTempDirectory("graft_quant_src_").toString
    rows.filter(col("day") === "d2" && col("grp") === "a")
      .coalesce(1).write.mode("append").parquet(srcDir)
    rows.filter(col("day") === "d2" && col("grp") === "b")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_quant_ck_").toString
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit =
      graft.streaming.StreamingIncremental.streamingQuantileMaintenance(
        spark, srcDir, schema, p, ckpt, Seq("grp"), "v", "day",
        maxFilesPerTrigger = Some(1),
        autoCompactSlots = Some(1)).awaitTermination()
    runOnce()
    val after = countMap(p)
    assert(after === Map(
      ("a", -3L) -> 1L, ("a", 0L) -> 2L, ("a", 1L) -> 1L,
      ("b", -1L) -> 2L, ("b", 9L) -> 1L, ("b", 25L) -> 1L))
    assert(RunSlots.foldedRuns(spark, s"$p/quant").contains("b0"),
      "auto-compact at threshold 1 must fold and record the first batch")
    runOnce() // checkpointed re-run: no new batches
    assert(countMap(p) === after)
  }
}
