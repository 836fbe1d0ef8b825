package graft.operators

import graft.SparkSpec
import graft.llm.RunSlots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CmsStore: count-min point frequencies — one-sided estimate
  * guarantee, constant d×w cell bound, window pruning, run-slot
  * exactly-once + fold manifest, geometry pinned by the sidecar. */
class CmsStoreSpec extends SparkSpec {
  import spark.implicits._

  // 2 days; skewed keys so the heavy key dominates its cells
  private def rows = Seq(
    ("d1", "apple"), ("d1", "apple"), ("d1", "apple"), ("d1", "pear"),
    ("d2", "apple"), ("d2", "plum"), ("d2", "plum"), ("d2", "kiwi")
  ).toDF("day", "k")

  private def mk(width: Int = 64): String = {
    val p = Files.createTempDirectory("graft_cms_").toString
    CmsStore.write(rows.filter(col("day") === "d1"), "k", "day", p,
      depth = 4, width = width)
    CmsStore.appendBatch(rows.filter(col("day") === "d2"), "k", "day", p,
      batchId = 0L)
    p
  }

  private def estMap(p: String, keys: Seq[String],
                     parts: Option[Seq[String]] = None) =
    CmsStore.estimate(spark, p, keys.toDF("k"), "k", parts)
      .as[(String, Long)].collect().toMap

  private def trueCounts(parts: Set[String]): Map[String, Long] =
    rows.filter(col("day").isin(parts.toSeq: _*))
      .groupBy("k").count().as[(String, Long)].collect().toMap

  test("estimate >= true count for every key; exact at generous width") {
    val p = mk(width = 1024) // 4 keys x 4 rows in 1024 cells: no collisions
    val t = trueCounts(Set("d1", "d2"))
    assert(estMap(p, t.keys.toSeq) === t,
      "collision-free sketch must be exact")
  }

  test("one-sided guarantee holds even at width 2 (forced collisions)") {
    val p = mk(width = 2)
    val t = trueCounts(Set("d1", "d2"))
    val est = estMap(p, t.keys.toSeq)
    t.foreach { case (k, c) =>
      assert(est(k) >= c, s"est(${k}) = ${est(k)} < true $c")
    }
    // total mass bound: no estimate can exceed the window row count
    est.values.foreach(e => assert(e <= 8L))
  }

  test("never-seen key reports its min cell — 0 when uncollided") {
    val p = mk(width = 1024)
    assert(estMap(p, Seq("dragonfruit"))("dragonfruit") === 0L)
  }

  test("window pruning: per-part estimates") {
    val p = mk(width = 1024)
    assert(estMap(p, Seq("apple", "plum"), Some(Seq("d1"))) ===
      Map("apple" -> 3L, "plum" -> 0L))
    assert(estMap(p, Seq("apple", "plum"), Some(Seq("d2"))) ===
      Map("apple" -> 1L, "plum" -> 2L))
  }

  test("merged cells stay within d*w rows regardless of appends") {
    val p = mk(width = 8)
    (1 to 3).foreach(i =>
      CmsStore.appendBatch(rows, "k", "day", p, batchId = i.toLong))
    assert(CmsStore.mergedCells(spark, p).count() <= 4L * 8L)
  }

  test("replayed slot append cannot double cells; fold manifest makes it permanent") {
    val p = mk()
    val before = estMap(p, Seq("apple", "plum"))
    CmsStore.appendBatch(rows.filter(col("day") === "d2"), "k", "day", p,
      batchId = 0L)
    assert(estMap(p, Seq("apple", "plum")) === before,
      "slot replay must overwrite, not add")
    CmsStore.compact(spark, p)
    assert(estMap(p, Seq("apple", "plum")) === before)
    assert(RunSlots.foldedRuns(spark, s"$p/cms").contains("b0"))
    assert(CmsStore.slotCount(spark, p) === 0)
    CmsStore.appendBatch(rows.filter(col("day") === "d2"), "k", "day", p,
      batchId = 0L)
    assert(estMap(p, Seq("apple", "plum")) === before,
      "post-compact replay must be a no-op")
  }

  test("inner product: exact at generous width, one-sided under collisions, zero-anchored") {
    val p = mk(width = 1024)
    // d1 counts: apple 3, pear 1; d2: apple 1, plum 2, kiwi 1
    // true dot = 3*1 (apple) = 3; collision-free -> exact
    val ip = CmsStore.innerProduct(spark, p, Seq("d1"), Seq("d2"))
      .head().getLong(0)
    assert(ip === 3L)
    // forced collisions: still >= true
    val p2 = mk(width = 2)
    val ip2 = CmsStore.innerProduct(spark, p2, Seq("d1"), Seq("d2"))
      .head().getLong(0)
    assert(ip2 >= 3L)
    // an empty window is the zero vector: estimate must be EXACTLY 0,
    // which requires the zero-sum hash rows to stay min candidates
    val ip0 = CmsStore.innerProduct(spark, p, Seq("d1"), Seq("d9"))
      .head().getLong(0)
    assert(ip0 === 0L)
  }

  test("geometry comes from the sidecar; non-store path fails loudly") {
    val p = mk()
    assert(CmsStore.readMeta(spark, p) === ((4, 64)))
    val none = Files.createTempDirectory("graft_cms_none_").toString
    val e = intercept[IllegalArgumentException] {
      CmsStore.mergedCells(spark, none)
    }
    assert(e.getMessage.contains("not a count-min store"))
  }

  test("mass: per-row sums agree and equal the window's insert count; empty window is 0") {
    val p = mk()
    assert(CmsStore.mass(spark, p).head().getLong(0) === 8L)
    assert(CmsStore.mass(spark, p, Some(Seq("d1"))).head().getLong(0) === 4L)
    assert(CmsStore.mass(spark, p, Some(Seq("d9"))).head().getLong(0) === 0L)
  }

  test("a pruned window serve carries a planning-time part PartitionFilter") {
    val p = mk()
    val plan = CmsStore.mergedCells(spark, p, Some(Seq("d1")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("part") && l.contains("d1")),
      s"expected a part PartitionFilter, got: ${pf.mkString(" | ")}")
  }

  test("null keys are excluded, not hashed as a phantom key") {
    val p = Files.createTempDirectory("graft_cms_null_").toString
    val withNulls = Seq(("d1", Some("apple")), ("d1", None), ("d1", None))
      .toDF("day", "k")
    CmsStore.write(withNulls, "k", "day", p, depth = 4, width = 1024)
    assert(estMap(p, Seq("apple"))("apple") === 1L)
    // the two null rows contributed nothing anywhere
    assert(CmsStore.mergedCells(spark, p).agg(sum("cnt")).head().getLong(0)
      === 4L) // 1 key x 4 hash rows
  }

  test("streaming maintenance: auto-compact folds mid-stream; replay is a no-op") {
    val p = Files.createTempDirectory("graft_cms_st_").toString
    CmsStore.write(rows.filter(col("day") === "d1"), "k", "day", p,
      depth = 4, width = 1024)
    val srcDir = Files.createTempDirectory("graft_cms_src_").toString
    rows.filter(col("day") === "d2" && col("k") =!= "kiwi")
      .coalesce(1).write.mode("append").parquet(srcDir)
    rows.filter(col("day") === "d2" && col("k") === "kiwi")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_cms_ck_").toString
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit =
      graft.streaming.StreamingIncremental.streamingCmsMaintenance(
        spark, srcDir, schema, p, ckpt, "k", "day",
        maxFilesPerTrigger = Some(1),
        autoCompactSlots = Some(1)).awaitTermination()
    runOnce()
    val t = trueCounts(Set("d1", "d2"))
    assert(estMap(p, t.keys.toSeq) === t)
    assert(RunSlots.foldedRuns(spark, s"$p/cms").contains("b0"),
      "auto-compact at threshold 1 must fold and record the first batch")
    runOnce() // checkpointed re-run: no new batches
    assert(estMap(p, t.keys.toSeq) === t)
  }

  test("rebuild: new geometry, manifest carry no-ops the replay, partial slot refused") {
    val p = mk(width = 2) // forced collisions: estimates inflated
    val t = trueCounts(Set("d1", "d2"))
    val inflated = estMap(p, t.keys.toSeq)
    assert(inflated.exists { case (k, e) => e > t(k) },
      "width 2 must collide somewhere")
    CmsStore.rebuild(rows, "k", "day", p, depth = 4, width = 1024)
    assert(CmsStore.readMeta(spark, p) === ((4, 1024)))
    assert(estMap(p, t.keys.toSeq) === t,
      "generous rebuilt width: estimates exact")
    // the committed pre-rebuild batch is carried into the manifest —
    // its replay must NOT double d2's counts (the corpus already holds
    // that batch's rows)
    assert(RunSlots.foldedRuns(spark, s"$p/cms").contains("b0"))
    CmsStore.appendBatch(rows.filter(col("day") === "d2"), "k", "day", p,
      batchId = 0L)
    assert(estMap(p, t.keys.toSeq) === t, "replayed b0 must be a no-op")
    // a PARTIAL slot refuses the rebuild (offline op: the replay must
    // rewrite the slot first — freezing half a batch into the manifest
    // would no-op its replay)
    CmsStore.appendBatch(rows.filter(col("day") === "d1"), "k", "day", p,
      batchId = 1L)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$p/cms/run=b1/_SUCCESS"), false))
    val e = intercept[IllegalArgumentException] {
      CmsStore.rebuild(rows, "k", "day", p, depth = 4, width = 512)
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
    // leftover backup refuses too
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/cms__rebuild_old"))
    CmsStore.appendBatch(rows.filter(col("day") === "d1"), "k", "day", p,
      batchId = 1L) // replay restores the slot's _SUCCESS
    val e2 = intercept[IllegalArgumentException] {
      CmsStore.rebuild(rows, "k", "day", p, depth = 4, width = 512)
    }
    assert(e2.getMessage.contains("__rebuild_old"), e2.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/cms__rebuild_old"), true)
    CmsStore.rebuild(rows, "k", "day", p, depth = 4, width = 512)
    assert(CmsStore.readMeta(spark, p) === ((4, 512)))
    assert(RunSlots.foldedRuns(spark, s"$p/cms").contains("b1"))
    assert(estMap(p, t.keys.toSeq) === t)
  }
}
