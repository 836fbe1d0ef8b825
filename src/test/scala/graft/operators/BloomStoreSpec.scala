package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** BloomStore: windowed membership — no false negatives ever, bounded
  * deterministic false positives, window pruning, replay-idempotent
  * appends (no run slots), DISTINCT-fold compaction. */
class BloomStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("d1", "apple"), ("d1", "pear"), ("d1", "apple"),
    ("d2", "plum"), ("d2", "kiwi")
  ).toDF("day", "k")

  private def mk(width: Int = 1 << 16): String = {
    val p = Files.createTempDirectory("graft_bloom_").toString
    BloomStore.write(rows.filter(col("day") === "d1"), "k", "day", p,
      depth = 4, width = width)
    BloomStore.append(rows.filter(col("day") === "d2"), "k", "day", p)
    p
  }

  private def verdicts(p: String, keys: Seq[String],
                       parts: Option[Seq[String]] = None) =
    BloomStore.mightContain(spark, p, keys.toDF("k"), "k", parts)
      .as[(String, Boolean)].collect().toMap

  test("no false negatives; definite absence at generous width") {
    val p = mk()
    val v = verdicts(p, Seq("apple", "pear", "plum", "kiwi", "mango"))
    assert(v("apple") && v("pear") && v("plum") && v("kiwi"))
    assert(!v("mango"), "64k cells, 4 keys: no collision expected")
  }

  test("window pruning: presence is per-window") {
    val p = mk()
    val d1 = verdicts(p, Seq("apple", "plum"), Some(Seq("d1")))
    assert(d1 === Map("apple" -> true, "plum" -> false))
    val d2 = verdicts(p, Seq("apple", "plum"), Some(Seq("d2")))
    assert(d2 === Map("apple" -> false, "plum" -> true))
  }

  test("width 1 degenerates honestly: everything collides to maybe") {
    val p = mk(width = 1)
    // 1 cell per row: every probe finds all its positions occupied
    val v = verdicts(p, Seq("apple", "never-seen"))
    assert(v("apple") && v("never-seen"),
      "the FP rate bound goes to 1 as w -> d*n; never a false negative")
  }

  test("replayed append is harmless; compact folds duplicates without changing verdicts") {
    val p = mk()
    val before = verdicts(p, Seq("apple", "plum", "mango"))
    BloomStore.append(rows.filter(col("day") === "d2"), "k", "day", p)
    BloomStore.append(rows.filter(col("day") === "d2"), "k", "day", p)
    assert(verdicts(p, Seq("apple", "plum", "mango")) === before,
      "set union is idempotent — replays change no verdict")
    val filesBefore = BloomStore.dataFileCount(spark, p)
    BloomStore.compact(spark, p)
    assert(BloomStore.dataFileCount(spark, p) <= filesBefore)
    assert(verdicts(p, Seq("apple", "plum", "mango")) === before,
      "compact is a DISTINCT fold — verdicts unchanged")
    // store rows are exactly the distinct positions after the fold
    val dup = spark.read.parquet(p).groupBy("part", "r", "j").count()
      .filter(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("filterNew: one-sided frontier — seen keys never pass, schema survives") {
    val p = mk()
    val batch = Seq(
      ("d3", "apple", 1), ("d3", "mango", 2), ("d3", "mango", 3),
      ("d3", "fig", 4)
    ).toDF("day", "k", "payload")
    val out = BloomStore.filterNew(spark, p, batch, "k")
      .as[(String, String, Int)].collect().sortBy(_._3)
    assert(out.map(_._2).toSet === Set("mango", "fig"),
      "apple is in the window — one-sided: it can never pass")
    assert(out.map(_._3).toSeq === Seq(2, 3, 4),
      "every batch ROW of a new key passes, payload intact")
    // window-scoped: against d2 only, d1's apple is new again
    val d2only = BloomStore.filterNew(spark, p, batch, "k", Some(Seq("d2")))
      .as[(String, String, Int)].collect()
    assert(d2only.map(_._2).toSet === Set("apple", "mango", "fig"))
  }

  test("rebuild: 4x width drops fill ~4x, corpus keys stay true, crash leaves old store readable") {
    val p = Files.createTempDirectory("graft_bloom_rb_").toString
    val corpus = (1 to 400).map(i => ("d1", s"key$i")).toDF("day", "k")
    BloomStore.write(corpus, "k", "day", p, depth = 3, width = 512)
    def fillPm(): Long = BloomStore.fill(spark, p)
      .agg(max("fill_pm")).head().getLong(0)
    def verdicts(keys: Seq[String]): Map[String, Boolean] =
      BloomStore.mightContain(spark, p, keys.toDF("k"), "k")
        .as[(String, Boolean)].collect().toMap
    val before = fillPm()
    BloomStore.rebuild(corpus, "k", "day", p, depth = 3, width = 2048)
    assert(BloomStore.readMeta(spark, p) === ((3, 2048)))
    val after = fillPm()
    // 400 keys: occupancy ~0.54 at w=512 -> ~0.18 at w=2048
    assert(after * 3 < before, s"fill must drop ~4x: $before -> $after")
    val v = verdicts(Seq("key1", "key400", "absent-a", "absent-b"))
    assert(v("key1") && v("key400"), "no false negatives at any geometry")
    // crash case: a leftover backup refuses loudly, and restoring it
    // brings the OLD geometry back intact
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.Path(p + "__rebuild_old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(p)) // half-installed wreck
    // a re-run in THIS state (store path has no meta) must still name
    // the backup remedy, not throw "not a bloom store" (round-14
    // review: the leftover check runs before readMeta)
    val eWreck = intercept[IllegalArgumentException] {
      BloomStore.rebuild(corpus, "k", "day", p, depth = 3, width = 4096)
    }
    assert(eWreck.getMessage.contains("__rebuild_old"), eWreck.getMessage)
    // the old tree is COMPLETE — restore = one rename, store serves again
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(p + "__rebuild_old"),
      new org.apache.hadoop.fs.Path(p)))
    assert(BloomStore.readMeta(spark, p) === ((3, 2048)))
    assert(verdicts(Seq("key1"))("key1"))
    // a leftover __rebuild_old makes the next rebuild refuse
    fs.mkdirs(new org.apache.hadoop.fs.Path(p + "__rebuild_old"))
    val e = intercept[IllegalArgumentException] {
      BloomStore.rebuild(corpus, "k", "day", p, depth = 3, width = 4096)
    }
    assert(e.getMessage.contains("__rebuild_old"), e.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(p + "__rebuild_old"), true)
    BloomStore.rebuild(corpus, "k", "day", p, depth = 3, width = 4096)
    assert(BloomStore.readMeta(spark, p) === ((3, 4096)))
  }

  test("filterNew: null-key rows are trivially new, not silently dropped") {
    // the store never holds a null key (inserts drop them), but an
    // equality semi-join never matches NULL — without the explicit
    // union the null-key rows vanished from the delta (ADVICE r13)
    val p = mk()
    val batch = Seq((Some("apple"), 1), (None, 2), (None, 3))
      .toDF("k", "payload")
    val out = BloomStore.filterNew(spark, p, batch, "k")
      .as[(Option[String], Int)].collect().toSet
    assert(out === Set((None, 2), (None, 3)),
      "seen key filtered; null-key rows pass through as definitely new")
  }

  test("ngramNovelty: distinct-gram counts, one-sided, short docs report (0,0)") {
    val p = Files.createTempDirectory("graft_bloom_nov_").toString
    val ref = Seq("the cat sat on the mat").toDF("text")
      .select(graft.llm.Dedup.tokens(col("text")).as("__toks"))
      .select(explode(graft.llm.Dedup.wordGrams(col("__toks"), 3))
        .as("gram"))
      .withColumn("p", lit("ref"))
    BloomStore.write(ref, "gram", "p", p, depth = 3, width = 1 << 16)
    val batch = Seq(
      (1L, "the cat sat on the mat"),     // every gram known: n_new 0
      (2L, "a dog ran over the hill"),    // every gram new
      (3L, "the cat sat on the moon"),    // mixed: only "on the moon" new
      (4L, "too short")                   // < 3 tokens: (0, 0)
    ).toDF("doc_id", "text")
    val out = graft.llm.Dedup.ngramNovelty(spark, batch, "text", "doc_id", p)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 0L, 4L)))
    assert(out(2L) === ((2L, 4L, 4L)))
    assert(out(3L) === ((3L, 1L, 4L)))
    assert(out(4L) === ((4L, 0L, 0L)))
  }

  test("compact refuses leftover crash wreckage instead of silently clobbering it") {
    val p = mk()
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the backup rename and the cleanup
    fs.mkdirs(new org.apache.hadoop.fs.Path(p + "__compact_old"))
    val e = intercept[IllegalArgumentException] {
      BloomStore.compact(spark, p)
    }
    assert(e.getMessage.contains("__compact_old"), e.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(p + "__compact_old"), true)
    BloomStore.compact(spark, p) // clean re-run succeeds
    assert(verdicts(p, Seq("apple"))("apple"))
  }

  test("geometry pinned in the sidecar; non-store path fails loudly") {
    val p = mk()
    assert(BloomStore.readMeta(spark, p) === ((4, 1 << 16)))
    val none = Files.createTempDirectory("graft_bloom_none_").toString
    val e = intercept[IllegalArgumentException] {
      BloomStore.mightContain(spark, none, Seq("x").toDF("k"), "k")
    }
    assert(e.getMessage.contains("not a bloom store"))
  }

  test("fill: exact per-row occupancy, zero rows anchored, saturation visible") {
    val p = mk() // 4 distinct keys, w = 65536: no collisions expected
    val f = BloomStore.fill(spark, p)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(f.map(_._1).toSeq === Seq(0, 1, 2, 3))
    f.foreach { case (_, occ, w, pm) =>
      assert(occ === 4L)
      assert(w === 65536L)
      assert(pm === 4L * 1000 / 65536) // = 0: integer per-mille
    }
    // window pruning: d1 holds 2 distinct keys
    BloomStore.fill(spark, p, Some(Seq("d1")))
      .as[(Int, Long, Long, Long)].collect()
      .foreach { case (_, occ, _, _) => assert(occ === 2L) }
    // saturated store: occupancy capped at w, fill_pm at 1000
    val tiny = mk(width = 2)
    BloomStore.fill(spark, tiny)
      .as[(Int, Long, Long, Long)].collect()
      .foreach { case (_, occ, w, pm) =>
        assert(occ <= 2L && w === 2L && pm <= 1000L)
      }
  }

  test("a pruned window serve carries a planning-time part PartitionFilter") {
    val p = mk()
    val plan = BloomStore.mightContain(spark, p,
        Seq("apple").toDF("k"), "k", Some(Seq("d1")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("part") && l.contains("d1")),
      s"expected a part PartitionFilter, got: ${pf.mkString(" | ")}")
  }

  test("null keys are excluded, not hashed as a phantom key") {
    val p = Files.createTempDirectory("graft_bloom_null_").toString
    val withNulls = Seq(("d1", Some("apple")), ("d1", None))
      .toDF("day", "k")
    BloomStore.write(withNulls, "k", "day", p, depth = 4, width = 1 << 16)
    assert(spark.read.parquet(p).count() === 4L) // 1 key x 4 rows
  }

  test("streaming maintenance: idempotent under checkpointed replay, file-fold mid-stream") {
    val p = Files.createTempDirectory("graft_bloom_st_").toString
    BloomStore.write(rows.filter(col("day") === "d1"), "k", "day", p,
      depth = 4, width = 1 << 16)
    val srcDir = Files.createTempDirectory("graft_bloom_src_").toString
    rows.filter(col("k") === "plum")
      .coalesce(1).write.mode("append").parquet(srcDir)
    rows.filter(col("k") === "kiwi")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft_bloom_ck_").toString
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit =
      graft.streaming.StreamingIncremental.streamingBloomMaintenance(
        spark, srcDir, schema, p, ckpt, "k", "day",
        maxFilesPerTrigger = Some(1),
        autoCompactFiles = Some(1)).awaitTermination()
    runOnce()
    val after = verdicts(p, Seq("apple", "plum", "kiwi", "mango"))
    assert(after === Map("apple" -> true, "plum" -> true,
      "kiwi" -> true, "mango" -> false))
    runOnce() // checkpointed re-run: no new batches
    assert(verdicts(p, Seq("apple", "plum", "kiwi", "mango")) === after)
  }
}
