package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming lifecycle tests: AvailableNow incremental progress across
  * invocations, watermarked windows, stateful dedup. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-test")
    .getOrCreate()

  import spark.implicits._

  test("incrementalAppend: AvailableNow processes only new files per invocation (checkpointed progress)") {
    val srcDir = Files.createTempDirectory("graft_stream_src_").toString
    val tgtDir = Files.createTempDirectory("graft_stream_tgt_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck_").toString

    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val q1 = StreamingIncremental.incrementalAppend(spark, srcDir, schema, tgtDir, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(tgtDir).count() == 2)

    // second invocation with one new file: only the delta is appended
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(srcDir)
    val q2 = StreamingIncremental.incrementalAppend(spark, srcDir, schema, tgtDir, ckpt)
    q2.awaitTermination()
    val out = spark.read.parquet(tgtDir).select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L), s"got ${out.toSeq}")

    // re-run with nothing new: no duplicates (exactly-once file progress)
    val q3 = StreamingIncremental.incrementalAppend(spark, srcDir, schema, tgtDir, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(tgtDir).count() == 3)
  }

  test("streamStreamIntervalJoin: a click in batch 1 joins a purchase arriving in batch 2") {
    import org.apache.spark.sql.functions._
    val srcDir = Files.createTempDirectory("graft_ssj_src_").toString
    val tgtDir = Files.createTempDirectory("graft_ssj_tgt_").toString
    val ckpt = Files.createTempDirectory("graft_ssj_ck_").toString
    val day = 86400L * 1000000L // base epoch day in micros (watermark-safe)
    def ev(id: Long, usOff: Long, user: Long, typ: String, value: Double) =
      (id, new java.sql.Timestamp((day + usOff) / 1000), user, typ, value)
    // file 1: the click (plus a filler row setting the max event time)
    Seq(ev(1, 0L, 7L, "click", 0.0), ev(2, 3600L * 1000000L, 9L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)
    // file 2: the purchase, 1h after the click — within the 4h window
    Seq(ev(3, 3600L * 1000000L, 7L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force one micro-batch per file
      .parquet(srcDir)
    val joined = StreamingIncremental.streamStreamIntervalJoin(
      src, "ts", "user_id", "event_type", "click", "purchase",
      window = "4 hours", watermark = "2 hours")
    val q = joined.writeStream.format("parquet")
      .option("path", tgtDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(tgtDir)
      .select("left_id", "right_id", "value")
      .as[(Long, Long, Double)].collect()
    // the join state for batch-1's click must survive into batch 2
    assert(out.toSeq === Seq((1L, 3L, 5.0)), s"got ${out.toSeq}")
  }

  test("streamingMergeUpsert: crash mid-merge, restart replays the batch, end state converges") {
    import graft.core.TableId
    import graft.materialize.MergeConfig
    import graft.warehouse.Warehouse

    val wh = new Warehouse(Files.createTempDirectory("graft_smu_wh_").toString, spark)
    val tgt = TableId("proj", "stream", "crash_upsert")
    val cfg = MergeConfig(partitionField = "ts", uniqueKey = Seq("id"))
    val srcDir = Files.createTempDirectory("graft_smu_src_").toString
    val ckpt = Files.createTempDirectory("graft_smu_ck_").toString
    def batchDf(rows: Seq[(Long, String, String)]) =
      rows.toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

    // seed the target so the stream's merge REWRITES a partition (the
    // swap path the fault hook interrupts)
    new graft.materialize.MergeIntoPartitioned(wh, spark).run(
      batchDf(Seq((1L, "2024-01-01 10:00:00", "stale"))), tgt, cfg)
    batchDf(Seq((1L, "2024-01-01 11:00:00", "fresh"),
        (2L, "2024-01-02 11:00:00", "new")))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    // arm the fault: the first merge crashes mid-swap; the streaming
    // query surfaces the failure and the checkpoint does NOT commit
    wh.failAfterSwaps = 0
    val q1 = StreamingIncremental.streamingMergeUpsert(
      spark, srcDir, schema, wh, tgt, cfg, ckpt)
    val e = intercept[Exception](q1.awaitTermination())
    assert(e.getMessage != null)
    // target stayed readable throughout (heal-on-read rolls back)
    assert(wh.read(tgt).count() == 1)

    // restart: the uncommitted batch replays, recovery heals first,
    // the merge converges to the correct end state
    val q2 = StreamingIncremental.streamingMergeUpsert(
      spark, srcDir, schema, wh, tgt, cfg, ckpt)
    q2.awaitTermination()
    val got = wh.read(tgt).select("id", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "fresh"), (2L, "new")))

    // and a third run is a checkpointed no-op
    val q3 = StreamingIncremental.streamingMergeUpsert(
      spark, srcDir, schema, wh, tgt, cfg, ckpt)
    q3.awaitTermination()
    assert(wh.read(tgt).count() == 2)
  }

  test("windowedCounts: tumbling window with watermark aggregates by event time") {
    val srcDir = Files.createTempDirectory("graft_stream_w_").toString
    val ckpt = Files.createTempDirectory("graft_stream_wck_").toString
    Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:20:00", "click", 2.0),
      ("2024-01-01 01:10:00", "click", 4.0),
      ("2024-01-01 00:15:00", "view", 8.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = StreamingIncremental.windowedCounts(stream, "ts", "event_type")
    // Complete mode for the finite-source check: append mode would emit a
    // window only once the watermark passes it in a LATER batch
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.sql("SELECT event_type, n, sum_value FROM win_counts ORDER BY window_start, event_type")
      .as[(String, Long, Double)].collect().toSeq
    assert(rows == Seq(("click", 2L, 3.0), ("view", 1L, 8.0), ("click", 1L, 4.0)))
  }

  test("session windows: gap-based sessionization by event time") {
    val srcDir = Files.createTempDirectory("graft_stream_s_").toString
    Seq(
      ("2024-01-01 00:00:00", "u1", 1.0),
      ("2024-01-01 00:03:00", "u1", 2.0),  // within 5min gap -> same session
      ("2024-01-01 00:20:00", "u1", 4.0),  // new session
      ("2024-01-01 00:01:00", "u2", 8.0))
      .toDF("ts_s", "user", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("sess_start"), col("user"),
        col("n"), col("sum_value"))
    val q = stream.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.sql("SELECT user, n, sum_value FROM sessions ORDER BY sess_start, user")
      .as[(String, Long, Double)].collect().toSeq
    assert(rows == Seq(("u1", 2L, 3.0), ("u2", 1L, 8.0), ("u1", 1L, 4.0)))
  }

  test("streamingExactDedup: only the first doc per content hash survives across micro-batches") {
    val srcDir = Files.createTempDirectory("graft_stream_d_").toString
    val outDir = Files.createTempDirectory("graft_stream_do_").toString
    val ckpt = Files.createTempDirectory("graft_stream_dck_").toString
    Seq((10L, "same text"), (11L, "same text"), (12L, "other"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    // durable parquet sink: state + sink both recover from the checkpoint
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema).parquet(srcDir)
        .select(md5(col("text")).as("hash"), col("doc_id"), col("text"))
        .as[StreamingIncremental.DocIn]
      val out = StreamingIncremental.streamingExactDedup(in)
      val q = out.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val ids1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
    assert(ids1.toSeq == Seq(10L, 12L)) // 11 deduped within the batch

    // a later batch re-sends the same content: state drops it
    Seq((13L, "same text"), (14L, "brand new"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    runOnce()
    val ids2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
    assert(ids2.toSeq == Seq(10L, 12L, 14L), s"got ${ids2.toSeq}")
  }

  test("streamingExactDedup: processing-time TTL expires state — late duplicates re-emitted, state bounded") {
    // NOTE: ProcessingTimeTimeout keeps scheduling wake-up batches, so
    // Trigger.AvailableNow never terminates and processAllAvailable is
    // unreliable here — drive a continuous query and poll the sink.
    implicit val sqlCtx = spark.sqlContext
    import StreamingIncremental.DocIn
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = StreamingIncremental.streamingExactDedup(mem.toDS(),
        stateTtl = Some(java.time.Duration.ofMillis(200)))
      .writeStream.format("memory").queryName("ttl_dedup")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    def ids() = spark.table("ttl_dedup").select("doc_id").as[Long].collect().sorted.toSeq
    def awaitIds(expected: Seq[Long]): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (ids() != expected && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(ids() == expected, s"got ${ids()}, wanted $expected")
    }
    try {
      mem.addData(DocIn("h1", 1L, "a"))
      awaitIds(Seq(1L))
      Thread.sleep(600) // let h1's TTL elapse; the periodic sweep expires it
      mem.addData(DocIn("h2", 2L, "b"))
      awaitIds(Seq(1L, 2L))
      mem.addData(DocIn("h1", 3L, "a")) // post-expiry duplicate: re-emitted
      awaitIds(Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streamingSessionize: watermark-closed sessions emit; the open tail stays in state") {
    val srcDir = Files.createTempDirectory("graft_sess_src_").toString
    val outDir = Files.createTempDirectory("graft_sess_out_").toString
    val ckpt = Files.createTempDirectory("graft_sess_ck_").toString
    // day-1 base: epoch-0 events would collide with the INITIAL watermark
    // (0 ms) and be dropped as late before reaching the state function
    def ts(min: Long) = new java.sql.Timestamp(86400000L + min * 60000L)
    // user 1: session A = {t0, t10}, session B = {t100, t105}, open tail {t500}
    // user 2: session C = {t0}, open tail {t490}
    Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(100)), (1L, ts(105)), (1L, ts(500)),
      (2L, ts(0)), (2L, ts(490))
    ).toDF("user_id", "ts").write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val in = spark.readStream.schema(schema).parquet(srcDir)
      .withWatermark("ts", "0 seconds")
      .as[StreamingIncremental.SessIn]
    val gapUs = 30L * 60 * 1000000 // 30 min
    val q = StreamingIncremental.streamingSessionize(in, gapUs)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.read.parquet(outDir)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().sorted
    def us(min: Long) = 86400000000L + min * 60000000L
    // watermark lands at t500: sessions ending <= t470 close; both open
    // tails (t500, t490) and nothing-after-them stay unemitted
    assert(got.toSeq === Seq(
      (1L, us(0), us(10), 2L),
      (1L, us(100), us(105), 2L),
      (2L, us(0), us(0), 1L)))
  }

  test("streamingIndexedDedup: micro-batched serve+append equals the one-shot incremental serve") {
    import graft.llm.MinHashIndex
    // corpus: two docs; fresh: a clone of doc 1 (batch 1) and a clone of
    // the batch-1 doc itself (batch 2) — exercises new-vs-index AND
    // new-vs-earlier-batch discovery
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val corpus = Seq((1L, base + "one"), (2L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("graft_smt_idx_").toString
    MinHashIndex.write(corpus, "text", "doc_id", idxPath, nBuckets = 4)

    val srcDir = Files.createTempDirectory("graft_smt_src_").toString
    Seq((10L, base + "one")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((20L, base + "one")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val pairsPath = Files.createTempDirectory("graft_smt_pairs_").toString
    val ckpt = Files.createTempDirectory("graft_smt_ck_").toString
    val schema = spark.read.parquet(srcDir).schema

    def run(): Unit = {
      val q = StreamingIncremental.streamingIndexedDedup(
        spark, srcDir, schema, idxPath, pairsPath, ckpt, "text", "doc_id",
        jaccardThreshold = 0.8, nBuckets = 4, maxFilesPerTrigger = Some(1))
      q.awaitTermination()
    }
    run()
    val got = spark.read.parquet(pairsPath)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // one-shot equivalent on a FRESH index copy
    val idx2 = Files.createTempDirectory("graft_smt_idx2_").toString
    MinHashIndex.write(corpus, "text", "doc_id", idx2, nBuckets = 4)
    val oneShot = MinHashIndex.nearDupPairsIncremental(spark, idx2,
        Seq((10L, base + "one"), (20L, base + "one")).toDF("doc_id", "text"),
        "text", "doc_id", jaccardThreshold = 0.8, nBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === oneShot, s"streamed $got vs one-shot $oneShot")
    assert(got === Set((1L, 10L), (1L, 20L), (10L, 20L)))
    // (10,20) must be discovered by batch 2 against the APPENDED batch 1
    val b1 = spark.read.parquet(s"$pairsPath/batch=1")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(b1.contains((10L, 20L)))

    // checkpointed re-run: no new batches, pair set unchanged
    run()
    assert(spark.read.parquet(pairsPath)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet === oneShot)
  }

  override def afterAll(): Unit = spark.stop()
}
