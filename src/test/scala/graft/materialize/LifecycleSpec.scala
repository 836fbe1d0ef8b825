package graft.materialize

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.runlog._
import graft.warehouse.Warehouse

/** Lifecycle/state tests over a tmp warehouse (SURVEY §5.3): windowing,
  * at-least-once duplication on failure, bootstrap, merge insert/update/
  * recency/whitelist/partition-pruning semantics. */
class LifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("lifecycle-test")
    .getOrCreate()

  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(Files.createTempDirectory("graft_wh_").toString, spark)

  private val ref = ModelRef("sales", "orders", "dataproduct", "daily")
  private def target(wh: Warehouse) = TableId("proj", "sales_orders", "daily")

  private def ts(s: String) = Timestamp.valueOf(s)

  // --- incremental_log -------------------------------------------------

  private def srcRows(upTo: String): DataFrame =
    Seq(
      (1L, ts("2024-01-01 06:00:00"), "a"),
      (2L, ts("2024-01-02 06:00:00"), "b"),
      (3L, ts("2024-01-03 06:00:00"), "c"),
      (4L, ts("2024-01-04 06:00:00"), "d"))
      .toDF("id", "event_ts", "payload")
      .filter(col("event_ts") <= lit(upTo).cast("timestamp"))

  test("A1: first run takes upper bound only; second run appends the new window; no duplicates") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts")
    val tgt = target(wh)

    // run 1 at T=2024-01-02 12:00
    val w1 = il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC")
    assert(w1.start == Ts.Default)
    assert(w1.end == "2024-01-02 12:00:00.000000 UTC")
    assert(wh.read(tgt).count() == 2) // ids 1,2

    // run 2 at T=2024-01-04 12:00 — only (run1.end, run2.end] appended
    val w2 = il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-04 12:00:00.000000 UTC")
    assert(w2.start == "2024-01-02 12:00:00.000000 UTC")
    val rows = wh.read(tgt).select("id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L, 4L)) // no duplicates

    // log has 2 started + 2 succeeded
    val lt = log.logTableFor(tgt, ref.domain)
    val byType = wh.read(lt).groupBy("eventType").count().as[(String, Long)].collect().toMap
    assert(byType == Map("model_run_started" -> 2L, "model_run_succeeded" -> 2L))
  }

  test("A1: boundary exactness — strict > lower, inclusive <= upper") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts")
    val tgt = target(wh)

    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 06:00:00.000000 UTC") // upper == id2's ts exactly
    assert(wh.read(tgt).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L)) // inclusive

    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-03 06:00:00.000000 UTC")
    // id2 (ts == prev end) must NOT reappear: strict lower bound
    val rows = wh.read(tgt).select("id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L))
  }

  test("A1: failed run leaves no success event -> window re-covered -> at-least-once duplicates") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts")
    val tgt = target(wh)

    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-01 12:00:00.000000 UTC") // id1 only

    // run 2 "fails" after append (simulate: append happened, success event not
    // written) — emulate by a model that throws AFTER we capture the appended
    // state: here we instead run a full successful run 2, then manually delete
    // its success event to simulate the failure-after-append, then run 3.
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC") // appends id2
    val lt = log.logTableFor(tgt, ref.domain)
    val events = wh.read(lt)
    // drop run 2's success event (the one with runWindowEnd = 01-02 12:00)
    val pruned = events.filter(!(col("eventType") === "model_run_succeeded" &&
      col("runWindowEnd") === lit("2024-01-02 12:00:00").cast("timestamp")))
    val prunedRows = pruned.collect().toSeq
    val schema = pruned.schema
    wh.drop(lt)
    wh.append(lt, spark.createDataFrame(
      spark.sparkContext.parallelize(prunedRows), schema))

    // run 3: prev end reads run 1's end again -> id2 re-appended (duplicate)
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 18:00:00.000000 UTC")
    val ids = wh.read(tgt).select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 2L), s"expected at-least-once duplicate of id2, got $ids")
  }

  test("A1: max_history_load_days caps the window; dev/ci default 1 day") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val tgt = target(wh)

    val w = il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts", maxHistoryLoadDays = Some(2)),
      now = () => "2024-06-01 00:00:00.000000 UTC")
    assert(w.end == "1900-01-03 00:00:00.000000 UTC") // 1900 default + 2 days

    val wh2 = freshWh()
    val il2 = new IncrementalLog(wh2, new EventLog(wh2, spark), spark)
    val w2 = il2.run(() => srcRows("2024-01-05"), target(wh2), ref, Env.Dev,
      IncrementalLogConfig(runWindowColumn = "event_ts", maxHistoryLoadDays = Some(30)),
      now = () => "2024-06-01 00:00:00.000000 UTC")
    assert(w2.end == "1900-01-02 00:00:00.000000 UTC") // dev default 1 day
  }

  test("A9: bootstrap from earliest source partition minus 1 microsecond") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val src = TableId("proj", "raw", "events_src")
    wh.overwritePartitioned(src,
      Seq((1L, "2024-03-05"), (2L, "2024-03-07")).toDF("id", "d")
        .withColumn("part_date", col("d").cast("date")))
    assert(log.earliestPartitionTimestamp(src)
      .contains("2024-03-04 23:59:59.999999 UTC"))
  }

  test("A1: on_schema_change=append_new_columns widens the target; ignore drops new columns") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val tgt = target(wh)

    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts"),
      now = () => "2024-01-01 12:00:00.000000 UTC")

    val widened = srcRows("2024-01-05").withColumn("extra", lit("x"))
    il.run(() => widened, tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts", onSchemaChange = "append_new_columns"),
      now = () => "2024-01-02 12:00:00.000000 UTC")
    val df = wh.read(tgt)
    assert(df.columns.contains("extra"))
    val extras = df.select("id", "extra").as[(Long, Option[String])].collect().toMap
    assert(extras(1L).isEmpty && extras(2L).contains("x"))

    // ignore: new column silently dropped
    val wh2 = freshWh()
    val il2 = new IncrementalLog(wh2, new EventLog(wh2, spark), spark)
    il2.run(() => srcRows("2024-01-05"), target(wh2), ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts"),
      now = () => "2024-01-01 12:00:00.000000 UTC")
    il2.run(() => widened, target(wh2), ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts", onSchemaChange = "ignore"),
      now = () => "2024-01-02 12:00:00.000000 UTC")
    assert(!wh2.read(target(wh2)).columns.contains("extra"))
  }

  test("A1: on_schema_change=fail throws on drift; sync_all_columns adds and drops") {
    val wh = freshWh()
    val il = new IncrementalLog(wh, new EventLog(wh, spark), spark)
    val tgt = target(wh)
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts"),
      now = () => "2024-01-01 12:00:00.000000 UTC")

    // fail: drift raises
    val widened = srcRows("2024-01-05").withColumn("extra", lit("x"))
    intercept[IllegalStateException] {
      il.run(() => widened, tgt, ref, Env.Prod,
        IncrementalLogConfig(runWindowColumn = "event_ts", onSchemaChange = "fail"),
        now = () => "2024-01-02 12:00:00.000000 UTC")
    }

    // sync_all_columns: payload dropped, extra added
    val synced = srcRows("2024-01-05").drop("payload").withColumn("extra", lit("y"))
    il.run(() => synced, tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts", onSchemaChange = "sync_all_columns"),
      now = () => "2024-01-02 12:00:00.000000 UTC")
    val df = wh.read(tgt)
    assert(df.columns.sorted.toSeq == Seq("event_ts", "extra", "id"))
    val extras = df.select("id", "extra").as[(Long, Option[String])].collect().toMap
    assert(extras(1L).isEmpty && extras(2L).contains("y"))
  }

  test("A1: partitioned target — appends land only in the window's day directories") {
    val wh = freshWh()
    val il = new IncrementalLog(wh, new EventLog(wh, spark), spark)
    val tgt = target(wh)
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts",
      partitionBy = Some("event_ts"), clusterBy = Seq("id"))

    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC") // ids 1,2
    assert(wh.listPartitions(tgt).map(_.toString) ==
      Seq("2024-01-01", "2024-01-02"))

    val d1 = new java.io.File(s"${wh.pathOf(tgt)}/part_date=2024-01-01")
    val before = d1.listFiles().map(f => (f.getName, f.lastModified())).toSet

    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-04 12:00:00.000000 UTC") // ids 3,4 appended
    assert(wh.listPartitions(tgt).map(_.toString) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    // prior day untouched by the append
    assert(d1.listFiles().map(f => (f.getName, f.lastModified())).toSet == before)
    // partition-pruned read sees only the requested day
    assert(wh.readPartitions(tgt, Seq(java.sql.Date.valueOf("2024-01-03")))
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("A7: pre/post hooks wrap an arbitrary (non-materialization) write — §3.3 path") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val rel = TableId("proj", "sales_orders", "hooked")
    val lt = log.logTableFor(rel, ref.domain)

    // pre-hook: computes the window and logs started
    val w1 = log.started(lt, rel, ref, Env.Prod,
      maxHistoryLoadDays = Some(30),
      now = () => "2024-01-15 00:00:00.000000 UTC")
    assert(w1 == (Ts.Default, "1900-01-31 00:00:00.000000 UTC")) // capped at default+30d
    // the model body: any write at all
    wh.overwrite(rel, srcRows("2024-01-05"))
    // post-hook RE-computes the window reading the log BEFORE this run's
    // success event exists — same result, then logs success
    log.succeeded(lt, rel, ref, Env.Prod, w1)

    // second run's pre-hook now reads the first success
    val w2 = log.started(lt, rel, ref, Env.Prod,
      maxHistoryLoadDays = Some(30),
      now = () => "2024-02-15 00:00:00.000000 UTC")
    assert(w2._1 == "1900-01-31 00:00:00.000000 UTC")
    assert(w2._2 == "1900-03-02 00:00:00.000000 UTC") // Jan 31 + 30d (1900: 28-day Feb)
    val types = wh.read(lt).groupBy("eventType").count()
      .as[(String, Long)].collect().toMap
    assert(types == Map("model_run_started" -> 2L, "model_run_succeeded" -> 1L))
  }

  // --- incremental_partition_merge ------------------------------------

  private def mkBatch(rows: Seq[(Long, String, String, Double)]): DataFrame =
    rows.toDF("id", "updated_at", "status", "amount")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))

  private val mcfg = MergeConfig(
    partitionField = "updated_at", uniqueKey = Seq("id"), eventTime = Some("updated_at"))

  test("A2: insert + update + recency-skip in one batch; untouched partitions not rewritten") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged")

    m.run(mkBatch(Seq(
      (1L, "2024-01-01 10:00:00", "old1", 1.0),
      (2L, "2024-01-02 10:00:00", "old2", 2.0),
      (3L, "2024-01-03 10:00:00", "old3", 3.0))), tgt, mcfg)
    assert(wh.listPartitions(tgt).size == 3)

    // snapshot the untouched partition's file listing
    val p3 = new java.io.File(s"${wh.pathOf(tgt)}/part_date=2024-01-03")
    val before = p3.listFiles().map(f => (f.getName, f.lastModified())).toSet

    m.run(mkBatch(Seq(
      (1L, "2024-01-01 12:00:00", "new1", 10.0), // newer -> update
      (2L, "2024-01-02 09:00:00", "stale", 99.0), // older -> recency-skip
      (4L, "2024-01-02 11:00:00", "ins4", 4.0))), // new key -> insert
      tgt, mcfg)

    val rows = wh.read(tgt).orderBy("id")
      .select("id", "status", "amount").as[(Long, String, Double)].collect().toSeq
    assert(rows == Seq(
      (1L, "new1", 10.0),  // updated
      (2L, "old2", 2.0),   // stale skipped: target values kept
      (3L, "old3", 3.0),   // untouched partition
      (4L, "ins4", 4.0)))  // inserted

    val after = p3.listFiles().map(f => (f.getName, f.lastModified())).toSet
    assert(before == after, "untouched partition files must not be rewritten")
  }

  test("A2: ON-clause partition restriction — same key in untouched partition does NOT match -> insert (duplicate)") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged2")

    m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "jan1", 1.0))), tgt, mcfg)
    // batch has key 1 but in a different day -> target's Jan-1 partition is
    // not touched -> no match -> plain insert; key 1 now exists twice
    m.run(mkBatch(Seq((1L, "2024-02-01 10:00:00", "feb1", 2.0))), tgt, mcfg)
    val rows = wh.read(tgt).select("id", "status").as[(Long, String)].collect().toSeq
    assert(rows.toSet == Set((1L, "jan1"), (1L, "feb1")))
  }

  test("A2: merge_update_columns whitelist / merge_exclude_columns blacklist") {
    val wh = freshWh()
    val tgt = TableId("proj", "sales_orders", "merged3")

    val m = new MergeIntoPartitioned(wh, spark)
    m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "orig", 1.0))), tgt, mcfg)
    // whitelist: only amount + keys/et needed for semantics; status excluded
    m.run(mkBatch(Seq((1L, "2024-01-01 12:00:00", "SHOULD_NOT_APPLY", 42.0))), tgt,
      mcfg.copy(mergeUpdateColumns = Some(Seq("id", "updated_at", "amount"))))
    val r = wh.read(tgt).select("status", "amount").as[(String, Double)].collect().head
    assert(r == ("orig", 42.0))

    m.run(mkBatch(Seq((1L, "2024-01-01 14:00:00", "STILL_NOT", 7.0))), tgt,
      mcfg.copy(mergeExcludeColumns = Some(Seq("status"))))
    val r2 = wh.read(tgt).select("status", "amount").as[(String, Double)].collect().head
    assert(r2 == ("orig", 7.0))
  }

  test("A2: composite unique key — both columns must match") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged_ck")
    val cfg = MergeConfig(partitionField = "updated_at",
      uniqueKey = Seq("id", "region"), eventTime = Some("updated_at"))
    def mk(rows: Seq[(Long, String, String, String)]) =
      rows.toDF("id", "region", "updated_at", "status")
        .withColumn("updated_at", col("updated_at").cast("timestamp"))

    m.run(mk(Seq(
      (1L, "eu", "2024-01-01 10:00:00", "a"),
      (1L, "us", "2024-01-01 10:00:00", "b"))), tgt, cfg)
    // same id, different region -> separate row; (1,eu) newer -> update
    m.run(mk(Seq(
      (1L, "eu", "2024-01-01 12:00:00", "a2"),
      (2L, "eu", "2024-01-01 11:00:00", "c"))), tgt, cfg)
    val rows = wh.read(tgt).select("id", "region", "status")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "eu", "a2"), (1L, "us", "b"), (2L, "eu", "c")))
  }

  test("A2: empty batch — first run creates empty table; later run is a no-op") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged4")

    m.run(mkBatch(Seq.empty), tgt, mcfg)
    assert(wh.exists(tgt) && wh.read(tgt).count() == 0)

    m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "a", 1.0))), tgt, mcfg)
    m.run(mkBatch(Seq.empty), tgt, mcfg)
    assert(wh.read(tgt).count() == 1)
  }

  test("A2: no event_time -> unconditional update on match") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged5")
    val cfg = mcfg.copy(eventTime = None)

    m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "v1", 1.0))), tgt, cfg)
    m.run(mkBatch(Seq((1L, "2024-01-01 08:00:00", "v2", 2.0))), tgt, cfg) // older ts still updates
    val r = wh.read(tgt).select("status").as[String].collect().toSeq
    assert(r == Seq("v2"))
  }

  test("A2: NULL key never matches -> always inserts") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged6")
    val cfg = mcfg.copy(eventTime = None)

    val withNull = Seq((Some(1L), "2024-01-01 10:00:00", "a", 1.0),
      (None: Option[Long], "2024-01-01 10:00:00", "n1", 0.0))
      .toDF("id", "updated_at", "status", "amount")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))
    m.run(withNull, tgt, cfg)
    val withNull2 = Seq((None: Option[Long], "2024-01-01 11:00:00", "n2", 0.0))
      .toDF("id", "updated_at", "status", "amount")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))
    m.run(withNull2, tgt, cfg)
    assert(wh.read(tgt).count() == 3) // both NULL-key rows present
  }

  test("A1: sync_all_columns with dropped columns keeps a partitioned target readable") {
    // Regression: the sync rewrite staged the surviving projection as an
    // UNpartitioned table, then the append wrote part_date= dirs next to
    // the flat files — conflicting directory structures on the next read.
    val wh = freshWh()
    val il = new IncrementalLog(wh, new EventLog(wh, spark), spark)
    val tgt = target(wh)
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts",
      partitionBy = Some("event_ts"), onSchemaChange = "sync_all_columns")
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC") // ids 1,2
    // drift: payload dropped, extra added -> rewrite + swap + append
    val synced = srcRows("2024-01-05").drop("payload").withColumn("extra", lit("y"))
    il.run(() => synced, tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-04 12:00:00.000000 UTC") // ids 3,4 appended
    val df = wh.read(tgt)
    assert(df.columns.sorted.toSeq == Seq("event_ts", "extra", "id", "part_date"))
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(wh.listPartitions(tgt).map(_.toString) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
  }

  test("A2: the resolve join executes exactly once when the partition field is merged") {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", "merged_1x")
    m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "a", 1.0))), tgt, mcfg)

    val joinExecs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (qe.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.nonEmpty)
          joinExecs.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      m.run(mkBatch(Seq(
        (1L, "2024-01-01 12:00:00", "upd", 2.0),
        (2L, "2024-01-01 11:00:00", "ins", 3.0))), tgt, mcfg)
      // listener delivery is async: wait for the write's execution to land,
      // then settle and assert no SECOND join-bearing execution arrived
      val deadline = System.currentTimeMillis() + 10000
      while (joinExecs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      Thread.sleep(1000)
      assert(joinExecs.get() == 1,
        s"merge must execute the resolve join once, saw ${joinExecs.get()}")
    } finally spark.listenerManager.unregister(listener)
    assert(wh.read(tgt).select("status").as[String].collect().sorted.toSeq ==
      Seq("ins", "upd"))
  }

  test("A1/A2: full refresh truncates stale partitions even under session-wide dynamic overwrite mode") {
    // GraftSession sets partitionOverwriteMode=dynamic session-wide (for
    // merge writers); a full refresh must still replace the WHOLE table —
    // overwritePartitioned forces static per-write. Regression: under
    // dynamic, stale day-partitions absent from the new data survived.
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val wh = freshWh()
      val il = new IncrementalLog(wh, new EventLog(wh, spark), spark)
      val tgt = target(wh)
      val cfg = IncrementalLogConfig(runWindowColumn = "event_ts",
        partitionBy = Some("event_ts"))
      il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
        now = () => "2024-01-04 12:00:00.000000 UTC") // days 1-4
      assert(wh.listPartitions(tgt).size == 4)
      // full refresh from a model that now holds only day 1: days 2-4 must go
      il.run(() => srcRows("2024-01-01 06:00:00"), tgt, ref, Env.Prod, cfg,
        fullRefresh = true, now = () => "2024-01-04 12:00:00.000000 UTC")
      assert(wh.listPartitions(tgt).map(_.toString) == Seq("2024-01-01"))

      // merge full refresh (CTAS-replace) must shrink the same way
      val m = new MergeIntoPartitioned(wh, spark)
      val mt = TableId("proj", "sales_orders", "merged_fr")
      m.run(mkBatch(Seq(
        (1L, "2024-01-01 10:00:00", "a", 1.0),
        (2L, "2024-01-02 10:00:00", "b", 2.0))), mt, mcfg)
      assert(wh.listPartitions(mt).size == 2)
      m.run(mkBatch(Seq((3L, "2024-01-03 10:00:00", "c", 3.0))), mt, mcfg,
        fullRefresh = true)
      assert(wh.listPartitions(mt).map(_.toString) == Seq("2024-01-03"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  // --- run log protocol ------------------------------------------------

  test("A6: dev/ci two-phase lookup — prod table id first, then dev/ci id") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val devRel = TableId("proj", "dbt_cloud_user_7", "daily")
    val lt = log.logTableFor(devRel, ref.domain)

    // only a dev-id event exists -> dev lookup falls through to it
    log.logModelEvent(lt, devRel, ref, "model_run_succeeded",
      runWindowStart = Some("2024-01-01 00:00:00.000000 UTC"),
      runWindowEnd = Some("2024-01-02 00:00:00.000000 UTC"))
    assert(log.lastSuccessfulRunWindowEnd(lt, devRel, ref, Env.Dev)
      == "2024-01-02 00:00:00.000000 UTC")

    // a PROD-id event (project.sales_orders.daily) wins over the dev one
    val prodRel = TableId("proj", "sales_orders", "daily")
    log.logModelEvent(lt, prodRel, ref, "model_run_succeeded",
      runWindowStart = Some("2024-02-01 00:00:00.000000 UTC"),
      runWindowEnd = Some("2024-02-02 00:00:00.000000 UTC"))
    assert(log.lastSuccessfulRunWindowEnd(lt, devRel, ref, Env.Dev)
      == "2024-02-02 00:00:00.000000 UTC")

    // in prod, only the exact id is consulted
    assert(log.lastSuccessfulRunWindowEnd(lt, prodRel, ref, Env.Prod)
      == "2024-02-02 00:00:00.000000 UTC")
  }

  test("A1: an existing VIEW relation is dropped then CTAS-recreated (migrating from view)") {
    val wh = freshWh()
    val il = new IncrementalLog(wh, new EventLog(wh, spark), spark)
    val tgt = target(wh)
    // deployed state is a VIEW over an older definition (ref :85-94)
    wh.createView(tgt,
      Seq((99L, ts("2023-12-31 00:00:00"), "old")).toDF("id", "event_ts", "payload"))
    assert(wh.isView(tgt))
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts"),
      now = () => "2024-01-02 12:00:00.000000 UTC")
    assert(!wh.isView(tgt), "relation must have become a table")
    assert(wh.read(tgt).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // subsequent runs append incrementally as usual
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod,
      IncrementalLogConfig(runWindowColumn = "event_ts"),
      now = () => "2024-01-04 12:00:00.000000 UTC")
    assert(wh.read(tgt).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("A1: ingestion-time partitioning lands rows in the run's load day; grants/docs persist post-build") {
    val wh = freshWh()
    val il = new IncrementalLog(wh, new EventLog(wh, spark), spark)
    val tgt = target(wh)
    val docs = graft.warehouse.TableDocs(Some("events by load day"), Map("id" -> "pk"))
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts",
      partitionByIngestionTime = true,
      grants = Map("roles/viewer" -> Seq("team-a", "team-b")),
      docs = Some(docs))
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC") // ids 1,2 @ load day 01-02
    il.run(() => srcRows("2024-01-05"), tgt, ref, Env.Prod, cfg,
      now = () => "2024-01-04 12:00:00.000000 UTC") // ids 3,4 @ load day 01-04
    assert(wh.listPartitions(tgt).map(_.toString) == Seq("2024-01-02", "2024-01-04"))
    assert(wh.readPartitions(tgt, Seq(java.sql.Date.valueOf("2024-01-04")))
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(wh.readGrants(tgt) == Map("roles/viewer" -> Seq("team-a", "team-b")))
    assert(wh.readDocs(tgt).contains(docs))
    intercept[IllegalArgumentException] { // the two partition modes are exclusive
      IncrementalLogConfig(partitionBy = Some("x"), partitionByIngestionTime = true)
    }
  }

  test("A4: --empty dry-run writes no row; compactLog collapses the per-event files") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val rel = TableId("proj", "sales_orders", "daily")
    val lt = log.logTableFor(rel, ref.domain)

    val ev = log.logModelEvent(lt, rel, ref, "model_run_started", empty = true)
    assert(ev.eventType == "model_run_started") // event built + validated
    assert(!wh.exists(lt), "--empty must not write")

    (1 to 4).foreach(i => log.logModelEvent(lt, rel, ref, "model_run_succeeded",
      runWindowStart = Some("2024-01-01 00:00:00.000000 UTC"),
      runWindowEnd = Some(s"2024-01-0$i 00:00:00.000000 UTC")))
    def dataFiles() = new java.io.File(wh.pathOf(lt)).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dataFiles() >= 4, "append-per-event: one file per event")
    log.compactLog(lt)
    assert(dataFiles() == 1, "compacted to a single file")
    assert(wh.read(lt).count() == 4)
    // the window protocol still reads the compacted log correctly
    assert(log.lastSuccessfulRunWindowEnd(lt, rel, ref, Env.Prod)
      == "2024-01-04 00:00:00.000000 UTC")
  }

  test("A4: invalid event type rejected; events carry full 3-part table id") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val rel = TableId("proj", "sales_orders", "daily")
    val lt = log.logTableFor(rel, "sales")
    assert(lt.fqn == "proj.sales_dbt_raw.sales_dbt_event_log")
    intercept[IllegalArgumentException] {
      log.logModelEvent(lt, rel, ref, "bogus_type")
    }
    log.logModelEvent(lt, rel, ref, "model_run_failed", message = Some("it's broken"))
    val row = wh.read(lt).select("bigQueryTableId", "eventMessage")
      .as[(String, String)].collect().head
    assert(row == ("proj.sales_orders.daily", "it's broken"))
  }

  // --- crash safety of the partition-swap protocol ----------------------
  //
  // The swap order is deterministic (staged dir names sorted):
  //   part_date=2024-01-01, part_date=2024-01-02, part_date=2024-01-04.
  // Pre-merge day-2 carries a row (id 5) the batch does NOT touch — the row
  // a broken recovery path would silently drop.

  private val preMergeRows = Seq(
    (1L, "2024-01-01 10:00:00", "old1", 1.0),
    (2L, "2024-01-02 10:00:00", "old2", 2.0),
    (5L, "2024-01-02 10:30:00", "old5", 5.0),
    (3L, "2024-01-03 10:00:00", "old3", 3.0))
  private val crashBatch = Seq(
    (1L, "2024-01-01 12:00:00", "new1", 10.0), // update day 1
    (2L, "2024-01-02 12:00:00", "new2", 20.0), // update day 2 (id 5 untouched)
    (4L, "2024-01-04 11:00:00", "ins4", 4.0))  // insert into brand-new day 4
  private val mergedExpected = Set(
    (1L, "new1", 10.0), (2L, "new2", 20.0), (5L, "old5", 5.0),
    (3L, "old3", 3.0), (4L, "ins4", 4.0))
  private val preMergeExpected = Set(
    (1L, "old1", 1.0), (2L, "old2", 2.0), (5L, "old5", 5.0), (3L, "old3", 3.0))

  /** Raw reader that bypasses Warehouse (and thus heal-on-read): what an
    * external reader sees at the crash instant. Underscore dirs (_stage,
    * _backup, _schema) and the _swap_pending file are invisible to Spark. */
  private def rawRows(wh: Warehouse, tgt: TableId): Set[(Long, String, Double)] =
    spark.read.parquet(wh.pathOf(tgt))
      .select("id", "status", "amount").as[(Long, String, Double)].collect().toSet

  private def crashFixture(name: String): (Warehouse, MergeIntoPartitioned, TableId) = {
    val wh = freshWh()
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = TableId("proj", "sales_orders", name)
    m.run(mkBatch(preMergeRows), tgt, mcfg)
    (wh, m, tgt)
  }

  private def leftoverFree(wh: Warehouse, tgt: TableId): Boolean = {
    val base = new java.io.File(wh.pathOf(tgt))
    Seq("_swap_pending", "_swap_pending.tmp", "_backup", "_stage")
      .forall(n => !new java.io.File(base, n).exists())
  }

  for (crashPoint <- Seq(0, 1, 2)) // journal-only / 1 of 3 swapped / all-but-one
    test(s"A2 crash-safety: injected crash after $crashPoint swap(s) — readable, recoverable, retryable") {
      val (wh, m, tgt) = crashFixture(s"crash_$crashPoint")

      wh.failAfterSwaps = crashPoint
      val e = intercept[IllegalStateException] { m.run(mkBatch(crashBatch), tgt, mcfg) }
      assert(e.getMessage.contains("injected crash"))

      // (a) readable at the crash instant: every partition dir is a COMPLETE
      // old or new version, so the raw row set is a per-partition mix
      val expectMix = preMergeExpected.map {
        case (1L, _, _) if crashPoint >= 1 => (1L, "new1", 10.0)
        case (2L, _, _) if crashPoint >= 2 => (2L, "new2", 20.0)
        case r => r
      }
      assert(rawRows(wh, tgt) == expectMix,
        s"crash after $crashPoint swaps must expose complete partitions only")

      // (b) explicit recovery rolls back to the EXACT pre-merge state
      wh.recoverPendingSwap(tgt)
      wh.recoverPendingSwap(tgt) // idempotent
      assert(rawRows(wh, tgt) == preMergeExpected)
      assert(leftoverFree(wh, tgt), "journal/backup/stage must be gone after recovery")

      // (c) a plain retry converges to the correct merged state
      // (failAfterSwaps auto-disarmed by the one-shot finally)
      m.run(mkBatch(crashBatch), tgt, mcfg)
      assert(rawRows(wh, tgt) == mergedExpected)
      assert(leftoverFree(wh, tgt))
    }

  test("A2 crash-safety: crash BETWEEN backup and install (partition dir missing) — retry alone must not drop rows") {
    val (wh, m, tgt) = crashFixture("crash_mid")

    wh.failMidSwapAt = 1 // day 1 fully swapped; day 2 backed up, NOT installed
    intercept[IllegalStateException] { m.run(mkBatch(crashBatch), tgt, mcfg) }

    // at the crash instant day 2 is missing entirely — ids 2 and 5 gone
    assert(rawRows(wh, tgt) == Set((1L, "new1", 10.0), (3L, "old3", 3.0)))

    // retry WITHOUT explicit recovery: run() must heal before it plans its
    // target reads, or id 5 (present only in _backup) is silently dropped
    m.run(mkBatch(crashBatch), tgt, mcfg)
    assert(rawRows(wh, tgt) == mergedExpected)
    assert(leftoverFree(wh, tgt))
  }

  test("A2 crash-safety: heal-on-read — Warehouse.read/listPartitions on a crashed table see the pre-merge state") {
    val (wh, m, tgt) = crashFixture("crash_read")

    wh.failAfterSwaps = 1
    intercept[IllegalStateException] { m.run(mkBatch(crashBatch), tgt, mcfg) }

    // wh.read heals first: a reader sees pre-merge rows, never the mix
    val healed = wh.read(tgt).select("id", "status", "amount")
      .as[(Long, String, Double)].collect().toSet
    assert(healed == preMergeExpected)
    assert(leftoverFree(wh, tgt))
    assert(wh.listPartitions(tgt).map(_.toString) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03")) // no half-installed day 4
  }

  test("A2 crash-safety: append into a crashed table heals first — appended rows survive the rollback") {
    val (wh, m, tgt) = crashFixture("crash_append")

    wh.failAfterSwaps = 2
    intercept[IllegalStateException] { m.run(mkBatch(crashBatch), tgt, mcfg) }

    // appendPartitioned must roll back FIRST; otherwise these rows land in a
    // swapped-in day-1 dir and the next recovery deletes them
    wh.appendPartitioned(tgt, mkBatch(Seq((9L, "2024-01-01 13:00:00", "app9", 9.0)))
      .withColumn("part_date", to_date(col("updated_at"))))
    assert(rawRows(wh, tgt) == preMergeExpected + ((9L, "app9", 9.0)))
    assert(leftoverFree(wh, tgt))
  }

  test("A2 crash-safety: stray _backup/_stage without a journal are swept; data untouched") {
    val (wh, _, tgt) = crashFixture("crash_stray")
    val base = new java.io.File(wh.pathOf(tgt))
    // the window between journal delete and backup delete: journal gone,
    // leftovers present — recovery must treat them as committed garbage
    assert(new java.io.File(base, "_backup/part_date=2024-01-01").mkdirs())
    assert(new java.io.File(base, "_stage/part_date=2024-01-01").mkdirs())
    wh.recoverPendingSwap(tgt)
    assert(leftoverFree(wh, tgt))
    assert(rawRows(wh, tgt) == preMergeExpected)
  }

  test("writer lease: concurrent materialization fails fast; lease released on success and failure; stale lease broken") {
    val wh = freshWh()
    val tgt = TableId("proj", "sales_orders", "leased")
    val m = new MergeIntoPartitioned(wh, spark)

    // a merge inside a held lease = a racing second writer: fails fast
    wh.withWriterLease(tgt) {
      // reentrancy is per-thread — simulate the second writer's thread
      val t = new Thread(() =>
        try {
          m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "x", 1.0))), tgt, mcfg)
          fail("racing merge must not proceed under a held lease")
        } catch {
          case e: IllegalStateException =>
            assert(e.getMessage.contains("locked by another writer"))
          case e: Throwable => fail(s"unexpected: $e")
        })
      t.start(); t.join()
    }
    // released after the block: a normal merge now runs
    m.run(mkBatch(Seq((1L, "2024-01-01 10:00:00", "v1", 1.0))), tgt, mcfg)
    assert(wh.read(tgt).count() == 1)

    // released after FAILURE too: arm a crash, the retry is not locked out
    wh.failAfterSwaps = 0
    intercept[Exception] {
      m.run(mkBatch(Seq((1L, "2024-01-01 11:00:00", "v2", 1.0))), tgt, mcfg)
    }
    m.run(mkBatch(Seq((1L, "2024-01-01 11:00:00", "v2", 1.0))), tgt, mcfg)
    assert(wh.read(tgt).select("status").as[String].collect().toSeq == Seq("v2"))

    // reentrant: a lease-holding job can call the leasing materialization
    wh.withWriterLease(tgt) {
      m.run(mkBatch(Seq((2L, "2024-01-02 10:00:00", "v3", 2.0))), tgt, mcfg)
    }
    assert(wh.read(tgt).count() == 2)

    // a live foreign lock blocks a merge outright...
    val lockPath = new org.apache.hadoop.fs.Path(wh.pathOf(tgt) + "._writer_lock")
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lockPath, false).close() // abandoned lock from a dead writer
    val e = intercept[IllegalStateException] {
      m.run(mkBatch(Seq((3L, "2024-01-03 10:00:00", "v4", 3.0))), tgt, mcfg)
    }
    assert(e.getMessage.contains("locked by another writer"))
    // ...but a lease older than the TTL is presumed crashed and broken
    wh.withWriterLease(tgt, ttlMs = -1) { assert(true) }
    m.run(mkBatch(Seq((3L, "2024-01-03 10:00:00", "v4", 3.0))), tgt, mcfg)
    assert(wh.read(tgt).count() == 3)
  }

  test("swap protocol REFUSES non-rename-atomic filesystems unless explicitly allowed") {
    import graft.warehouse.Warehouse
    // object-store schemes: refuse by default, pass with the opt-in flag
    Seq("s3a", "gs", "abfss").foreach { scheme =>
      val e = intercept[IllegalStateException] {
        Warehouse.requireAtomicRename(scheme, allowNonAtomic = false)
      }
      assert(e.getMessage.contains("not atomic"), scheme)
      assert(e.getMessage.contains("allowNonAtomicRename"), scheme)
      Warehouse.requireAtomicRename(scheme, allowNonAtomic = true) // no throw
    }
    // rename-atomic filesystems always pass
    Seq("file", "hdfs", "viewfs", "").foreach { scheme =>
      Warehouse.requireAtomicRename(scheme, allowNonAtomic = false)
    }
  }

  override def afterAll(): Unit = spark.stop()
}
