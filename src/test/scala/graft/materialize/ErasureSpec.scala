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

/** Warehouse-layer takedown (r16 verdict "What's missing #1"): the
  * derived stores' erasure story stopped at the stores — the corpus
  * tables everything is built FROM had no delete-rows operation and
  * their append paths consulted no denylist. These pin:
  *  - `Warehouse.deleteRows`: partition-pruned survivor rewrite that
  *    leaves untouched partition files BYTE-IDENTICAL, deletes
  *    fully-emptied partitions, and is idempotent;
  *  - the `denyIdColumn` guard on both materializations' append paths
  *    (the at-least-once blind append / upsert re-landing routes);
  *  - the guard living at the SIBLING guardRoot so a full-refresh
  *    overwrite cannot wipe it;
  *  - the one-call `Forget.forgetDocs` + `Forget.audit` integration. */
class ErasureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("erasure-test")
    .getOrCreate()

  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(Files.createTempDirectory("graft_whdel_").toString, spark)

  private def ts(s: String) = Timestamp.valueOf(s)

  /** (path -> (len, checksum-ish)) for every data file of a table. */
  private def fileSig(wh: Warehouse, id: TableId): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(wh.pathOf(id))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.startsWith("part-"))
          Seq((s.getPath.toString.stripPrefix(root.toString),
            s.getLen ^ s.getModificationTime))
        else Nil
      }
    walk(root).toMap
  }

  private def corpus(): DataFrame = Seq(
    (1L, ts("2024-01-01 06:00:00"), "a"),
    (2L, ts("2024-01-01 07:00:00"), "b"),
    (3L, ts("2024-01-02 06:00:00"), "c"),
    (4L, ts("2024-01-02 07:00:00"), "d"),
    (5L, ts("2024-01-03 06:00:00"), "e"),
    (6L, ts("2024-01-04 06:00:00"), "f"))
    .toDF("doc_id", "event_ts", "payload")

  test("deleteRows: partition-pruned, untouched partitions byte-identical, emptied partition deleted") {
    val wh = freshWh()
    val id = TableId("proj", "corpus", "docs")
    wh.overwritePartitioned(id,
      corpus().withColumn(wh.PartCol, to_date(col("event_ts"))))
    val before = fileSig(wh, id)
    // 2024-01-03 is FULLY emptied (doc 5 is its only row); 2024-01-01
    // loses doc 1 and keeps doc 2; 01-02 and 01-04 are untouched
    val removed = wh.deleteRows(id, Seq(1L, 5L, 99L).toDF("id"), "doc_id")
    assert(removed === 2L)
    assert(wh.read(id).select("doc_id").as[Long].collect().sorted
      === Seq(2L, 3L, 4L, 6L))
    val after = fileSig(wh, id)
    // untouched partitions: every 01-02 / 01-04 file byte-identical
    val untouched = before.keys.filter(k =>
      k.contains("part_date=2024-01-02") || k.contains("part_date=2024-01-04"))
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(after.get(k) === before.get(k), k))
    // the emptied partition directory is GONE, not an empty husk
    val fs = new org.apache.hadoop.fs.Path(wh.pathOf(id))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      wh.pathOf(id) + "/part_date=2024-01-03")))
    // idempotent: nothing left to remove
    assert(wh.deleteRows(id, Seq(1L, 5L).toDF("id"), "doc_id") === 0L)
    assert(wh.read(id).count() === 4L)
  }

  test("deleteRows: unpartitioned table staged rewrite") {
    val wh = freshWh()
    val id = TableId("proj", "corpus", "flat")
    wh.overwrite(id, corpus())
    assert(wh.deleteRows(id, Seq(2L, 4L).toDF("id"), "doc_id") === 2L)
    assert(wh.read(id).select("doc_id").as[Long].collect().sorted
      === Seq(1L, 3L, 5L, 6L))
    assert(wh.deleteRows(id, Seq(2L).toDF("id"), "doc_id") === 0L)
    // the staged install's backup is cleaned up after a successful
    // swap, and a STALE backup from an earlier crash does not break
    // the next install (it is displaced — the live table is newer)
    val fs = new org.apache.hadoop.fs.Path(wh.pathOf(id))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      wh.pathOf(id) + "__replaced")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh.pathOf(id) + "__replaced"))
    assert(wh.deleteRows(id, Seq(6L).toDF("id"), "doc_id") === 1L)
    assert(wh.read(id).select("doc_id").as[Long].collect().sorted
      === Seq(1L, 3L, 5L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      wh.pathOf(id) + "__replaced")))
  }

  test("IncrementalLog denyIdColumn: a re-run window containing forgotten docs does not re-land them") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val id = TableId("proj", "corpus", "inc")
    val ref = ModelRef("corpus", "docs", "curated", "inc")
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts",
      partitionBy = Some("event_ts"), denyIdColumn = Some("doc_id"))
    il.run(() => corpus(), id, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC")
    // takedown: docs 1 and 3 erased AND denied at the guard root
    graft.llm.Denylist.record(Seq(1L, 3L).toDF("id"), "id", wh.guardRoot(id))
    wh.deleteRows(id, Seq(1L, 3L).toDF("id"), "doc_id")
    // the legitimate re-landing route: a later crawl re-emits the
    // forgotten docs at FRESH event times inside the new window (the
    // same shape as a failed window's blind re-append) — the guard
    // must drop them and keep the genuinely new doc
    def recrawl(): DataFrame = corpus().unionByName(Seq(
      (1L, ts("2024-01-04 09:00:00"), "a-recrawl"),
      (3L, ts("2024-01-04 09:00:00"), "c-recrawl"),
      (7L, ts("2024-01-04 09:00:00"), "g-new"))
      .toDF("doc_id", "event_ts", "payload"))
    il.run(() => recrawl(), id, ref, Env.Prod, cfg,
      now = () => "2024-01-05 12:00:00.000000 UTC")
    val served = wh.read(id).select("doc_id").as[Long].collect().sorted
    assert(!served.contains(1L) && !served.contains(3L), served.toSeq)
    assert(served.contains(5L) && served.contains(6L) && served.contains(7L))
    // the guard survives a FULL REFRESH (sibling root, not wiped by the
    // table-directory overwrite): the rebuilt table excludes denied ids
    il.run(() => corpus(), id, ref, Env.Prod, cfg, fullRefresh = true,
      now = () => "2024-01-05 12:00:00.000000 UTC")
    val rebuilt = wh.read(id).select("doc_id").as[Long].collect().sorted
    assert(rebuilt === Seq(2L, 4L, 5L, 6L))
  }

  test("Merge denyIdColumn: an upsert of a forgotten key does not re-land it") {
    val wh = freshWh()
    val merge = new MergeIntoPartitioned(wh, spark)
    val id = TableId("proj", "corpus", "mrg")
    val cfg = MergeConfig(partitionField = "event_ts",
      uniqueKey = Seq("doc_id"), denyIdColumn = Some("doc_id"))
    merge.run(corpus(), id, cfg)
    graft.llm.Denylist.record(Seq(4L).toDF("id"), "id", wh.guardRoot(id))
    wh.deleteRows(id, Seq(4L).toDF("id"), "doc_id")
    // re-crawl batch: forgotten key 4 (would INSERT — its row is gone),
    // plus an update to 3 and a brand-new 7
    merge.run(Seq(
      (4L, ts("2024-01-02 07:00:00"), "d2"),
      (3L, ts("2024-01-02 06:00:00"), "c2"),
      (7L, ts("2024-01-02 08:00:00"), "g"))
      .toDF("doc_id", "event_ts", "payload"), id, cfg)
    val rows = wh.read(id).select("doc_id", "payload")
      .as[(Long, String)].collect().toMap
    assert(!rows.contains(4L), rows.toSeq.sortBy(_._1))
    assert(rows(3L) === "c2" && rows(7L) === "g")
  }

  test("auto-armed guard: a config-less IncrementalLog honors a takedown that already happened") {
    val wh = freshWh()
    val log = new EventLog(wh, spark)
    val il = new IncrementalLog(wh, log, spark)
    val id = TableId("proj", "corpus", "inc_noconf")
    val ref = ModelRef("corpus", "docs", "curated", "inc_noconf")
    // NO denyIdColumn anywhere — the takedown arms the guard itself
    val cfg = IncrementalLogConfig(runWindowColumn = "event_ts",
      partitionBy = Some("event_ts"))
    il.run(() => corpus(), id, ref, Env.Prod, cfg,
      now = () => "2024-01-02 12:00:00.000000 UTC")
    graft.llm.Forget.forgetDocs(spark, Seq(3L).toDF("doc_id"), "doc_id",
      graft.llm.Forget.Stores(warehouse = Seq(
        graft.llm.Forget.WarehouseTarget(wh, id, "doc_id"))),
      denylist = true)
    assert(wh.guardColumn(id) === Some("doc_id"))
    def recrawl(): DataFrame = corpus().unionByName(Seq(
      (3L, ts("2024-01-04 09:00:00"), "c-recrawl"))
      .toDF("doc_id", "event_ts", "payload"))
    il.run(() => recrawl(), id, ref, Env.Prod, cfg,
      now = () => "2024-01-05 12:00:00.000000 UTC")
    val served = wh.read(id).select("doc_id").as[Long].collect().sorted
    assert(!served.contains(3L), served.toSeq)
    assert(served.contains(5L) && served.contains(6L))
  }

  test("armed guard at the primitive level: direct appends filter; an unguardable batch refuses") {
    val wh = freshWh()
    val id = TableId("proj", "corpus", "raw")
    wh.overwrite(id, corpus())
    // unarmed: appends pass through untouched (one existence probe)
    wh.append(id, corpus().filter(col("doc_id") === 1L))
    assert(wh.read(id).count() === 7L)
    // arm via the takedown, then push a batch CONTAINING forgotten ids
    // through the raw primitive — the last ingest route outside the
    // materializations
    graft.llm.Forget.forgetDocs(spark, Seq(1L, 2L).toDF("doc_id"),
      "doc_id", graft.llm.Forget.Stores(warehouse = Seq(
        graft.llm.Forget.WarehouseTarget(wh, id, "doc_id"))),
      denylist = true)
    assert(wh.read(id).filter(col("doc_id").isin(1L, 2L)).isEmpty)
    wh.append(id, corpus().filter(col("doc_id").isin(2L, 5L)))
    val served = wh.read(id).select("doc_id").as[Long].collect().sorted
    assert(!served.contains(2L), served.toSeq)
    assert(served.count(_ == 5L) === 2L, "the surviving batch row lands")
    // a batch that doesn't carry the armed column cannot be guarded —
    // refuse loudly rather than append unguarded
    val e = intercept[IllegalArgumentException] {
      wh.append(id, Seq(("x", 1.0)).toDF("other", "v"))
    }
    assert(e.getMessage.contains("takedown guard is armed"))
  }

  test("forgetDocs + audit cover the warehouse layer in one call") {
    val wh = freshWh()
    val id = TableId("proj", "corpus", "docs2")
    wh.overwritePartitioned(id,
      corpus().withColumn(wh.PartCol, to_date(col("event_ts"))))
    val stores = graft.llm.Forget.Stores(
      warehouse = Seq(graft.llm.Forget.WarehouseTarget(wh, id, "doc_id")))
    val report = graft.llm.Forget.forgetDocs(spark,
      Seq(2L, 6L).toDF("doc_id"), "doc_id", stores, denylist = true)
    assert(report.removed("warehouse:proj.corpus.docs2") === Some(2L))
    // the denylist landed at the guard root, not inside the table dir
    assert(graft.llm.Denylist.readOpt(spark, wh.guardRoot(id)).get
      .as[String].collect().toSet === Set("2", "6"))
    val audit = graft.llm.Forget.audit(spark,
      Seq(2L, 6L).toDF("doc_id"), "doc_id", stores)
    val row = audit.filter(col("store") === "warehouse:proj.corpus.docs2")
      .as[(String, Long, Long)].head()
    assert(row === (("warehouse:proj.corpus.docs2", 4L, 0L)))
  }

  test("disarmGuard removes the denylist AND the key marker; the advertised remedy actually re-admits") {
    val wh = freshWh()
    val id = TableId("proj", "corpus", "raw_dis")
    wh.overwrite(id, corpus())
    graft.llm.Forget.forgetDocs(spark, Seq(2L).toDF("doc_id"),
      "doc_id", graft.llm.Forget.Stores(warehouse = Seq(
        graft.llm.Forget.WarehouseTarget(wh, id, "doc_id"))),
      denylist = true)
    // simulate denylist-compact wreckage at the guard root so disarm
    // must clear the __compact_old fallback too (r17 ADVICE medium:
    // clear left it, and readOpt resurrected the list)
    val fs = new org.apache.hadoop.fs.Path(wh.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"${wh.guardRoot(id)}/_denylist")
    val old = new org.apache.hadoop.fs.Path(
      s"${wh.guardRoot(id)}/_denylist__compact_old")
    assert(fs.rename(live, old))
    // wreckage state still GUARDS (readOpt fallback)...
    wh.append(id, corpus().filter(col("doc_id") === 2L))
    assert(wh.read(id).filter(col("doc_id") === 2L).isEmpty)
    // ...and a guard-column-less batch still refuses
    intercept[IllegalArgumentException] {
      wh.append(id, Seq(("x", 1.0)).toDF("other", "v"))
    }
    wh.disarmGuard(id)
    // fully disarmed: the denied id re-lands, and a batch without the
    // old key column appends fine (the marker is gone, not just the list)
    assert(wh.guardColumn(id).isEmpty)
    wh.append(id, corpus().filter(col("doc_id") === 2L))
    assert(wh.read(id).filter(col("doc_id") === 2L).count() === 1L)
    wh.append(id, Seq(("x", 1.0)).toDF("other", "v"))
    assert(wh.read(id).filter(col("other") === "x").count() === 1L)
  }

  test("composite guard key at the primitive level: joined-key filtering; a missing component refuses") {
    val wh = freshWh()
    val id = TableId("proj", "corpus", "raw_ck")
    wh.overwrite(id, corpus())
    // drop (payload, doc_id) composite keys for docs 1 and 3
    val dropKeys = corpus().filter(col("doc_id").isin(1L, 3L))
      .select(graft.llm.Denylist.compositeKey(
        Seq(col("payload"), col("doc_id"))).as("k"))
    graft.llm.Forget.forgetDocs(spark, dropKeys, "k",
      graft.llm.Forget.Stores(warehouse = Seq(
        graft.llm.Forget.WarehouseTarget(wh, id, "payload+doc_id"))),
      denylist = true)
    assert(wh.guardColumn(id) === Some("payload+doc_id"))
    assert(wh.read(id).filter(col("doc_id").isin(1L, 3L)).isEmpty)
    // a re-push carrying both components filters by the JOINED key:
    // (a,1) is denied; (a,9) — same payload, different id — must land
    wh.append(id, Seq(
      (1L, ts("2024-02-01 06:00:00"), "a"),
      (9L, ts("2024-02-01 07:00:00"), "a"))
      .toDF("doc_id", "event_ts", "payload"))
    val served = wh.read(id).select("doc_id").as[Long].collect().toSet
    assert(!served.contains(1L) && served.contains(9L), served.toString)
    // a batch missing ONE component of the composite key is unguardable
    val e = intercept[IllegalArgumentException] {
      wh.append(id, Seq((7L, 1.0)).toDF("doc_id", "v"))
    }
    assert(e.getMessage.contains("every key column"))
    // armGuard refuses a conflicting re-arm on a different composite
    intercept[IllegalArgumentException] {
      wh.armGuard(id, "doc_id")
    }
  }

  override def afterAll(): Unit = ()
}
