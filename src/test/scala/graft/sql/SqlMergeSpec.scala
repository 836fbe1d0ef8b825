package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableId
import graft.materialize.{MergeConfig, MergeIntoPartitioned}
import graft.warehouse.Warehouse

/** SQL MERGE surface tests: statements parsed by Spark's own grammar,
  * routed to MergeIntoPartitioned via GraftSparkExtensions. */
class SqlMergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    // extensions only take effect on a FRESH session: getOrCreate
    // against a live session from an earlier suite would silently
    // return one WITHOUT GraftSparkExtensions and every MERGE here
    // would fail on namespace resolution (order-dependent flake —
    // `testOnly graft.materialize.* graft.sql.*` reproduced it)
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .filterNot(_.sparkContext.isStopped)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .appName("sql-merge-test")
      .getOrCreate()
  }

  import spark.implicits._

  private def mkBatch(rows: Seq[(Long, String, String, Double)]): DataFrame =
    rows.toDF("id", "updated_at", "status", "amount")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))

  private val cfg = MergeConfig(partitionField = "updated_at",
    uniqueKey = Seq("id"), eventTime = Some("updated_at"))

  /** Fresh warehouse + seeded table, conf pointed at it. */
  private def fixture(name: String): (Warehouse, TableId) = {
    val wh = new Warehouse(Files.createTempDirectory("graft_sqlwh_").toString, spark)
    val tgt = TableId("proj", "demo", name)
    new MergeIntoPartitioned(wh, spark).run(mkBatch(Seq(
      (1L, "2024-01-01 10:00:00", "old1", 1.0),
      (2L, "2024-01-02 10:00:00", "old2", 2.0),
      (3L, "2024-01-03 10:00:00", "old3", 3.0))), tgt, cfg)
    spark.conf.set(GraftMergeInto.RootConf, wh.root)
    (wh, tgt)
  }

  private def rows(wh: Warehouse, tgt: TableId): Set[(Long, String, Double)] =
    wh.read(tgt).select("id", "status", "amount")
      .as[(Long, String, Double)].collect().toSet

  test("full shape: insert + update + recency-skip through spark.sql MERGE INTO") {
    val (wh, tgt) = fixture("m1")
    mkBatch(Seq(
      (1L, "2024-01-01 12:00:00", "new1", 10.0),  // newer -> update
      (2L, "2024-01-02 09:00:00", "stale", 99.0), // older -> recency-skip
      (4L, "2024-01-02 11:00:00", "ins4", 4.0)))  // new key -> insert
      .createOrReplaceTempView("b1")
    spark.sql("""
      MERGE INTO proj.demo.m1 AS t USING b1 AS s
      ON t.id = s.id
      WHEN MATCHED AND s.updated_at > t.updated_at THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(wh, tgt) == Set(
      (1L, "new1", 10.0), (2L, "old2", 2.0), (3L, "old3", 3.0), (4L, "ins4", 4.0)))
  }

  test("no recency guard: unconditional update on match") {
    val (wh, tgt) = fixture("m2")
    mkBatch(Seq((2L, "2024-01-02 09:00:00", "older_wins", 99.0)))
      .createOrReplaceTempView("b2")
    spark.sql("""
      MERGE INTO proj.demo.m2 AS t USING b2 AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(wh, tgt).contains((2L, "older_wins", 99.0)))
  }

  test("insert-only MERGE: matched rows keep target values; NULL keys insert") {
    val (wh, tgt) = fixture("m3")
    Seq(
      (Option(1L), "2024-01-01 12:00:00", "MUST_NOT_APPLY", 77.0), // matched -> untouched
      (Option(5L), "2024-01-01 13:00:00", "ins5", 5.0),            // new -> insert
      (Option.empty[Long], "2024-01-01 14:00:00", "nullkey", 6.0)) // NULL key -> insert
      .toDF("id", "updated_at", "status", "amount")
      .withColumn("updated_at", col("updated_at").cast("timestamp"))
      .createOrReplaceTempView("b3")
    spark.sql("""
      MERGE INTO proj.demo.m3 AS t USING b3 AS s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    val got = wh.read(tgt).select("id", "status").collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == Set(
      (Some(1L), "old1"), (Some(2L), "old2"), (Some(3L), "old3"),
      (Some(5L), "ins5"), (None, "nullkey")))
  }

  test("update-only MERGE: unmatched batch rows vanish") {
    val (wh, tgt) = fixture("m4")
    mkBatch(Seq(
      (1L, "2024-01-01 12:00:00", "new1", 10.0), // matched -> update
      (9L, "2024-01-01 13:00:00", "ghost", 9.0)) // unmatched -> dropped
    ).createOrReplaceTempView("b4")
    spark.sql("""
      MERGE INTO proj.demo.m4 AS t USING b4 AS s
      ON t.id = s.id
      WHEN MATCHED AND s.updated_at > t.updated_at THEN UPDATE SET *""")
    assert(rows(wh, tgt) == Set(
      (1L, "new1", 10.0), (2L, "old2", 2.0), (3L, "old3", 3.0)))
  }

  test("unsupported shapes fail at parse with actionable messages") {
    val (_, _) = fixture("m5")
    mkBatch(Seq((1L, "2024-01-01 12:00:00", "x", 1.0))).createOrReplaceTempView("b5")
    // reversed recency guard would invert semantics -> rejected
    val e1 = intercept[IllegalArgumentException](spark.sql("""
      MERGE INTO proj.demo.m5 AS t USING b5 AS s
      ON t.id = s.id
      WHEN MATCHED AND t.updated_at > s.updated_at THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(e1.getMessage.contains("matched clause"))
    // explicit assignments (not SET *) -> rejected
    val e2 = intercept[IllegalArgumentException](spark.sql("""
      MERGE INTO proj.demo.m5 AS t USING b5 AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.status = s.status"""))
    assert(e2.getMessage.contains("matched clause"))
    // non-equi ON -> rejected
    val e3 = intercept[IllegalArgumentException](spark.sql("""
      MERGE INTO proj.demo.m5 AS t USING b5 AS s
      ON t.id < s.id
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(e3.getMessage.contains("ON predicate"))
  }

  test("non-graft targets pass through to Spark untouched") {
    mkBatch(Seq((1L, "2024-01-01 12:00:00", "x", 1.0))).createOrReplaceTempView("b6")
    // target not in the graft warehouse -> our parser leaves the plan to
    // Spark, whose analyzer reports the missing table (not our error)
    val e = intercept[Exception](spark.sql("""
      MERGE INTO some.other.tbl AS t USING b6 AS s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(!e.isInstanceOf[IllegalArgumentException])
  }

  test("composite key through SQL") {
    val wh = new Warehouse(Files.createTempDirectory("graft_sqlwh_").toString, spark)
    val tgt = TableId("proj", "demo", "mck")
    val ck = MergeConfig(partitionField = "updated_at",
      uniqueKey = Seq("id", "region"), eventTime = Some("updated_at"))
    def b(rows: Seq[(Long, String, String, Double)]): DataFrame =
      rows.toDF("id", "region", "updated_at", "amount")
        .withColumn("updated_at", col("updated_at").cast("timestamp"))
    new MergeIntoPartitioned(wh, spark).run(
      b(Seq((1L, "eu", "2024-01-01 10:00:00", 1.0),
        (1L, "us", "2024-01-01 10:00:00", 2.0))), tgt, ck)
    spark.conf.set(GraftMergeInto.RootConf, wh.root)
    b(Seq((1L, "eu", "2024-01-01 12:00:00", 10.0))).createOrReplaceTempView("bck")
    spark.sql("""
      MERGE INTO proj.demo.mck AS t USING bck AS s
      ON t.id = s.id AND t.region = s.region
      WHEN MATCHED AND s.updated_at > t.updated_at THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = wh.read(tgt).select("id", "region", "amount")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "eu", 10.0), (1L, "us", 2.0)))
  }

  test("catalog SELECT: graft.db.schema.table reads the warehouse table with partition pruning") {
    val (wh, tgt) = fixture("cat1")
    val viaSql = spark.sql(
      "SELECT id, status, amount FROM graft.proj.demo.cat1 ORDER BY id")
      .as[(Long, String, Double)].collect().toSet
    assert(viaSql == rows(wh, tgt))

    // a part_date predicate must prune at planning time
    val pruned = spark.sql(
      "SELECT id FROM graft.proj.demo.cat1 WHERE part_date = DATE'2024-01-02'")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("part_date") && !l.contains("PartitionFilters: []")),
      s"expected a part_date PartitionFilter, got: ${pf.mkString(" | ")}")
    assert(pruned.as[Long].collect().toSeq == Seq(2L))
    assert(tgt.identifier == "cat1")
  }

  test("catalog INSERT INTO: unpartitioned tables append; partitioned tables refuse") {
    val wh = new Warehouse(Files.createTempDirectory("graft_sqlwh_").toString, spark)
    spark.conf.set(GraftMergeInto.RootConf, wh.root)

    // unpartitioned: v2 append lands next to Warehouse.append's files
    val tgt = TableId("proj", "demo", "ins_log")
    wh.append(tgt, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Seq((3L, "c")).toDF("id", "v").createOrReplaceTempView("ins_src")
    spark.sql("INSERT INTO graft.proj.demo.ins_log SELECT * FROM ins_src")
    assert(spark.sql("SELECT id, v FROM graft.proj.demo.ins_log ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // and the warehouse's own reader sees the inserted row too
    assert(wh.read(tgt).count() === 3)

    // partitioned: INSERT INTO must fail at analysis, not corrupt layout
    // (fixture re-points RootConf at its own fresh warehouse)
    val (wh2, ptgt) = fixture("ins_part")
    mkBatch(Seq((9L, "2024-01-09 10:00:00", "x", 9.0)))
      .createOrReplaceTempView("ins_bad")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO graft.proj.demo.ins_part SELECT * FROM ins_bad"))
    assert(e.getMessage.toLowerCase.matches("(?s).*(support|writ).*"),
      s"unexpected error: ${e.getMessage}")
    // table unharmed: still 3 rows, still readable
    assert(rows(wh2, ptgt).size === 3)
  }

  test("catalog CREATE TABLE + CTAS: unpartitioned only; schema lands in the sidecar") {
    val wh = new Warehouse(Files.createTempDirectory("graft_sqlwh_").toString, spark)
    spark.conf.set(GraftMergeInto.RootConf, wh.root)

    // plain CREATE TABLE: zero-row table, readable immediately
    spark.sql("CREATE TABLE graft.proj.demo.ct_empty (id BIGINT, v STRING)")
    assert(spark.sql("SELECT * FROM graft.proj.demo.ct_empty").count() === 0)
    // and the warehouse reader resolves the schema from the sidecar
    assert(wh.read(TableId("proj", "demo", "ct_empty")).schema.fieldNames.toSeq
      === Seq("id", "v"))

    // CTAS: create + v2 append in one statement
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft.proj.demo.ct_full AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT id, v FROM graft.proj.demo.ct_full ORDER BY id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))

    // duplicate name refused; PARTITIONED BY refused
    intercept[Exception](spark.sql(
      "CREATE TABLE graft.proj.demo.ct_full (id BIGINT)"))
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE graft.proj.demo.ct_part (id BIGINT, d DATE) PARTITIONED BY (d)"))
    assert(e.getMessage.toLowerCase.contains("partitioned"))
  }

  test("catalog SQL DDL + all-SQL merge-then-select roundtrip") {
    val (_, _) = fixture("cat2")
    // SHOW TABLES via listTables
    val listed = spark.sql("SHOW TABLES IN graft.proj.demo").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("cat2"))

    // all-SQL: MERGE through the parser surface, read back through the catalog
    mkBatch(Seq((7L, "2024-01-05 10:00:00", "ins7", 7.0))).createOrReplaceTempView("bc")
    spark.sql("""
      MERGE INTO proj.demo.cat2 AS t USING bc AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT status FROM graft.proj.demo.cat2 WHERE id = 7")
      .as[String].collect().toSeq
    assert(got == Seq("ins7"))

    // DROP through the catalog removes the table directory
    spark.sql("DROP TABLE graft.proj.demo.cat2")
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.proj.demo.cat2").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("SHOW TABLES hides the warehouse's reserved sibling dirs (guard root, swap/rewrite wreckage)") {
    val (wh, tgt) = fixture("cat3")
    // a standing guard (persistent sibling) + simulated crash leftovers
    // of the rename/deleteRows/sync protocols: all of them surfaced as
    // phantom tables, and loadTable on the guard root failed outright
    wh.armGuard(tgt, "id")
    val fs = new org.apache.hadoop.fs.Path(wh.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("cat3__replaced", "cat3__delete_tmp", "cat3__sync_tmp",
      "cat3__compact_tmp", "cat3__edna_tmp").foreach { n =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"${wh.root}/proj/demo/$n"))
    }
    val listed = spark.sql("SHOW TABLES IN graft.proj.demo").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("cat3"))
    assert(!listed.exists(_.contains("__")),
      s"reserved sibling dirs leaked into SHOW TABLES: $listed")
  }

  test("auto-armed takedown guard: config-less SQL MERGE cannot re-land a forgotten key") {
    val (wh, tgt) = fixture("m_guard")
    // the takedown arms the guard itself (records the key COLUMN at the
    // guard root) — nothing on the SQL surface is configured
    graft.llm.Forget.forgetDocs(spark, Seq(2L).toDF("doc_id"), "doc_id",
      graft.llm.Forget.Stores(warehouse = Seq(
        graft.llm.Forget.WarehouseTarget(wh, tgt, "id"))),
      denylist = true)
    assert(wh.guardColumn(tgt) === Some("id"))
    assert(!rows(wh, tgt).exists(_._1 == 2L))
    // a re-crawl upsert through plain spark.sql MERGE: forgotten key 2
    // must not re-land (it would INSERT — its row is gone), key 6 must
    mkBatch(Seq(
      (2L, "2024-01-02 12:00:00", "relanded", 99.0),
      (6L, "2024-01-02 12:00:00", "ins6", 6.0)))
      .createOrReplaceTempView("bg")
    spark.sql("""
      MERGE INTO proj.demo.m_guard AS t USING bg AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows(wh, tgt) == Set(
      (1L, "old1", 1.0), (3L, "old3", 3.0), (6L, "ins6", 6.0)))
  }

  override def afterAll(): Unit = spark.stop()
}
