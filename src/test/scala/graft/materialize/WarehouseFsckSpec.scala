package graft.materialize

import graft.SparkSpec
import graft.core.TableId
import graft.warehouse.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Warehouse.fsck: the clean path is gated (`warehouse_fsck`); this
  * pins detection — each invariant the write protocols promise is
  * deliberately broken and the matching check must fire — plus the
  * heal path (recoverPendingSwap clears the reported wreckage). */
class WarehouseFsckSpec extends SparkSpec {
  import spark.implicits._

  private def violations(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.as[(String, Long)].collect().toMap

  test("fsck detects wreckage, drift, malformed partitions, and mixed depths; heal clears") {
    val root = Files.createTempDirectory("graft_whfsck_").toString
    val wh = new Warehouse(root, spark)
    val id = TableId("a", "b", "t1")
    wh.overwriteTouchedPartitions(id, Seq(
        (1L, java.sql.Date.valueOf("2026-01-01")),
        (2L, java.sql.Date.valueOf("2026-01-02")))
      .toDF("doc_id", "part_date"))
    assert(violations(wh.fsck(id)).forall(_._2 == 0L))
    val tbl = new org.apache.hadoop.fs.Path(wh.pathOf(id))
    val fs = tbl.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // swap wreckage: an empty journal + a stage dir (crash before any
    // rename) — reported, then healed away by recoverPendingSwap
    fs.create(new org.apache.hadoop.fs.Path(tbl, "_swap_pending"), true).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(tbl, "_stage"))
    val v1 = violations(wh.fsck(id))
    assert(v1("swap_wreckage") === 2L, v1.toString)
    wh.recoverPendingSwap(id)
    assert(violations(wh.fsck(id))("swap_wreckage") === 0L)

    // a foreign writer lands files with an EXTRA column: sidecar reads
    // would silently drop it — undeclared_column must fire
    Seq((9L, "sneaky")).toDF("doc_id", "not_declared")
      .write.mode("append")
      .parquet(s"${wh.pathOf(id)}/part_date=2026-01-01")
    val v2 = violations(wh.fsck(id))
    assert(v2("undeclared_column") === 1L, v2.toString)

    // malformed partition dir: date pruning would throw or skip it
    fs.mkdirs(new org.apache.hadoop.fs.Path(tbl, "part_date=notadate"))
    val v3 = violations(wh.fsck(id))
    assert(v3("malformed_partition") === 1L, v3.toString)
    fs.delete(new org.apache.hadoop.fs.Path(tbl, "part_date=notadate"), true)

    // mixed depths: a stray data file at the root of a partitioned
    // table, and a foreign directory
    Seq(Tuple1(1L)).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/__scratch")
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/__scratch"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(stray, new org.apache.hadoop.fs.Path(tbl, "stray.parquet"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(tbl, "foreign_dir"))
    val v4 = violations(wh.fsck(id))
    assert(v4("mixed_depth_entry") === 2L, v4.toString)
    fs.delete(new org.apache.hadoop.fs.Path(tbl, "stray.parquet"), false)
    fs.delete(new org.apache.hadoop.fs.Path(tbl, "foreign_dir"), true)

    // a foreign dir CONTAINING parquet at a different partition depth:
    // the r15 audit's whole-table mergeSchema read threw on layouts like
    // this, so fsck crashed instead of reporting the corruption it had
    // already detected — now the footers pass reads only the table's own
    // well-formed partition dirs and the audit completes with the
    // foreign dir flagged as mixed depth
    Seq((1L, "x", "y")).toDF("a", "b", "c")
      .write.mode("overwrite")
      .parquet(s"${wh.pathOf(id)}/foreign_tree/deeper=1")
    val v4b = violations(wh.fsck(id))
    assert(v4b("mixed_depth_entry") === 1L, v4b.toString)
    assert(v4b("undeclared_column") === 1L, v4b.toString) // still just the foreign file's
    fs.delete(new org.apache.hadoop.fs.Path(tbl, "foreign_tree"), true)

    // sidecar TAMPERED behind the LIVE instance (a foreign writer
    // rewrote it to declare a bogus column set): ordinary reads resolve
    // through the instance's schema cache, but the audit must re-read
    // the sidecar from disk — a stale-clean fsck that a cache can
    // satisfy is no integrity check (r15 verdict #3). No fresh
    // instance here, deliberately.
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("zz",
            org.apache.spark.sql.types.StringType))))
      .write.mode("overwrite").parquet(s"${wh.pathOf(id)}/_schema")
    val vT = violations(wh.fsck(id))
    // doc_id (and the foreign file's not_declared) are now undeclared
    assert(vT("undeclared_column") === 2L, vT.toString)

    // sidecar REPLACED with non-parquet garbage: the audit must report
    // it (unreadable = sidecar-missing grade — every sidecar-resolved
    // read is equally broken), never crash on it
    val sch = new org.apache.hadoop.fs.Path(tbl, "_schema")
    fs.delete(sch, true)
    fs.mkdirs(sch)
    val junk = fs.create(new org.apache.hadoop.fs.Path(sch, "junk.bin"), true)
    junk.write("not parquet at all".getBytes("UTF-8")); junk.close()
    val vU = violations(wh.fsck(id))
    assert(vU("schema_sidecar_missing") === 1L, vU.toString)

    // missing sidecar: still data-bearing, but schema is footers-only —
    // flagged by the SAME live instance (disk read, not the cache)
    fs.delete(new org.apache.hadoop.fs.Path(tbl, "_schema"), true)
    val v5 = violations(wh.fsck(id))
    assert(v5("schema_sidecar_missing") === 1L, v5.toString)

    // a view audits all-zero by design
    val vw = TableId("a", "b", "v1")
    wh.createView(vw, Seq(Tuple1(1L)).toDF("x"))
    assert(violations(wh.fsck(vw)).forall(_._2 == 0L))
  }

  test("fsck reports takedown-guard compact wreckage (guard holds via backup, repair owed)") {
    val root = Files.createTempDirectory("graft_whfsck_g_").toString
    val wh = new Warehouse(root, spark)
    val id = TableId("a", "b", "tg")
    wh.overwrite(id, Seq((1L, "x"), (2L, "y")).toDF("doc_id", "v"))
    // never-armed table: check present, zero
    assert(violations(wh.fsck(id))("takedown_guard_wreckage") === 0L)
    // armed guard, healthy
    graft.llm.Denylist.record(Seq(2L).toDF("id"), "id", wh.guardRoot(id))
    wh.armGuard(id, "doc_id")
    assert(violations(wh.fsck(id))("takedown_guard_wreckage") === 0L)
    // compact-crash wreckage: live list renamed away, backup present —
    // Denylist.readOpt still guards (from the backup), but fsck must
    // surface the repair debt
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(
      new org.apache.hadoop.fs.Path(s"${wh.guardRoot(id)}/_denylist"),
      new org.apache.hadoop.fs.Path(
        s"${wh.guardRoot(id)}/_denylist__compact_old"))
    assert(violations(wh.fsck(id))("takedown_guard_wreckage") === 1L)
    // record() heals; the debt clears
    graft.llm.Denylist.record(Seq(3L).toDF("id"), "id", wh.guardRoot(id))
    assert(violations(wh.fsck(id))("takedown_guard_wreckage") === 0L)
  }
}
