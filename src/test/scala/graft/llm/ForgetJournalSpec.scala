package graft.llm

import graft.SparkSpec
import graft.operators.{EdgeStore, SampleStore, TopKStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Journal + resume for the multi-store takedown (r16 verdict "What's
  * missing #2"): a crash mid-`forgetDocs` used to leave no persisted
  * record of which stores completed — the only remedy was
  * audit-everything-then-rerun-everything, and the audit could not
  * tell a crashed takedown from a compliance breach. These specs
  * crash the sequence after every possible prefix (failpoint), check
  * `auditStatus` reads the incomplete stores as `in_progress` (never
  * `leak`), resume, and require the final state to equal a one-shot
  * takedown on a pristine twin — the from-scratch oracle. */
class ForgetJournalSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) = ids.map(i =>
    (i, s"journal spec document $i with words enough to chunk and very " +
      s"much shingle into content addressed pieces $i", s"p${i % 2}"))
    .toDF("doc_id", "text", "part")

  /** Build the three-store fixture under `base`; returns the Stores. */
  private def buildStores(base: String): Forget.Stores = {
    val docs = mkDocs(1L to 12L)
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("u", "v")
    val (chP, edP, smP) = (s"$base/ch", s"$base/ed", s"$base/sm")
    ChunkStore.write(docs, "text", "doc_id", chP, nBuckets = 4)
    EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v", Some("w"),
      edP, nBuckets = 4)
    SampleStore.write(docs, Seq.empty, "doc_id", "part", smP, kMax = 20)
    Forget.Stores(chunk = Some(chP), edge = Some(edP), sample = Some(smP))
  }

  private def state(s: Forget.Stores): (Set[Long], Set[(Long, Long)], Set[String]) = (
    ChunkStore.reconstruct(spark, s.chunk.get)
      .select("doc_id").as[Long].collect().toSet,
    EdgeStore.read(spark, s.edge.get).select("src", "dst")
      .as[(Long, Long)].collect().toSet,
    SampleStore.sample(spark, s.sample.get, Seq.empty, k = 20)
      .select("key").as[String].collect().toSet)

  test("crash after every prefix: auditStatus says in_progress, resume equals one-shot") {
    val drop = Seq(3L, 7L).toDF("doc_id")
    // the from-scratch oracle: one-shot takedown on a pristine twin
    val oracleStores = buildStores(
      Files.createTempDirectory("graft_fj_oracle_").toString)
    Forget.forgetDocs(spark, drop, "doc_id", oracleStores,
      chunkCompact = true, denylist = true)
    val expected = state(oracleStores)

    // steps: denylist, chunk, edge, sample = 4 — crash before each
    for (k <- 0 to 3) {
      val base = Files.createTempDirectory(s"graft_fj_k${k}_").toString
      val stores = buildStores(base)
      val j = Forget.Journal(s"$base/journal", opId = s"op$k")
      Forget.stepFailpoint.set(k)
      try intercept[IllegalArgumentException] {
        Forget.forgetDocs(spark, drop, "doc_id", stores,
          chunkCompact = true, denylist = true, journal = Some(j))
      } finally Forget.stepFailpoint.set(-1)

      // the journal knows the difference between residue and breach:
      // incomplete stores read in_progress, completed ones clean/leak
      val status = Forget.auditStatus(spark, j, stores)
        .as[(String, Long, Long, String)].collect()
        .map(r => r._1 -> r._4).toMap
      assert(!status.values.exists(_ == "leak"),
        s"k=$k: a crashed takedown must never read as a leak: $status")
      if (k <= 1) assert(status("chunk") === "in_progress", s"k=$k")
      if (k <= 2) assert(status("edge") === "in_progress", s"k=$k")
      assert(status("sample") === "in_progress", s"k=$k")

      // resume runs ONLY the missing steps, under the JOURNALED flags
      // (chunkCompact/denylist come from the flags marker, not the call)
      val report = Forget.resume(spark, j, stores)
      val skipped = report.results.filter(_.removed == -2L).map(_.store)
      assert(skipped.size === k, s"k=$k skipped=$skipped")

      // ...and the final state equals the one-shot oracle
      assert(state(stores) === expected, s"k=$k")
      val after = Forget.auditStatus(spark, j, stores)
      assert(after.filter(col("status") =!= "clean").isEmpty, s"k=$k")
      // a second resume is a clean no-op: everything skipped
      val again = Forget.resume(spark, j, stores)
      assert(again.results.forall(_.removed == -2L), s"k=$k")
    }
  }

  test("journaled flags: a re-invocation with flipped flags refuses; resume uses the persisted ones") {
    val base = Files.createTempDirectory("graft_fj_flags_").toString
    val stores = buildStores(base)
    val j = Forget.Journal(s"$base/journal", opId = "op-flags")
    Forget.stepFailpoint.set(1)
    try intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(5L).toDF("doc_id"), "doc_id", stores,
        chunkCompact = true, denylist = true, journal = Some(j))
    } finally Forget.stepFailpoint.set(-1)
    // a direct re-invocation with DIFFERENT flags would complete a
    // different takedown than the one that crashed — refused loudly
    val e = intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(5L).toDF("doc_id"), "doc_id", stores,
        chunkCompact = false, denylist = false, journal = Some(j))
    }
    assert(e.getMessage.contains("different chunkCompact/denylist flags"))
    // resume needs no flags at all: it reads the journal's marker —
    // the denylist step must run (denylist=true was journaled)
    Forget.resume(spark, j, stores)
    assert(Denylist.readOpt(spark, stores.chunk.get).isDefined,
      "resume must honour the journaled denylist=true flag")
    // chunkCompact=true journaled: manifest purge-debt must read zero
    val status = Forget.auditStatus(spark, j, stores)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(status.values.forall(_ == "clean"), status.toString)
  }

  test("warehouse step in the crash matrix: marker sanitization agrees between step and auditStatus") {
    // "warehouse:<table>" step names carry a ':' that is sanitized in
    // the done_* marker file name — forgetDocs' step machinery and
    // auditStatus' stepDone must sanitize IDENTICALLY or a completed
    // warehouse step would audit as in_progress forever
    val base = Files.createTempDirectory("graft_fj_wh_").toString
    val wh = new graft.warehouse.Warehouse(s"$base/wh", spark)
    val tbl = graft.core.TableId("proj", "corpus", "docs")
    wh.overwritePartitioned(tbl, mkDocs(1L to 12L)
      .withColumn("part_date",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.concat(lit("2024-01-0"),
            (col("doc_id") % 4 + 1).cast("string")))))
    val stores = Forget.Stores(
      warehouse = Seq(Forget.WarehouseTarget(wh, tbl, "doc_id")),
      sample = {
        val smP = s"$base/sm"
        graft.operators.SampleStore.write(mkDocs(1L to 12L), Seq.empty,
          "doc_id", "part", smP, kMax = 20)
        Some(smP)
      })
    val j = Forget.Journal(s"$base/journal", opId = "op-wh")
    // steps: denylist(0), warehouse:docs(1), sample(2) — crash before
    // sample, AFTER the warehouse step completed
    Forget.stepFailpoint.set(2)
    try intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(3L, 7L).toDF("doc_id"), "doc_id",
        stores, denylist = true, journal = Some(j))
    } finally Forget.stepFailpoint.set(-1)
    val mid = Forget.auditStatus(spark, j, stores)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    // the completed warehouse step must read CLEAN (its rows are gone
    // and its marker must be found through the same sanitization)
    assert(mid("warehouse:proj.corpus.docs") === "clean", mid.toString)
    assert(mid("sample") === "in_progress", mid.toString)
    val report = Forget.resume(spark, j, stores)
    assert(report.results.filter(_.removed == -2L).map(_.store).toSet
      === Set("denylist", "warehouse:proj.corpus.docs"))
    assert(Forget.auditStatus(spark, j, stores)
      .filter(col("status") =!= "clean").isEmpty)
  }

  test("listJournals: crashed takedowns are discoverable; resumed ones read complete") {
    val base = Files.createTempDirectory("graft_fj_ls_").toString
    val stores = buildStores(base)
    val jRoot = s"$base/journal"
    val j1 = Forget.Journal(jRoot, opId = "ticket-1")
    Forget.forgetDocs(spark, Seq(2L).toDF("doc_id"), "doc_id", stores,
      journal = Some(j1))
    val j2 = Forget.Journal(jRoot, opId = "ticket-2")
    Forget.stepFailpoint.set(1)
    try intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(4L).toDF("doc_id"), "doc_id", stores,
        journal = Some(j2))
    } finally Forget.stepFailpoint.set(-1)
    val ls = Forget.listJournals(spark, jRoot)
      .as[(String, Boolean, Int, Int, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(ls("ticket-1")._6 === true)
    assert(ls("ticket-2")._6 === false, "the crashed takedown is the worklist")
    assert(ls("ticket-2")._2 === true && ls("ticket-2")._3 === 1)
    // steps_done of steps_total is the triage headline: 1 of the 3
    // journaled steps done on the crashed takedown
    assert(ls("ticket-2")._4 === 3 && ls("ticket-1")._4 === 3)
    Forget.resume(spark, j2, stores)
    assert(Forget.listJournals(spark, jRoot)
      .filter(col("complete") === false).isEmpty)
  }

  test("a completed journal with a re-landed id reads LEAK, not in_progress") {
    val base = Files.createTempDirectory("graft_fj_leak_").toString
    val stores = buildStores(base)
    val j = Forget.Journal(s"$base/journal", opId = "op-leak")
    // denylist = false on purpose: the re-append below must land
    Forget.forgetDocs(spark, Seq(5L).toDF("doc_id"), "doc_id", stores,
      chunkCompact = true, journal = Some(j))
    ChunkStore.append(mkDocs(Seq(5L)), "text", "doc_id", stores.chunk.get,
      nBuckets = 4, runId = Some("recrawl"))
    val status = Forget.auditStatus(spark, j, stores)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(status("chunk") === "leak", status.toString)
    assert(status("edge") === "clean" && status("sample") === "clean")
  }

  test("journaled store set: a resume or audit with a DIFFERENT set refuses in both directions") {
    val base = Files.createTempDirectory("graft_fj_set_").toString
    val stores = buildStores(base)
    val j = Forget.Journal(s"$base/journal", opId = "op-set")
    Forget.stepFailpoint.set(1) // chunk done; edge + sample not
    try intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(3L).toDF("doc_id"), "doc_id", stores,
        chunkCompact = true, journal = Some(j))
    } finally Forget.stepFailpoint.set(-1)
    // subset: running it would write _complete with sample never erased
    val subset = stores.copy(sample = None)
    assert(intercept[IllegalArgumentException] {
      Forget.resume(spark, j, subset)
    }.getMessage.contains("store set"))
    // SUPERSET refuses too: the extra store's step was never part of
    // this takedown — completing it under this opId would forge history
    val superset = stores.copy(topk = Some(s"$base/phantom_topk"))
    assert(intercept[IllegalArgumentException] {
      Forget.resume(spark, j, superset)
    }.getMessage.contains("store set"))
    // auditStatus validates the same way (a subset audit reads clean
    // while the missing store leaks)
    assert(intercept[IllegalArgumentException] {
      Forget.auditStatus(spark, j, subset)
    }.getMessage.contains("store set"))
    // same step NAMES over a DIFFERENT path refuse too: the journal
    // pins step identities, not just names — a path typo would erase
    // the wrong store while marking the right one's step done
    val wrongPath = stores.copy(sample = Some(s"$base/elsewhere_sm"))
    assert(intercept[IllegalArgumentException] {
      Forget.resume(spark, j, wrongPath)
    }.getMessage.contains("IDENTITIES"))
    assert(intercept[IllegalArgumentException] {
      Forget.auditStatus(spark, j, wrongPath)
    }.getMessage.contains("IDENTITIES"))
    // the faithful declaration resumes and completes
    Forget.resume(spark, j, stores)
    assert(Forget.auditStatus(spark, j, stores)
      .filter(col("status") =!= "clean").isEmpty)
  }

  test("warehouse steps key on the FULL 3-part name: same identifier across datasets gets two markers") {
    val base = Files.createTempDirectory("graft_fj_fqn_").toString
    val wh = new graft.warehouse.Warehouse(s"$base/wh", spark)
    // the r17 ADVICE collision: proj.a.docs and proj.b.docs shared the
    // done_warehouse_docs marker, so the second table's erasure was
    // silently SKIPPED (-2) in an uncrashed journaled run
    val tA = graft.core.TableId("proj", "a", "docs")
    val tB = graft.core.TableId("proj", "b", "docs")
    Seq(tA, tB).foreach(t => wh.overwritePartitioned(t, mkDocs(1L to 8L)
      .withColumn("part_date", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.concat(lit("2024-01-0"),
          (col("doc_id") % 3 + 1).cast("string"))))))
    val stores = Forget.Stores(warehouse = Seq(
      Forget.WarehouseTarget(wh, tA, "doc_id"),
      Forget.WarehouseTarget(wh, tB, "doc_id")))
    val j = Forget.Journal(s"$base/journal", opId = "op-fqn")
    val report = Forget.forgetDocs(spark, Seq(3L, 6L).toDF("doc_id"),
      "doc_id", stores, journal = Some(j))
    // BOTH steps ran (neither reported -2 "already completed")
    assert(report.removed("warehouse:proj.a.docs") === Some(2L))
    assert(report.removed("warehouse:proj.b.docs") === Some(2L))
    // and both are physically erased
    Seq(tA, tB).foreach { t =>
      assert(wh.read(t).filter(col("doc_id").isin(3L, 6L)).isEmpty,
        s"${t.fqn} still carries dropped ids")
    }
    // the audit keys the same way: two distinct rows
    val audit = Forget.audit(spark, Seq(3L, 6L).toDF("doc_id"), "doc_id",
      stores).as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(audit.keySet === Set("warehouse:proj.a.docs", "warehouse:proj.b.docs"))
    assert(audit.values.forall(_._3 == 0L), audit.toString)
  }

  test("maintenance folds declared denylists and retires completed journals; crashed ones stay resumable") {
    val base = Files.createTempDirectory("graft_fj_mnt_").toString
    val stores = buildStores(base)
    val jRoot = s"$base/journal"
    Forget.forgetDocs(spark, Seq(3L).toDF("doc_id"), "doc_id", stores,
      chunkCompact = true, denylist = true,
      journal = Some(Forget.Journal(jRoot, "op-a")))
    Forget.forgetDocs(spark, Seq(7L).toDF("doc_id"), "doc_id", stores,
      chunkCompact = true, denylist = true,
      journal = Some(Forget.Journal(jRoot, "op-b")))
    val jc = Forget.Journal(jRoot, "op-c")
    Forget.stepFailpoint.set(1)
    try intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(9L).toDF("doc_id"), "doc_id", stores,
        chunkCompact = true, denylist = true, journal = Some(jc))
    } finally Forget.stepFailpoint.set(-1)

    val (folded, retired) = Forget.maintenance(spark, jRoot, stores,
      keepCompleted = 0)
    // all three declared roots carried lists (both takedowns + the
    // crashed one's denylist step, which ran first)
    assert(folded === stores.keyedRoots)
    assert(retired === Seq("op-a", "op-b"))
    // nothing un-erased: all three drop sets still guard after the fold
    val re = mkDocs(Seq(3L, 7L, 9L, 10L))
    assert(Denylist.exclude(re, "doc_id", spark, stores.chunk.get)
      .select("doc_id").as[Long].collect().toSeq === Seq(10L))
    // the crashed journal survived the gc and still resumes
    Forget.resume(spark, jc, stores)
    assert(Forget.auditStatus(spark, jc, stores)
      .filter(col("status") =!= "clean").isEmpty)
  }

  test("gcJournals retires only completed journals beyond keepCompleted, newest kept") {
    val base = Files.createTempDirectory("graft_fj_gc_").toString
    val stores = buildStores(base)
    val jRoot = s"$base/journal"
    Seq("op-old", "op-mid", "op-new").foreach { op =>
      Forget.forgetDocs(spark, Seq(2L).toDF("doc_id"), "doc_id", stores,
        journal = Some(Forget.Journal(jRoot, op)))
    }
    // one crashed journal — never GC'd at any keepCompleted
    val jc = Forget.Journal(jRoot, "op-crash")
    Forget.stepFailpoint.set(0)
    try intercept[IllegalArgumentException] {
      Forget.forgetDocs(spark, Seq(4L).toDF("doc_id"), "doc_id", stores,
        journal = Some(jc))
    } finally Forget.stepFailpoint.set(-1)
    // pin distinct completion times (same-ms completions are real on a
    // fast box; gc orders by the _complete marker's mtime)
    val fs = new org.apache.hadoop.fs.Path(jRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("op-old", 1000L), ("op-mid", 2000L), ("op-new", 3000L)).foreach {
      case (op, t) => fs.setTimes(
        new org.apache.hadoop.fs.Path(s"$jRoot/_forget/$op/_complete"), t, -1)
    }
    val retired = Forget.gcJournals(spark, jRoot, keepCompleted = 1)
    assert(retired === Seq("op-mid", "op-old"), retired.toString)
    val left = Forget.listJournals(spark, jRoot)
      .select("op_id").as[String].collect().toSet
    assert(left === Set("op-new", "op-crash"))
    // idempotent; the crashed journal still resumes afterwards
    assert(Forget.gcJournals(spark, jRoot, keepCompleted = 1) === Seq.empty)
    Forget.resume(spark, jc, stores)
    assert(Forget.listJournals(spark, jRoot)
      .filter(col("complete") === false).isEmpty)
  }
}
