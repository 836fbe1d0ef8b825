package graft.llm

import graft.SparkSpec
import graft.operators.{BloomStore, EdgeStore, SampleStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized journal crash soak: the deterministic prefix matrix in
  * ForgetJournalSpec pins each crash point once on one store set; this
  * drives SEEDED random combinations — store subset, drop set, crash
  * step (including "no crash") — and requires, per iteration:
  *   1. a crashed takedown NEVER audits as `leak` (only `in_progress`
  *      / `clean`),
  *   2. resume completes it,
  *   3. the final state of every store equals a ONE-SHOT takedown on a
  *      pristine twin (the from-scratch oracle),
  *   4. a second resume is a pure no-op (all -2 rows).
  * The r16 store soaks found a real completion-claim bug on their
  * first run; this is the same discipline for the orchestration
  * layer. */
class ForgetJournalSoakSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) = ids.map(i =>
    (i, s"soak doc $i with enough words to chunk and shingle into " +
      s"content addressed pieces all of its own $i", s"p${i % 2}"))
    .toDF("doc_id", "text", "part")

  private case class Fix(stores: Forget.Stores,
                         withEdge: Boolean, withBloom: Boolean,
                         wh: graft.warehouse.Warehouse,
                         tbl: graft.core.TableId)

  private def build(base: String, withEdge: Boolean,
                    withBloom: Boolean): Fix = {
    val docs = mkDocs(1L to 12L)
    val chP = s"$base/ch"
    ChunkStore.write(docs, "text", "doc_id", chP, nBuckets = 4)
    val smP = s"$base/sm"
    SampleStore.write(docs, Seq.empty, "doc_id", "part", smP, kMax = 20)
    val wh = new graft.warehouse.Warehouse(s"$base/wh", spark)
    val tbl = graft.core.TableId("proj", "corpus", "docs")
    wh.overwritePartitioned(tbl, docs.withColumn("part_date",
      to_date(concat(lit("2024-01-0"),
        (col("doc_id") % 4 + 1).cast("string")))))
    val edP = if (withEdge) {
      val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("u", "v")
      EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v",
        Some("w"), s"$base/ed", nBuckets = 4)
      Some(s"$base/ed")
    } else None
    val blT = if (withBloom) {
      val p = s"$base/bl"
      BloomStore.write(docs, "doc_id", "part", p, depth = 3, width = 256)
      Some(Forget.SketchTarget(p, docs, "doc_id", "part",
        depth = 3, width = 512))
    } else None
    Fix(Forget.Stores(chunk = Some(chP), sample = Some(smP),
      edge = edP, bloom = blT,
      warehouse = Seq(Forget.WarehouseTarget(wh, tbl, "doc_id"))),
      withEdge, withBloom, wh, tbl)
  }

  /** Comparable end state of every store in the subset. */
  private def state(f: Fix): (Set[Long], Set[String], Set[(Long, Long)],
      Set[Long], Seq[(String, Boolean)]) = (
    ChunkStore.reconstruct(spark, f.stores.chunk.get)
      .select("doc_id").as[Long].collect().toSet,
    SampleStore.sample(spark, f.stores.sample.get, Seq.empty, k = 20)
      .select("key").as[String].collect().toSet,
    if (f.withEdge) EdgeStore.read(spark, f.stores.edge.get)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    else Set.empty,
    f.wh.read(f.tbl).select("doc_id").as[Long].collect().toSet,
    if (f.withBloom) BloomStore.mightContain(spark, f.stores.bloom.get.path,
        mkDocs(1L to 12L).select(col("doc_id").cast("string").as("k")), "k")
      .orderBy("key").as[(String, Boolean)].collect().toSeq
    else Seq.empty)

  test("seeded random crash points over random store subsets: triage, resume, oracle equality") {
    val rnd = new scala.util.Random(20260816L)
    for (it <- 1 to 6) {
      val withEdge = rnd.nextBoolean()
      val withBloom = rnd.nextBoolean()
      val drop = (1L to 12L).filter(_ => rnd.nextBoolean()) match {
        case s if s.isEmpty => Seq(4L)
        case s if s.size > 9 => s.take(9) // gc refuses a full wipe
        case s => s
      }
      // steps: denylist, warehouse, chunk, [edge], sample, [bloom]
      val nSteps = 4 + (if (withEdge) 1 else 0) + (if (withBloom) 1 else 0)
      val k = rnd.nextInt(nSteps + 2) // nSteps/nSteps+1 => completes

      val oracleFix = build(
        Files.createTempDirectory(s"graft_fjs_o${it}_").toString,
        withEdge, withBloom)
      Forget.forgetDocs(spark, drop.toDF("doc_id"), "doc_id",
        oracleFix.stores, denylist = true)
      val expected = state(oracleFix)

      val fix = build(
        Files.createTempDirectory(s"graft_fjs_s${it}_").toString,
        withEdge, withBloom)
      val j = Forget.Journal(
        Files.createTempDirectory(s"graft_fjs_j${it}_").toString,
        opId = s"soak-$it")
      Forget.stepFailpoint.set(k)
      val crashed =
        try { Forget.forgetDocs(spark, drop.toDF("doc_id"), "doc_id",
          fix.stores, denylist = true, journal = Some(j)); false }
        catch { case _: IllegalArgumentException => true }
        finally Forget.stepFailpoint.set(-1)
      assert(crashed === (k < nSteps),
        s"it=$it k=$k nSteps=$nSteps edge=$withEdge bloom=$withBloom")

      if (crashed) {
        val mid = Forget.auditStatus(spark, j, fix.stores)
          .as[(String, Long, Long, String)].collect()
        assert(!mid.exists(_._4 == "leak"),
          s"it=$it k=$k: crashed takedown read as leak: ${mid.toSeq}")
        // before the faithful resume, one randomized WRONG declaration
        // must refuse (the r18 store-set/identity contract) — and must
        // leave the journal resumable: dropping a declared store,
        // adding a phantom one, or moving a store's path
        val wrong = rnd.nextInt(3) match {
          case 0 => fix.stores.copy(chunk = None)
          case 1 => fix.stores.copy(topk = Some("/tmp/phantom_topk"))
          case _ => fix.stores.copy(sample = Some("/tmp/elsewhere_sm"))
        }
        val msg = intercept[IllegalArgumentException] {
          Forget.resume(spark, j, wrong)
        }.getMessage
        assert(msg.contains("store set") || msg.contains("IDENTITIES"),
          s"it=$it: wrong-declaration refusal had the wrong shape: $msg")
        Forget.resume(spark, j, fix.stores)
      }
      assert(state(fix) === expected,
        s"it=$it k=$k edge=$withEdge bloom=$withBloom")
      val again = Forget.resume(spark, j, fix.stores)
      assert(again.results.forall(_.removed == -2L), s"it=$it: $again")
    }
  }

  test("overlapped crash matrix: NAME-keyed failpoints stay deterministic under overlapStores > 1") {
    val rnd = new scala.util.Random(20260819L)
    for (it <- 1 to 3) {
      val withEdge = rnd.nextBoolean()
      val drop = Seq(2L, 5L, 9L)
      val oracleFix = build(
        Files.createTempDirectory(s"graft_fjso_o${it}_").toString,
        withEdge, withBloom = false)
      // chunkCompact = true: the completed chunk step must leave no
      // manifest purge debt, or a mid-crash auditStatus would read the
      // (legitimate, compact-pending) chunk_manifest residue as a leak
      Forget.forgetDocs(spark, drop.toDF("doc_id"), "doc_id",
        oracleFix.stores, chunkCompact = true, denylist = true,
        overlapStores = 2)
      val expected = state(oracleFix)

      val fix = build(
        Files.createTempDirectory(s"graft_fjso_s${it}_").toString,
        withEdge, withBloom = false)
      val j = Forget.Journal(
        Files.createTempDirectory(s"graft_fjso_j${it}_").toString,
        opId = s"soak-ov-$it")
      // crash BEFORE a randomly named step — under overlap the
      // completion-index failpoint is racy; the named one is the
      // documented deterministic form (r18 verdict "What's wrong #3")
      val names = Forget.stepNames(fix.stores, denylist = true)
      val crashStep = names(rnd.nextInt(names.size))
      Forget.stepFailpointStep.set(crashStep)
      val crashed =
        try { Forget.forgetDocs(spark, drop.toDF("doc_id"), "doc_id",
          fix.stores, chunkCompact = true, denylist = true,
          journal = Some(j), overlapStores = 2); false }
        catch { case _: IllegalArgumentException => true }
        finally Forget.stepFailpointStep.set(null)
      assert(crashed, s"it=$it: named failpoint $crashStep must crash")
      // deterministic injection: the NAMED step must have no done marker
      val fs = new org.apache.hadoop.fs.Path(j.dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"${j.dir}/${j.markName(crashStep)}")),
        s"it=$it: step $crashStep ran despite the named failpoint")
      val mid = Forget.auditStatus(spark, j, fix.stores)
        .as[(String, Long, Long, String)].collect()
      assert(!mid.exists(_._4 == "leak"),
        s"it=$it crash=$crashStep: crashed takedown read as leak: ${mid.toSeq}")
      Forget.resume(spark, j, fix.stores, overlapStores = 2)
      assert(state(fix) === expected, s"it=$it crash=$crashStep edge=$withEdge")
      val again = Forget.resume(spark, j, fix.stores, overlapStores = 2)
      assert(again.results.forall(_.removed == -2L), s"it=$it: $again")
    }
  }
}
