package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The bucketed (node, label) delta store must be indistinguishable
  * from [[ConnectedComponents.incremental]] over the same batches —
  * pruned reads and delta writes are an implementation detail of the
  * same labeling — and exactly-once under replay. */
class LabelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def readSorted(path: String): Seq[(Long, Long)] =
    LabelStore.read(spark, path).as[(Long, Long)].collect().sorted.toSeq

  private def ccOver(all: DataFrame): Seq[(Long, Long)] =
    ConnectedComponents.run(all, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted.toSeq

  test("seed + applyBatch over three batches equals one-shot CC over the union") {
    val path = Files.createTempDirectory("graft_ls_eq_").toString
    val seed = pairsDf(1L -> 2L, 3L -> 4L, 10L -> 11L)
    LabelStore.write(ConnectedComponents.run(seed, "id_a", "id_b"), path, nBuckets = 8)
    // b1: merge (1,2) with (3,4) via a bridge; b2: brand-new component;
    // b3: merge the new component into the (10,11) one
    val b1 = pairsDf(2L -> 3L)
    val b2 = pairsDf(20L -> 21L)
    val b3 = pairsDf(21L -> 10L)
    LabelStore.applyStreamBatch(spark, path, b1, "id_a", "id_b", 1L)
    LabelStore.applyStreamBatch(spark, path, b2, "id_a", "id_b", 2L)
    LabelStore.applyStreamBatch(spark, path, b3, "id_a", "id_b", 3L)
    assert(readSorted(path) ===
      ccOver(seed.unionByName(b1).unionByName(b2).unionByName(b3)))
    assert(readSorted(path) === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 10L, 21L -> 10L))
  }

  test("matches ConnectedComponents.incremental on real near-dup pairs") {
    import graft.llm.Dedup
    val docs = sf("sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") < 120)
    val fresh = docs.filter(col("doc_id") >= 120 && col("doc_id") < 200)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 120)
        .withColumn("doc_id", col("doc_id") + 200000L))
    val oldPairs = Dedup.minhashNearDupPairs(corpus, "text", "doc_id", 0.8)
    val labels = ConnectedComponents.run(oldPairs, "id_a", "id_b")
    val batchPairs = Dedup.minhashNearDupPairsIncremental(
      fresh, corpus, "text", "doc_id", 0.8)
    val expect = ConnectedComponents.incremental(labels, batchPairs, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted.toSeq
    val path = Files.createTempDirectory("graft_ls_nd_").toString
    LabelStore.write(labels, path, nBuckets = 8)
    LabelStore.applyStreamBatch(spark, path, batchPairs, "id_a", "id_b", 0L)
    assert(readSorted(path) === expect)
  }

  test("replayed batch rewrites its slot: store identical to one delivery") {
    val once = Files.createTempDirectory("graft_ls_rp1_").toString
    val twice = Files.createTempDirectory("graft_ls_rp2_").toString
    val seed = ConnectedComponents.run(pairsDf(1L -> 2L, 5L -> 6L), "id_a", "id_b")
    for (p <- Seq(once, twice)) LabelStore.write(seed, p, nBuckets = 8)
    val batch = pairsDf(2L -> 5L)
    LabelStore.applyStreamBatch(spark, once, batch, "id_a", "id_b", 0L)
    LabelStore.applyStreamBatch(spark, twice, batch, "id_a", "id_b", 0L)
    LabelStore.applyStreamBatch(spark, twice, batch, "id_a", "id_b", 0L)
    assert(readSorted(twice) === readSorted(once))
    def physicalRows(p: String) = spark.read.parquet(s"$p/byn").count()
    assert(physicalRows(twice) === physicalRows(once),
      "replay must not grow the store")
  }

  test("applyBatch returns only CHANGED rows; untouched components never rewritten") {
    val path = Files.createTempDirectory("graft_ls_delta_").toString
    LabelStore.write(
      ConnectedComponents.run(pairsDf(1L -> 2L, 100L -> 101L), "id_a", "id_b"),
      path, nBuckets = 8)
    val delta = LabelStore.applyStreamBatch(spark, path, pairsDf(2L -> 3L),
        "id_a", "id_b", 0L)
      .as[(Long, Long)].collect().sorted.toSeq
    // only node 3 is new; 1 and 2 already carry label 1, 100/101 untouched
    assert(delta === Seq(3L -> 1L))
  }

  test("compact folds slots, drops stale rows, serving unchanged") {
    val path = Files.createTempDirectory("graft_ls_cmp_").toString
    LabelStore.write(
      ConnectedComponents.run(pairsDf(5L -> 6L, 7L -> 8L), "id_a", "id_b"),
      path, nBuckets = 8)
    LabelStore.applyStreamBatch(spark, path, pairsDf(6L -> 7L), "id_a", "id_b", 0L)
    val before = readSorted(path)
    val preRows = spark.read.parquet(s"$path/byn").count()
    LabelStore.compact(spark, path)
    assert(readSorted(path) === before)
    val postRows = spark.read.parquet(s"$path/byn").count()
    assert(postRows < preRows, "stale superseded rows must be dropped")
    assert(postRows === before.size.toLong)
    // store still appendable after compact
    LabelStore.applyStreamBatch(spark, path, pairsDf(8L -> 50L), "id_a", "id_b", 1L)
    assert(readSorted(path) ===
      ccOver(pairsDf(5L -> 6L, 7L -> 8L, 6L -> 7L, 8L -> 50L)))
  }

  test("prunedRead scans ONLY the wanted buckets and skips the excluded run slot") {
    val path = Files.createTempDirectory("graft_ls_plan_").toString
    LabelStore.write(
      ConnectedComponents.run(pairsDf(1L -> 2L, 3L -> 4L, 9L -> 17L), "id_a", "id_b"),
      path, nBuckets = 8)
    LabelStore.applyStreamBatch(spark, path, pairsDf(2L -> 9L), "id_a", "id_b", 7L)
    // bucket 1 holds nodes 1, 9, 17; the read must touch no other
    // bucket's files and none of run=b7's
    val pruned = LabelStore.prunedRead(spark, s"$path/byn", "nb",
      Seq(1L), excludeRun = Some("b7"))
    val files = pruned.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/nb=1/")),
      s"read must touch only bucket 1, got:\n${files.mkString("\n")}")
    assert(files.forall(!_.contains("run=b7")),
      s"excluded slot leaked into the read:\n${files.mkString("\n")}")
    // and the unexcluded form DOES see the delta slot
    val withSlot = LabelStore.prunedRead(spark, s"$path/byn", "nb",
      Seq(1L, 2L), excludeRun = None)
    assert(withSlot.inputFiles.exists(_.contains("run=b7")))
  }

  test("dropNodes: split, vanish, and equality with a rebuild on surviving pairs") {
    val path = Files.createTempDirectory("graft_ls_drop_").toString
    // component A: chain 1-2-3-4-5 (label 1); B: pair 20-21; C: pair
    // 30-31 in a DIFFERENT bucket neighborhood (untouched by the drop)
    val all = pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      20L -> 21L, 30L -> 31L)
    LabelStore.write(ConnectedComponents.run(all, "id_a", "id_b"),
      path, nBuckets = 8)
    def bucketFiles(copy: String): Map[String, Set[String]] = {
      val root = new org.apache.hadoop.fs.Path(s"$path/$copy/run=__base__")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(d => d.getPath.getName -> fs.listStatus(d.getPath)
          .map(f => s"${f.getPath.getName}:${f.getLen}").toSet).toMap
    }
    val filesBefore = (bucketFiles("byn"), bucketFiles("byc"))
    // drop 3 (splits A into {1,2} and {4,5}) and 20 (leaves 21 with no
    // surviving pair — it must VANISH, like a rebuild that never saw it)
    val surviving = pairsDf(1L -> 2L, 4L -> 5L, 30L -> 31L)
    val (nAffected, buckets) = LabelStore.dropNodes(spark, path,
      Seq(3L, 20L).toDF("n"), "n", all, "id_a", "id_b")
    assert(nAffected === 2L, "components A and B are affected")
    assert(buckets > 0)
    assert(readSorted(path) === ccOver(surviving))
    assert(readSorted(path) === Seq(1L -> 1L, 2L -> 1L, 4L -> 4L,
      5L -> 4L, 30L -> 30L, 31L -> 30L))
    // C's buckets were never rewritten: nodes 30/31 hash to nb 6/7,
    // label 30 to cb 6 — none of the affected buckets
    val filesAfter = (bucketFiles("byn"), bucketFiles("byc"))
    assert(filesAfter._1("nb=6") === filesBefore._1("nb=6"))
    assert(filesAfter._1("nb=7") === filesBefore._1("nb=7"))
    assert(filesAfter._2("cb=6") === filesBefore._2("cb=6"))
    // idempotent: nothing left to drop
    assert(LabelStore.dropNodes(spark, path,
      Seq(3L, 20L).toDF("n"), "n", surviving, "id_a", "id_b") === ((0L, 0)))
    // the store stays a working delta store after the drop
    LabelStore.applyStreamBatch(spark, path, pairsDf(5L -> 31L), "id_a", "id_b",
      9L)
    assert(readSorted(path) ===
      ccOver(surviving.unionByName(pairsDf(5L -> 31L))))
  }

  test("dropNodes crash-remedy re-run does not duplicate new-label rows") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val path = Files.createTempDirectory("graft_ls_rerun_").toString
    // one chain component 1-2-3 (label 1); dropping 1 re-closes {2,3}
    // under NEW label 2, whose byc bucket (cb=2) did not exist before —
    // so the interrupted-run remedy has no backup for it
    LabelStore.write(ConnectedComponents.run(pairsDf(1L -> 2L, 2L -> 3L),
      "id_a", "id_b"), path, nBuckets = 8)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    // snapshot the pre-drop buckets (what the _drop_old_* backups hold)
    val snap = Files.createTempDirectory("graft_ls_snap_").toString
    Seq("byn", "byc").foreach { c =>
      FileUtil.copy(fs, new Path(s"$path/$c/run=__base__"),
        fs, new Path(s"$snap/$c"), false, conf)
    }
    val drop = Seq(1L).toDF("n")
    val pairs = pairsDf(1L -> 2L, 2L -> 3L)
    LabelStore.dropNodes(spark, path, drop, "n", pairs, "id_a", "id_b")
    // simulate the documented remedy state after a crash mid-install:
    // every PRE-EXISTING bucket restored from its backup, the NEW
    // cb= bucket (no backup possible) keeps the interrupted run's rows
    Seq("byn", "byc").foreach { c =>
      val snapRoot = new Path(s"$snap/$c")
      fs.listStatus(snapRoot).filter(_.isDirectory).foreach { b =>
        val live = new Path(s"$path/$c/run=__base__/${b.getPath.getName}")
        fs.delete(live, true)
        FileUtil.copy(fs, b.getPath, fs, live, false, conf)
      }
    }
    // re-run the drop (the remedy). Without the survivors-vs-newLabels
    // dedup the stale (2,2),(3,2) rows in the unbacked cb bucket would
    // stack under identical recomputed rows
    LabelStore.dropNodes(spark, path, drop, "n", pairs, "id_a", "id_b")
    assert(readSorted(path) === Seq(2L -> 2L, 3L -> 2L))
    val bycRows = spark.read.parquet(s"$path/byc")
      .select("node", "label").as[(Long, Long)].collect().toSeq
    assert(bycRows.sorted === Seq(2L -> 2L, 3L -> 2L),
      s"byc must hold each re-closed row exactly once, got $bycRows")
  }

  test("dropNodes refuses live slots and crash leftovers; remedy paths work") {
    val path = Files.createTempDirectory("graft_ls_dropref_").toString
    LabelStore.write(ConnectedComponents.run(pairsDf(1L -> 2L, 2L -> 3L),
      "id_a", "id_b"), path, nBuckets = 4)
    LabelStore.applyStreamBatch(spark, path, pairsDf(3L -> 4L), "id_a", "id_b",
      0L)
    // a live batch slot is a replay target — refuse with the remedy
    val e = intercept[IllegalArgumentException] {
      LabelStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n",
        pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b")
    }
    assert(e.getMessage.contains("Compact first"), e.getMessage)
    LabelStore.compact(spark, path)
    // crash leftover: a stale staging dir refuses loudly
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_tmp/cb=0"))
    val e2 = intercept[IllegalArgumentException] {
      LabelStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n",
        pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b")
    }
    assert(e2.getMessage.contains("_drop_tmp"), e2.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_tmp"), true)
    // remedy: cleanup then re-run completes; 2 erased, chain splits,
    // and the underscore staging never leaked into reads
    val (n, _) = LabelStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n",
      pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b")
    assert(n === 1L)
    assert(readSorted(path) === Seq(3L -> 3L, 4L -> 3L),
      "1 vanishes (no surviving pair), 3-4 re-closes under min 3")
  }

  test("dropNodes leftover remedy is phase-accurate ACROSS copies") {
    // the round-14 ADVICE corner: cleanup used to finish byn's tmp AND
    // backups before touching byc's, so a crash in that window left byc
    // with tmp+backups while byn looked pristine — and the per-dir
    // "restore byc" remedy reverted ONE copy only; the re-run then read
    // affected labels from the already-dropped byn, returned (0,0), and
    // left the dropped nodes live in byc forever. The check must judge
    // the phase across BOTH copies: a tmp with staged bucket children
    // means install-incomplete (restore both copies), childless tmps or
    // bare backups mean cleanup-phase (remove, never restore).
    val path = Files.createTempDirectory("graft_ls_remedy_").toString
    LabelStore.write(ConnectedComponents.run(
      pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b"),
      path, nBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def drop() = LabelStore.dropNodes(spark, path, Seq(2L).toDF("n"), "n",
      pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b")
    // cleanup-phase crash: byn fully cleaned, byc still holds a
    // CHILDLESS tmp and a backup — remedy must say remove, never restore
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_tmp"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_old_cb=1"))
    val e1 = intercept[IllegalArgumentException] { drop() }
    assert(e1.getMessage.contains("RE-RUN"), e1.getMessage)
    assert(e1.getMessage.contains("do NOT restore"), e1.getMessage)
    // install-phase crash: a tmp still holds a STAGED bucket child —
    // remedy must say restore the backups of BOTH copies
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_tmp/cb=0"))
    val e2 = intercept[IllegalArgumentException] { drop() }
    assert(e2.getMessage.contains("did not finish"), e2.getMessage)
    assert(e2.getMessage.contains("BOTH copies"), e2.getMessage)
    // remedy for the cleanup-phase state: remove leftovers, re-run
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_tmp"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/byc/_drop_old_cb=1"), true)
    val (n, _) = drop()
    assert(n === 1L)
    assert(readSorted(path) === Seq(3L -> 3L, 4L -> 3L),
      "1 vanishes (no surviving pair), 3-4 re-closes under min 3")
  }
}
