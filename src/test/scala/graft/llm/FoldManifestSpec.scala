package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Replay-safe compaction (r11 verdict "What's missing #1"): a compact
  * folds every `run=` slot into `__base__` AND records the folded ids
  * in the store's `_folded_runs.json` manifest, so a replayed
  * pre-compact batch id becomes a NO-OP in RunSlots.write/writeFlat
  * instead of re-landing rows the base already holds. This is what
  * lets the streaming maintenance loops compact mid-stream (between
  * micro-batches) instead of only offline. */
class FoldManifestSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
  private def corpus =
    Seq((1L, base + "one"), (2L, "totally different words entirely here"))
      .toDF("doc_id", "text")
  private def batch = Seq((10L, base + "one")).toDF("doc_id", "text")

  private def fileSet(dir: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val b = Set.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      b += s"${f.getPath.toString.stripPrefix(dir)}:${f.getLen}"
    }
    b.result()
  }

  test("compact records folded run ids; replayed slot write is a no-op") {
    val p = Files.createTempDirectory("graft_fm_mh_").toString
    MinHashIndex.write(corpus, "text", "doc_id", p, nBuckets = 4)
    MinHashIndex.appendBatch(batch, "text", "doc_id", p, shingleN = 3,
      nBuckets = 4, batchId = 0L)
    assert(RunSlots.slotCount(spark, s"$p/bands") === 1)
    MinHashIndex.compact(spark, p)
    assert(RunSlots.slotCount(spark, s"$p/bands") === 0)
    assert(RunSlots.foldedRuns(spark, s"$p/bands").contains("b0"))
    assert(RunSlots.foldedRuns(spark, s"$p/sets").contains("b0"))
    val before = (fileSet(s"$p/bands"), fileSet(s"$p/sets"))
    // the foreachBatch replay-after-fold corner: same batch, same id
    MinHashIndex.appendBatch(batch, "text", "doc_id", p, shingleN = 3,
      nBuckets = 4, batchId = 0L)
    assert((fileSet(s"$p/bands"), fileSet(s"$p/sets")) === before,
      "a folded run id must not re-land rows (store byte-identical)")
    // a NEW id still appends normally
    MinHashIndex.appendBatch(
      Seq((11L, base + "two")).toDF("doc_id", "text"),
      "text", "doc_id", p, shingleN = 3, nBuckets = 4, batchId = 1L)
    assert(RunSlots.slotCount(spark, s"$p/bands") === 1)
  }

  test("manifest merges across compacts (earlier folds stay recorded)") {
    val p = Files.createTempDirectory("graft_fm_merge_").toString
    MinHashIndex.write(corpus, "text", "doc_id", p, nBuckets = 4)
    MinHashIndex.appendBatch(batch, "text", "doc_id", p, shingleN = 3,
      nBuckets = 4, batchId = 0L)
    MinHashIndex.compact(spark, p)
    MinHashIndex.appendBatch(
      Seq((11L, base + "two")).toDF("doc_id", "text"),
      "text", "doc_id", p, shingleN = 3, nBuckets = 4, batchId = 1L)
    MinHashIndex.compact(spark, p)
    assert(RunSlots.foldedRuns(spark, s"$p/bands") === RunSlots.FoldManifest(1L, Set.empty))
    assert(RunSlots.foldedRuns(spark, s"$p/sets") === RunSlots.FoldManifest(1L, Set.empty))
  }

  // ---- bounded manifest (r12 verdict "What's missing #1") --------------
  // The manifest must stay O(1)-ish over any streaming horizon: numeric
  // b<id> batch ids collapse under a contiguously-advanced high-water
  // mark; only named runs and out-of-order ids occupy the exception set.

  test("manifest stays O(1) over a 150-batch fold horizon") {
    import RunSlots.FoldManifest
    var m = FoldManifest.empty
    (0 until 150).foreach(i => m = m.fold(Set(s"b$i")))
    assert(m === FoldManifest(149L, Set.empty),
      "contiguous batch ids must collapse to the high-water mark alone")
    assert(m.contains("b0") && m.contains("b149") && !m.contains("b150"))

    // and the SERIALIZED form stays tiny at any horizon
    val p = Files.createTempDirectory("graft_fm_o1_").toString
    RunSlots.writeFoldedManifest(spark, p, m)
    val f = new org.apache.hadoop.fs.Path(s"$p/${RunSlots.ManifestFile}")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getFileStatus(f).getLen < 100L,
      "manifest bytes must not grow with folded-batch count")
    val back = RunSlots.foldedRuns(spark, p)
    assert(back.contains("b0") && back.contains("b149") &&
      !back.contains("b150"))
  }

  test("out-of-order and named ids: exceptions drain as gaps close") {
    import RunSlots.FoldManifest
    // a gap stalls the mark — a stray high id can never retroactively
    // mark unfolded lower ids as folded
    val gap = FoldManifest.empty.fold(Set("b0", "b2"))
    assert(gap === FoldManifest(0L, Set("b2")))
    assert(gap.contains("b2") && !gap.contains("b1"))
    // folding the missing id drains the exception into the mark
    assert(gap.fold(Set("b1")) === FoldManifest(2L, Set.empty))
    // named runs never collapse
    val named = FoldManifest.empty.fold(Set("daily-2026-08-14"))
    assert(named === FoldManifest(-1L, Set("daily-2026-08-14")))
    assert(named.contains("daily-2026-08-14") && !named.contains("b0"))
    // a store attached mid-stream seeds the mark just below its first
    // folded id (ids below it predate the store — nothing to replay)
    assert(FoldManifest.empty.fold(Set("b5", "b6")) ===
      FoldManifest(6L, Set.empty))
  }

  test("a digit string beyond Long.MaxValue is a NAMED id, not a crash") {
    import RunSlots.FoldManifest
    val huge = "b9999999999999999999" // 19 nines > Long.MaxValue
    val m = FoldManifest.empty.fold(Set(huge, "b0"))
    assert(m === FoldManifest(0L, Set(huge)),
      "overflowing numeric-looking ids must stay verbatim exceptions")
    assert(m.contains(huge) && !m.contains("b1"))
  }

  test("named exceptions: prune bounds the manifest; pruned id re-lands as a live slot") {
    import RunSlots.FoldManifest
    // 100 named backfill folds: the exception set holds all of them —
    // the r13 unbounded-growth class
    var m = FoldManifest.empty.fold(Set("b0"))
    val named = (0 until 100).map(i => f"backfill-$i%03d").toSet
    m = m.fold(named)
    assert(m.exceptions.size === 100)
    val p = Files.createTempDirectory("graft_fm_prune_").toString
    RunSlots.writeFoldedManifest(spark, p, m)
    // numeric ids are refused — the stream can replay them
    val e = intercept[IllegalArgumentException] {
      RunSlots.pruneFoldedNamed(spark, p, Set("b0"))
    }
    assert(e.getMessage.contains("stream-batch"))
    // retention prune: manifest back to two numbers; idempotent
    assert(RunSlots.pruneFoldedNamed(spark, p, named) === 100)
    assert(RunSlots.pruneFoldedNamed(spark, p, named) === 0)
    val back = RunSlots.foldedRuns(spark, p)
    assert(back === FoldManifest(0L, Set.empty))
    val f = new org.apache.hadoop.fs.Path(s"$p/${RunSlots.ManifestFile}")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getFileStatus(f).getLen < 100L, "manifest bounded after prune")
    // a pruned id's re-delivery lands as a fresh LIVE slot (correct at
    // slot level — the documented hazard), and a later fold re-records it
    RunSlots.write(Seq((1L, 0L)).toDF("v", "pc"), p, "pc",
      Some("backfill-000"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p/run=backfill-000")))
    RunSlots.writeFoldedManifest(spark, p, back.fold(Set("backfill-000")))
    RunSlots.write(Seq((9L, 9L)).toDF("v", "pc"), p, "pc",
      Some("backfill-000"))
    assert(spark.read.parquet(s"$p/run=backfill-000")
      .select("v").as[Long].collect().toSet === Set(1L),
      "re-recorded id no-ops again")
  }

  test("manifest write refuses past the named-exception cap") {
    import RunSlots.FoldManifest
    val p = Files.createTempDirectory("graft_fm_cap_").toString
    val over = (0 to RunSlots.MaxNamedExceptions).map(i => s"bk-$i").toSet
    val e = intercept[IllegalArgumentException] {
      RunSlots.writeFoldedManifest(spark, p, FoldManifest(-1L, over))
    }
    assert(e.getMessage.contains("pruneFoldedNamed"))
  }

  test("r12 flat-list manifests parse and migrate on the next write") {
    val p = Files.createTempDirectory("graft_fm_legacyfmt_").toString
    val f = new org.apache.hadoop.fs.Path(s"$p/${RunSlots.ManifestFile}")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(f, true)
    out.write("""{"folded":["b0","b1","weekly_x"]}""".getBytes("UTF-8"))
    out.close()
    val m = RunSlots.foldedRuns(spark, p)
    assert(m.contains("b0") && m.contains("b1") && m.contains("weekly_x"))
    assert(!m.contains("b2"))
    // an old-format recorded id still no-ops a slot write
    RunSlots.write(Seq((1L, 0L)).toDF("v", "pc"), p, "pc", Some("b0"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/run=b0")),
      "flat-list manifest id must still no-op the replay")
    // the next manifest write normalizes to the bounded form
    RunSlots.writeFoldedManifest(spark, p, m.fold(Set("b2")))
    val back = RunSlots.foldedRuns(spark, p)
    assert(back === RunSlots.FoldManifest(2L, Set("weekly_x")))
  }

  test("EdgeStore: replayed folded batch cannot double-count weights") {
    import graft.operators.EdgeStore
    val p = Files.createTempDirectory("graft_fm_edge_").toString
    EdgeStore.write(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4)
    val b0 = Seq((1L, 2L, 5L), (2L, 3L, 2L)).toDF("src", "dst", "w")
    EdgeStore.appendBatch(b0, "src", "dst", Some("w"), p, nBuckets = 4,
      batchId = 0L)
    def weights(): Map[(Long, Long), Long] =
      EdgeStore.read(spark, p).as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val expected = Map((1L, 2L) -> 6L, (2L, 3L) -> 2L)
    assert(weights() === expected)
    EdgeStore.compact(spark, p)
    assert(weights() === expected, "compact must not change weights")
    // the additive-store disaster the manifest prevents: a replay of a
    // folded crawl batch re-landing its edge aggregates would silently
    // bias every downstream PageRank
    EdgeStore.appendBatch(b0, "src", "dst", Some("w"), p, nBuckets = 4,
      batchId = 0L)
    assert(weights() === expected,
      "replayed folded batch must be a no-op, not a double count")
  }

  test("LabelStore: applyBatch replay after compact leaves the store untouched") {
    import graft.operators.{ConnectedComponents, LabelStore}
    val p = Files.createTempDirectory("graft_fm_ls_").toString
    val seedPairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    LabelStore.write(ConnectedComponents.run(seedPairs, "id_a", "id_b"),
      p, nBuckets = 4)
    val pairs = Seq((2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    LabelStore.applyStreamBatch(spark, p, pairs, "id_a", "id_b", 0L)
    val labels = LabelStore.read(spark, p).as[(Long, Long)].collect().toSet
    assert(labels === Set((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L)))
    LabelStore.compact(spark, p)
    assert(RunSlots.foldedRuns(spark, s"$p/byn").contains("b0"))
    val before = (fileSet(s"$p/byn"), fileSet(s"$p/byc"))
    LabelStore.applyStreamBatch(spark, p, pairs, "id_a", "id_b", 0L)
    assert((fileSet(s"$p/byn"), fileSet(s"$p/byc")) === before,
      "replayed folded batch must leave the store byte-identical")
    assert(LabelStore.read(spark, p).as[(Long, Long)].collect().toSet === labels)
  }

  test("IvfIndex.retrain carries the fold manifest forward") {
    val vecs = sf("sf0.001", "embeddings").limit(64)
    val batchV = vecs.filter(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val p = Files.createTempDirectory("graft_fm_ivf_").toString
    IvfIndex.write(vecs, "embedding", "vec_id", p, nCells = 4)
    IvfIndex.appendBatch(batchV, "embedding", "vec_id", p, batchId = 0L)
    IvfIndex.retrain(spark, p, nCells = 4)
    assert(RunSlots.foldedRuns(spark, p).contains("b0"))
    val rowsBefore = spark.read.parquet(p).count()
    IvfIndex.appendBatch(batchV, "embedding", "vec_id", p, batchId = 0L)
    assert(spark.read.parquet(p).count() === rowsBefore,
      "replay of a retrained-away batch id must be a no-op")
  }

  test("retrain refuses an empty/fully-tombstoned index with a clear message") {
    val vecs = sf("sf0.001", "embeddings").limit(16)
    val p = Files.createTempDirectory("graft_fm_empty_").toString
    IvfIndex.write(vecs, "embedding", "vec_id", p, nCells = 4)
    IvfIndex.deleteDocs(vecs.select("vec_id"), "vec_id", p)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.retrain(spark, p, nCells = 4)
    }
    assert(e.getMessage.contains("live vector"), e.getMessage)
    assert(e.getMessage.contains("delete the store"), e.getMessage)
  }

  test("compactIndex folds _stats to one row; replayed appendIndex is a full no-op") {
    val p = Files.createTempDirectory("graft_fm_lex_").toString
    Retrieval.writeIndex(corpus, "text", "doc_id", p, nBuckets = 4)
    val b0 = batch
    val b1 = Seq((11L, base + "two")).toDF("doc_id", "text")
    Retrieval.appendIndexBatch(b0, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    Retrieval.appendIndexBatch(b1, "text", "doc_id", p, nBuckets = 4, batchId = 1L)
    def stats(): (Long, Long) = {
      val r = spark.read.parquet(s"$p/_stats")
        .agg(sum("n_docs"), sum("total_tokens")).head()
      (r.getLong(0), r.getLong(1))
    }
    val before = stats()
    Retrieval.compactIndex(spark, p)
    assert(stats() === before, "fold must preserve the summed stats")
    assert(spark.read.parquet(s"$p/_stats").count() === 1L,
      "stats folded to a single row")
    assert(RunSlots.foldedRuns(spark, s"$p/_stats").contains("b0"))
    assert(RunSlots.foldedRuns(spark, s"$p/_stats").contains("b1"))
    assert(RunSlots.foldedRuns(spark, p).contains("b1"))
    val snap = (fileSet(p), stats())
    // the replay corner: BOTH the stats delta and the postings no-op
    Retrieval.appendIndexBatch(b0, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    assert((fileSet(p), stats()) === snap,
      "replayed folded batch must leave postings AND stats byte-identical")
    // a fresh batch still appends and is counted once
    Retrieval.appendIndexBatch(
      Seq((12L, base + "three")).toDF("doc_id", "text"),
      "text", "doc_id", p, nBuckets = 4, batchId = 2L)
    assert(stats()._1 === before._1 + 1)
  }

  test("compactIndex migrates a legacy FLAT _stats to the slotted layout") {
    val p = Files.createTempDirectory("graft_fm_lexmig_").toString
    Retrieval.writeIndex(corpus, "text", "doc_id", p, nBuckets = 4)
    // simulate the pre-r11 flat sidecar: replace the slotted _stats
    // with plain part files at its root
    val statsRoot = new org.apache.hadoop.fs.Path(s"$p/_stats")
    val fs = statsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keep = spark.read.parquet(statsRoot.toString)
      .agg(sum("n_docs").as("n_docs"), sum("total_tokens").as("total_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    fs.delete(statsRoot, true)
    Seq(keep).toDF("n_docs", "total_tokens").coalesce(1)
      .write.parquet(statsRoot.toString)
    // run-scoped appends refuse the flat sidecar (write-free)...
    intercept[IllegalArgumentException] {
      Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    }
    // ...and compactIndex is the migration path the error names
    Retrieval.compactIndex(spark, p)
    Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    val r = spark.read.parquet(s"$p/_stats")
      .agg(sum("n_docs"), sum("total_tokens")).head()
    assert(r.getLong(0) === keep._1 + 1)
  }

  test("appendIndex on a legacy flat store fails WRITE-FREE (both layouts validated first)") {
    // pre-r11 flat index: bucket= dirs at the postings root, plain
    // parquet _stats — the ADVICE r11 scenario where the _stats delta
    // slot landed before the postings guard fired
    val p = Files.createTempDirectory("graft_fm_legacy_").toString
    corpus.select(col("doc_id"), lit("alpha").as("term"), lit(1L).as("tf"),
        lit(3L).as("dl"), lit(0L).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(p)
    Seq((2L, 6L)).toDF("n_docs", "total_tokens")
      .write.mode("overwrite").parquet(s"$p/_stats")
    val statsBefore = fileSet(s"$p/_stats")
    intercept[IllegalArgumentException] {
      Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4,
        batchId = 0L)
    }
    assert(fileSet(s"$p/_stats") === statsBefore,
      "legacy-store failure must not land a _stats delta slot")
    val root = new org.apache.hadoop.fs.Path(p)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(root).exists(_.getPath.getName.startsWith("run=")),
      "legacy-store failure must not land postings slots either")
  }

  // ---- partial (uncommitted) slots — ADVICE r12, high ------------------
  // A crash mid-RunSlots.write leaves a slot without its _SUCCESS
  // marker, and the streaming loops compact at the TOP of foreachBatch:
  // on restart the compact runs BEFORE the crashed batch replays. If it
  // folded the partial slot and recorded its id, the replay would no-op
  // and the batch's rows would be lost (empty slot) or frozen partial
  // (additive under-count). The contract: partial slots are excluded
  // from the fold, carried over VERBATIM, and left out of the manifest.

  private def dropSuccess(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, false), s"expected a _SUCCESS marker at $dir")
  }

  test("compact skips a PARTIAL slot: carried verbatim, unrecorded, replay re-lands it") {
    import graft.operators.EdgeStore
    val p = Files.createTempDirectory("graft_fm_part_").toString
    EdgeStore.write(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4)
    EdgeStore.appendBatch(Seq((2L, 3L, 2L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4, batchId = 0L)
    // b1 "crashes" mid-write: committed bytes present, marker absent
    val b1 = Seq((1L, 2L, 5L), (3L, 4L, 7L)).toDF("src", "dst", "w")
    EdgeStore.appendBatch(b1, "src", "dst", Some("w"), p, nBuckets = 4,
      batchId = 1L)
    dropSuccess(s"$p/edges/run=b1")
    val partialBytes = fileSet(s"$p/edges/run=b1")

    EdgeStore.compact(spark, p)
    val folded = RunSlots.foldedRuns(spark, s"$p/edges")
    assert(folded.contains("b0"), "committed slot must fold + record")
    assert(!folded.contains("b1"), "partial slot must NOT be recorded")
    assert(fileSet(s"$p/edges/run=b1") === partialBytes,
      "partial slot must ride over the compact verbatim")
    assert(RunSlots.slotCount(spark, s"$p/edges") === 1)

    // the replay the manifest must NOT swallow: b1 rewrites its slot
    // whole and is counted exactly once
    EdgeStore.appendBatch(b1, "src", "dst", Some("w"), p, nBuckets = 4,
      batchId = 1L)
    val weights = EdgeStore.read(spark, p).as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(weights === Map((1L, 2L) -> 6L, (2L, 3L) -> 2L, (3L, 4L) -> 7L))
    // and a replay of the FOLDED id still no-ops
    val before = fileSet(s"$p/edges")
    EdgeStore.appendBatch(Seq((2L, 3L, 2L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4, batchId = 0L)
    assert(fileSet(s"$p/edges") === before)
  }

  test("compact refuses when every replayable slot is uncommitted") {
    val p = Files.createTempDirectory("graft_fm_allpart_").toString
    RunSlots.write(Seq((1L, 0L)).toDF("v", "pc"), p, "pc", Some("b0"))
    dropSuccess(s"$p/run=b0")
    val e = intercept[IllegalArgumentException] {
      IvfLayout.compact(spark, p, "pc")
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
  }

  test("retrain refuses while a partial slot exists (offline ops don't freeze replays)") {
    val vecs = sf("sf0.001", "embeddings").limit(32)
    val p = Files.createTempDirectory("graft_fm_rtpart_").toString
    IvfIndex.write(vecs, "embedding", "vec_id", p, nCells = 4)
    IvfIndex.appendBatch(vecs.filter(col("vec_id") < 4)
        .select((col("vec_id") + 500L).as("vec_id"), col("embedding")),
      "embedding", "vec_id", p, batchId = 0L)
    dropSuccess(s"$p/run=b0")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.retrain(spark, p, nCells = 4)
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
    assert(e.getMessage.contains("replay"), e.getMessage)
  }

  test("compactIndex skips a partial _stats slot and its replay still lands") {
    val p = Files.createTempDirectory("graft_fm_lexpart_").toString
    Retrieval.writeIndex(corpus, "text", "doc_id", p, nBuckets = 4)
    Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    // the batch "crashed" after its postings landed but mid-stats-write
    dropSuccess(s"$p/_stats/run=b0")
    dropSuccess(s"$p/run=b0")
    Retrieval.compactIndex(spark, p)
    assert(!RunSlots.foldedRuns(spark, s"$p/_stats").contains("b0"),
      "partial stats slot must not be recorded")
    assert(!RunSlots.foldedRuns(spark, p).contains("b0"),
      "partial postings slot must not be recorded")
    // replay rewrites both slots whole; totals count the batch once
    Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    val r = spark.read.parquet(s"$p/_stats")
      .agg(sum("n_docs"), sum("total_tokens")).head()
    assert(r.getLong(0) === 3L, "2 corpus docs + the replayed batch doc")
  }

  test("compactIndex partial-slot path folds an __adhoc__ _stats slot too") {
    // ADVICE r13: the partial-slot branch kept only run=__base__ as
    // reserved — an adhoc _stats slot coexisting with a partial slot
    // was neither summed into the new base nor carried, silently
    // shrinking n_docs/total_tokens
    val p = Files.createTempDirectory("graft_fm_adhoc_").toString
    Retrieval.writeIndex(corpus, "text", "doc_id", p, nBuckets = 4)
    Retrieval.appendIndex(batch, "text", "doc_id", p, nBuckets = 4, None) // adhoc
    val b0 = Seq((20L, base + "three")).toDF("doc_id", "text")
    Retrieval.appendIndexBatch(b0, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    dropSuccess(s"$p/_stats/run=b0")
    dropSuccess(s"$p/run=b0")
    Retrieval.compactIndex(spark, p)
    val folded = spark.read.parquet(s"$p/_stats/run=__base__")
      .agg(sum("n_docs")).head().getLong(0)
    assert(folded === 3L,
      "2 corpus docs + 1 adhoc doc in the folded base; partial b0 excluded")
    // the partial slot rode over verbatim, and its replay still lands
    Retrieval.appendIndexBatch(b0, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    val total = spark.read.parquet(s"$p/_stats")
      .agg(sum("n_docs")).head().getLong(0)
    assert(total === 4L, "base(3) + replayed b0(1), counted once")
  }

  test("writeFlat refuses a flat legacy side table instead of mixing depths") {
    val p = Files.createTempDirectory("graft_fm_flat_").toString
    Seq((2L, 6L)).toDF("n_docs", "total_tokens")
      .write.mode("overwrite").parquet(p)
    intercept[IllegalArgumentException] {
      RunSlots.writeFlat(Seq((1L, 2L)).toDF("n_docs", "total_tokens"),
        p, Some("b0"))
    }
  }
}
