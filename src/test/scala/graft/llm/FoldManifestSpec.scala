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
    MinHashIndex.append(batch, "text", "doc_id", p, nBuckets = 4,
      runId = Some("b0"))
    assert(RunSlots.slotCount(spark, s"$p/bands") === 1)
    MinHashIndex.compact(spark, p)
    assert(RunSlots.slotCount(spark, s"$p/bands") === 0)
    assert(RunSlots.foldedRuns(spark, s"$p/bands") === Set("b0"))
    assert(RunSlots.foldedRuns(spark, s"$p/sets") === Set("b0"))
    val before = (fileSet(s"$p/bands"), fileSet(s"$p/sets"))
    // the foreachBatch replay-after-fold corner: same batch, same id
    MinHashIndex.append(batch, "text", "doc_id", p, nBuckets = 4,
      runId = Some("b0"))
    assert((fileSet(s"$p/bands"), fileSet(s"$p/sets")) === before,
      "a folded run id must not re-land rows (store byte-identical)")
    // a NEW id still appends normally
    MinHashIndex.append(
      Seq((11L, base + "two")).toDF("doc_id", "text"),
      "text", "doc_id", p, nBuckets = 4, runId = Some("b1"))
    assert(RunSlots.slotCount(spark, s"$p/bands") === 1)
  }

  test("manifest merges across compacts (earlier folds stay recorded)") {
    val p = Files.createTempDirectory("graft_fm_merge_").toString
    MinHashIndex.write(corpus, "text", "doc_id", p, nBuckets = 4)
    MinHashIndex.append(batch, "text", "doc_id", p, nBuckets = 4,
      runId = Some("b0"))
    MinHashIndex.compact(spark, p)
    MinHashIndex.append(
      Seq((11L, base + "two")).toDF("doc_id", "text"),
      "text", "doc_id", p, nBuckets = 4, runId = Some("b1"))
    MinHashIndex.compact(spark, p)
    assert(RunSlots.foldedRuns(spark, s"$p/bands") === Set("b0", "b1"))
    assert(RunSlots.foldedRuns(spark, s"$p/sets") === Set("b0", "b1"))
  }

  test("EdgeStore: replayed folded batch cannot double-count weights") {
    import graft.operators.EdgeStore
    val p = Files.createTempDirectory("graft_fm_edge_").toString
    EdgeStore.write(Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4)
    val b0 = Seq((1L, 2L, 5L), (2L, 3L, 2L)).toDF("src", "dst", "w")
    EdgeStore.append(b0, "src", "dst", Some("w"), p, nBuckets = 4,
      runId = Some("b0"))
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
    EdgeStore.append(b0, "src", "dst", Some("w"), p, nBuckets = 4,
      runId = Some("b0"))
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
    LabelStore.applyBatch(spark, p, pairs, "id_a", "id_b", Some("b0"))
    val labels = LabelStore.read(spark, p).as[(Long, Long)].collect().toSet
    assert(labels === Set((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L)))
    LabelStore.compact(spark, p)
    assert(RunSlots.foldedRuns(spark, s"$p/byn") === Set("b0"))
    val before = (fileSet(s"$p/byn"), fileSet(s"$p/byc"))
    LabelStore.applyBatch(spark, p, pairs, "id_a", "id_b", Some("b0"))
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
    IvfIndex.append(batchV, "embedding", "vec_id", p, runId = Some("b0"))
    IvfIndex.retrain(spark, p, nCells = 4)
    assert(RunSlots.foldedRuns(spark, p) === Set("b0"))
    val rowsBefore = spark.read.parquet(p).count()
    IvfIndex.append(batchV, "embedding", "vec_id", p, runId = Some("b0"))
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
    Retrieval.appendIndex(b0, "text", "doc_id", p, nBuckets = 4, Some("b0"))
    Retrieval.appendIndex(b1, "text", "doc_id", p, nBuckets = 4, Some("b1"))
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
    assert(RunSlots.foldedRuns(spark, s"$p/_stats") === Set("b0", "b1"))
    assert(RunSlots.foldedRuns(spark, p) === Set("b0", "b1"))
    val snap = (fileSet(p), stats())
    // the replay corner: BOTH the stats delta and the postings no-op
    Retrieval.appendIndex(b0, "text", "doc_id", p, nBuckets = 4, Some("b0"))
    assert((fileSet(p), stats()) === snap,
      "replayed folded batch must leave postings AND stats byte-identical")
    // a fresh batch still appends and is counted once
    Retrieval.appendIndex(
      Seq((12L, base + "three")).toDF("doc_id", "text"),
      "text", "doc_id", p, nBuckets = 4, Some("b2"))
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
      Retrieval.appendIndex(batch, "text", "doc_id", p, nBuckets = 4, Some("b0"))
    }
    // ...and compactIndex is the migration path the error names
    Retrieval.compactIndex(spark, p)
    Retrieval.appendIndex(batch, "text", "doc_id", p, nBuckets = 4, Some("b0"))
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
      Retrieval.appendIndex(batch, "text", "doc_id", p, nBuckets = 4,
        runId = Some("b0"))
    }
    assert(fileSet(s"$p/_stats") === statsBefore,
      "legacy-store failure must not land a _stats delta slot")
    val root = new org.apache.hadoop.fs.Path(p)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(root).exists(_.getPath.getName.startsWith("run=")),
      "legacy-store failure must not land postings slots either")
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
