package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Exactly-once index appends under replay (r10 verdict "What's
  * missing #1"): every materialized store's append takes an optional
  * `runId` that scopes the write to its own `run=<id>` slot
  * ([[RunSlots]]), so re-running the same batch — the foreachBatch
  * at-least-once case — OVERWRITES the slot instead of landing rows
  * twice. Each test appends the same batch twice with the same runId
  * and asserts the store is value-identical to a single delivery. */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
  private def corpus =
    Seq((1L, base + "one"), (2L, "totally different words entirely here"))
      .toDF("doc_id", "text")
  private def batch = Seq((10L, base + "one")).toDF("doc_id", "text")

  private def rows(df: DataFrame): Map[String, Long] =
    df.collect().map(_.toString).groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("MinHashIndex.append replay: run slot rewritten, bands/sets identical to one delivery") {
    val once = Files.createTempDirectory("graft_rp_mh1_").toString
    val twice = Files.createTempDirectory("graft_rp_mh2_").toString
    for (p <- Seq(once, twice)) MinHashIndex.write(corpus, "text", "doc_id", p, nBuckets = 4)
    MinHashIndex.appendBatch(batch, "text", "doc_id", once, shingleN = 3, nBuckets = 4, batchId = 0L)
    MinHashIndex.appendBatch(batch, "text", "doc_id", twice, shingleN = 3, nBuckets = 4, batchId = 0L)
    MinHashIndex.appendBatch(batch, "text", "doc_id", twice, shingleN = 3, nBuckets = 4, batchId = 0L)
    for (t <- Seq("bands", "sets"))
      assert(rows(spark.read.parquet(s"$twice/$t").drop("run")) ===
        rows(spark.read.parquet(s"$once/$t").drop("run")), s"table $t")
    // and the replayed index serves identically
    val next = Seq((20L, base + "one")).toDF("doc_id", "text")
    val got = MinHashIndex.nearDupPairsIncremental(spark, twice, next,
      "text", "doc_id", 0.8, nBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 20L), (10L, 20L)))
  }

  test("ContainIndex.serveThenAppend replay: slot rewritten, pairs stable, no duplicate postings") {
    val once = Files.createTempDirectory("graft_rp_ct1_").toString
    val twice = Files.createTempDirectory("graft_rp_ct2_").toString
    for (p <- Seq(once, twice))
      ContainIndex.write(corpus, "text", "doc_id", p, threshold = 0.9, nBuckets = 4)
    def serve(p: String): Set[(Long, Long)] = {
      var out = Set.empty[(Long, Long)]
      ContainIndex.serveThenAppendBatch(spark, p, batch, "text", "doc_id",
        threshold = 0.9, batchId = 0L) { pairs =>
        out = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      }
      out
    }
    val first = serve(once)
    assert(serve(twice) === first && serve(twice) === first,
      "replayed serve must return the same pairs")
    for (t <- Seq("pref", "post", "sets"))
      assert(rows(spark.read.parquet(s"$twice/$t").drop("run")) ===
        rows(spark.read.parquet(s"$once/$t").drop("run")), s"table $t")
  }

  test("Retrieval.appendIndex replay: stats and postings count the batch once") {
    val p = Files.createTempDirectory("graft_rp_lex_").toString
    Retrieval.writeIndex(corpus, "text", "doc_id", p, nBuckets = 4)
    Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    Retrieval.appendIndexBatch(batch, "text", "doc_id", p, nBuckets = 4, batchId = 0L)
    val stats = spark.read.parquet(s"$p/_stats")
      .agg(sum("n_docs"), sum("total_tokens")).head()
    assert(stats.getLong(0) === 3L, "n_docs must count the replayed batch once")
    val postings = spark.read.parquet(p).filter(col("doc_id") === 10L).count()
    val direct = batch.select(explode(Dedup.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(postings === direct, "one posting row per distinct term")
  }

  test("IvfIndex/IvfPq append replay: vectors land once, serving unchanged") {
    val vecs = sf("sf0.001", "embeddings").limit(64)
    val batchV = vecs.filter(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val ivf = Files.createTempDirectory("graft_rp_ivf_").toString
    IvfIndex.write(vecs, "embedding", "vec_id", ivf, nCells = 4)
    val baseRows = spark.read.parquet(ivf).count()
    IvfIndex.appendBatch(batchV, "embedding", "vec_id", ivf, batchId = 0L)
    IvfIndex.appendBatch(batchV, "embedding", "vec_id", ivf, batchId = 0L)
    assert(spark.read.parquet(ivf).count() === baseRows + 8)

    val pq = Files.createTempDirectory("graft_rp_pq_").toString
    IvfPq.write(vecs, "embedding", "vec_id", pq, nCells = 4, m = 4, k = 16)
    val pqBase = spark.read.parquet(pq).count()
    IvfPq.appendBatch(batchV, "embedding", "vec_id", pq, batchId = 0L)
    IvfPq.appendBatch(batchV, "embedding", "vec_id", pq, batchId = 0L)
    assert(spark.read.parquet(pq).count() === pqBase + 8)
  }

  test("run slots refuse a pre-slot flat layout instead of corrupting discovery") {
    val p = Files.createTempDirectory("graft_rp_legacy_").toString
    corpus.withColumn("kb", pmod(xxhash64(col("doc_id")), lit(4L)))
      .write.partitionBy("kb").parquet(s"$p/bands") // legacy flat tree
    val e = intercept[IllegalArgumentException](
      RunSlots.write(corpus.withColumn("kb", lit(0L)), s"$p/bands", "kb", Some("b0")))
    assert(e.getMessage.contains("pre-slot flat layout"))
  }

  test("compact migrates a pre-slot flat store to the slotted layout") {
    val p = Files.createTempDirectory("graft_rp_mig_").toString
    // a legacy store: flat kb= tree, as pre-r11 writes left it
    graft.llm.Dedup.shingleHashSets(corpus, "text", "doc_id", 3)
      .select(col("id"), col("hs"))
      .withColumn("ib", pmod(xxhash64(col("id")), lit(4L)))
      .write.partitionBy("ib").parquet(s"$p/sets")
    Dedup.bandRows(
        graft.llm.Dedup.shingleHashSets(corpus, "text", "doc_id", 3))
      .withColumn("kb", pmod(xxhash64(col("key")), lit(4L)))
      .write.partitionBy("kb").parquet(s"$p/bands")
    MinHashIndex.compact(spark, p)
    // slotted now: a run-scoped append lands instead of throwing
    MinHashIndex.appendBatch(batch, "text", "doc_id", p, shingleN = 3, nBuckets = 4, batchId = 0L)
    val next = Seq((20L, base + "one")).toDF("doc_id", "text")
    val got = MinHashIndex.nearDupPairsIncremental(spark, p, next,
      "text", "doc_id", 0.8, nBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 20L), (10L, 20L)))
  }

  test("compact collapses run slots into __base__ and keeps serving identical") {
    val p = Files.createTempDirectory("graft_rp_cmp_").toString
    MinHashIndex.write(corpus, "text", "doc_id", p, nBuckets = 4)
    MinHashIndex.appendBatch(batch, "text", "doc_id", p, shingleN = 3, nBuckets = 4, batchId = 0L)
    val next = Seq((20L, base + "one")).toDF("doc_id", "text")
    def serve() = MinHashIndex.nearDupPairsIncremental(spark, p, next,
        "text", "doc_id", 0.8, nBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val before = serve()
    MinHashIndex.compact(spark, p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val slots = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/bands"))
      .filter(_.getPath.getName.startsWith("run=")).map(_.getPath.getName).toSet
    assert(slots === Set(s"run=${RunSlots.Base}"))
    assert(serve() === before)
  }

  test("RunSlots.stats: one row per slot, folds to __base__ after compact") {
    val p = Files.createTempDirectory("graft_rp_stats_").toString
    MinHashIndex.write(corpus, "text", "doc_id", p, nBuckets = 4)
    MinHashIndex.appendBatch(batch, "text", "doc_id", p, shingleN = 3, nBuckets = 4, batchId = 0L)
    MinHashIndex.appendBatch(
      Seq((20L, base + "one")).toDF("doc_id", "text"),
      "text", "doc_id", p, shingleN = 3, nBuckets = 4, batchId = 1L)
    val before = RunSlots.stats(spark, s"$p/bands")
    assert(before.map(_.run) === Seq(RunSlots.Base, "b0", "b1"))
    assert(before.forall(s => s.files > 0 && s.bytes > 0))
    MinHashIndex.compact(spark, p)
    val after = RunSlots.stats(spark, s"$p/bands")
    assert(after.map(_.run) === Seq(RunSlots.Base))
    // empty / missing tables report empty, not a throw
    assert(RunSlots.stats(spark, s"$p/nope").isEmpty)
  }

  test("streaming replay end to end: wiped checkpoint re-delivers the batch, index converges") {
    val idxPath = Files.createTempDirectory("graft_rp_str_idx_").toString
    MinHashIndex.write(corpus, "text", "doc_id", idxPath, nBuckets = 4)
    val srcDir = Files.createTempDirectory("graft_rp_str_src_").toString
    batch.coalesce(1).write.mode("append").parquet(srcDir)
    val pairsPath = Files.createTempDirectory("graft_rp_str_p_").toString
    val schema = spark.read.parquet(srcDir).schema
    def run(ck: String): Unit =
      graft.streaming.StreamingIncremental.streamingIndexedDedup(
        spark, srcDir, schema, idxPath, pairsPath, ck, "text", "doc_id",
        jaccardThreshold = 0.8, nBuckets = 4).awaitTermination()
    run(Files.createTempDirectory("graft_rp_str_ck1_").toString)
    val once = rows(spark.read.parquet(s"$idxPath/bands").drop("run"))
    // a lost checkpoint is the worst replay: the whole batch re-delivers
    run(Files.createTempDirectory("graft_rp_str_ck2_").toString)
    assert(rows(spark.read.parquet(s"$idxPath/bands").drop("run")) === once,
      "replayed micro-batch must not duplicate index rows")
  }
}
