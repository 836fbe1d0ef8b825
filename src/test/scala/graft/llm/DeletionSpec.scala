package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion across the materialized stores (takedowns / opt-outs /
  * license changes): tombstones hide rows at serve time IMMEDIATELY
  * with no store rewrite; compact physically reclaims them; survivors
  * serve byte-identically after the purge. (ChunkStore's seq-based
  * variant is covered in ChunkStoreSpec.) */
class DeletionSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- MinHashIndex ---------------------------------------------------

  test("MinHashIndex: deleted docs stop pairing immediately; compact purges their rows") {
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "band plays a long familiar tune in the background of the fair"
    val idx = Seq(10L -> base, 11L -> (base + " extra tail words here"),
        12L -> "a completely unrelated document about maritime law")
      .toDF("doc_id", "text")
    val path = tmp("graft_del_mh_")
    MinHashIndex.write(idx, "text", "doc_id", path, shingleN = 3, nBuckets = 8)
    val batch = Seq(20L -> base).toDF("doc_id", "text")
    def served(): Set[(Long, Long)] =
      MinHashIndex.nearDupPairsIncremental(spark, path, batch,
          "text", "doc_id", jaccardThreshold = 0.5, shingleN = 3, nBuckets = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val before = served()
    assert(before.exists(p => p._1 == 10L || p._2 == 10L), s"fixture: $before")
    MinHashIndex.deleteDocs(Seq(Tuple1(10L)).toDF("doc_id"), "doc_id", path)
    val after = served()
    assert(!after.exists(p => p._1 == 10L || p._2 == 10L),
      s"deleted doc must stop pairing immediately: $after")
    val setsBefore = spark.read.parquet(s"$path/sets").count()
    MinHashIndex.compact(spark, path)
    assert(spark.read.parquet(s"$path/sets").count() < setsBefore,
      "compact must reclaim the deleted doc's set rows")
    assert(spark.read.parquet(s"$path/sets")
      .filter(col("id") === 10L).count() === 0)
    assert(spark.read.parquet(s"$path/bands")
      .filter(col("id") === 10L).count() === 0)
    assert(served() === after, "surviving pairs must be identical after compact")
  }

  // ---- lexical index (BM25) -------------------------------------------

  test("Retrieval index: deleted docs leave results immediately; compact fixes the stats") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(60)
    val path = tmp("graft_del_lex_")
    Retrieval.writeIndex(docs, "text", "doc_id", path, nBuckets = 16)
    val queries = docs.limit(3).select(col("doc_id").as("qid"), col("text"))
    def served(): Seq[(Long, Long, Long, Long)] =
      Retrieval.bm25TopKFromIndex(spark, path, queries, "text", "qid",
          k = 5, nBuckets = 16)
        .select("query_id", "rank", "doc_id", "score")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val before = served()
    // every query's own doc is its top hit — delete one of them
    val victim = before.filter(r => r._1 == r._3).head._3
    Retrieval.deleteIndexDocs(Seq(Tuple1(victim)).toDF("id"), "id", path)
    val after = served()
    assert(!after.exists(_._3 == victim),
      s"deleted doc must leave results immediately: $victim in $after")
    val statsBefore = spark.read.parquet(s"$path/_stats")
      .agg(sum("n_docs"), sum("total_tokens")).as[(Long, Long)].head()
    val postingsBefore = spark.read.parquet(path).count()
    Retrieval.compactIndex(spark, path)
    assert(spark.read.parquet(path).count() < postingsBefore,
      "compact must drop the deleted doc's postings")
    val statsAfter = spark.read.parquet(s"$path/_stats")
      .agg(sum("n_docs"), sum("total_tokens")).as[(Long, Long)].head()
    assert(statsAfter._1 === statsBefore._1 - 1,
      s"n_docs must drop by 1: $statsBefore -> $statsAfter")
    assert(statsAfter._2 < statsBefore._2, "total_tokens must shrink")
    assert(!new java.io.File(s"$path/_tombstones").exists,
      "applied markers must be cleared")
    // re-compacting a clean store is a no-op for stats (idempotence)
    Retrieval.compactIndex(spark, path)
    val statsAgain = spark.read.parquet(s"$path/_stats")
      .agg(sum("n_docs"), sum("total_tokens")).as[(Long, Long)].head()
    assert(statsAgain === statsAfter)
  }

  // ---- IVF / IVF+PQ ----------------------------------------------------

  test("IvfIndex: deleted vector is excluded at serve, reclaimed at compact, survivors identical") {
    val emb = sf("sf0.001", "embeddings").select("vec_id", "embedding")
    val path = tmp("graft_del_ivf_")
    IvfIndex.write(emb, "embedding", "vec_id", path, nCells = 8,
      corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 3)
    def served(): Seq[(Long, Long, Long)] =
      IvfIndex.topK(spark, path, queries, "embedding", "vec_id", k = 5, nProbe = 3)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val before = served()
    val victim = before.head._3
    IvfIndex.deleteDocs(Seq(Tuple1(victim)).toDF("vec_id"), "vec_id", path)
    val after = served()
    assert(!after.exists(_._3 == victim), s"victim $victim still served: $after")
    val rowsBefore = spark.read.parquet(path).count()
    IvfIndex.compact(spark, path)
    assert(spark.read.parquet(path).count() === rowsBefore - 1,
      "compact must reclaim exactly the deleted row")
    assert(served() === after, "survivors must serve identically after compact")
  }

  test("compact refuses a full takedown (empty staged tree); store left intact") {
    val emb = sf("sf0.001", "embeddings").select("vec_id", "embedding").limit(50)
    val path = tmp("graft_del_empty_")
    IvfIndex.write(emb, "embedding", "vec_id", path, nCells = 4,
      corpusRows = Some(50L))
    IvfIndex.deleteDocs(emb.select("vec_id"), "vec_id", path)
    val rowsBefore = spark.read.parquet(path).count()
    val ex = intercept[IllegalStateException] { IvfIndex.compact(spark, path) }
    assert(ex.getMessage.contains("EMPTY store"))
    assert(spark.read.parquet(path).count() === rowsBefore,
      "the refused compact must leave the original store untouched")
  }

  test("IvfPq: deleted vector is excluded at serve and reclaimed at compact") {
    val emb = sf("sf0.001", "embeddings").select("vec_id", "embedding")
    val path = tmp("graft_del_ivfpq_")
    IvfPq.write(emb, "embedding", "vec_id", path, nCells = 4, m = 4, k = 8,
      iters = 2, corpusRows = Some(emb.count()))
    val queries = emb.filter(col("vec_id") < 3)
    def served(): Seq[(Long, Long, Long)] =
      IvfPq.topK(spark, path, queries, "embedding", "vec_id", k = 5, nProbe = 2)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val before = served()
    val victim = before.head._3
    IvfPq.deleteDocs(Seq(Tuple1(victim)).toDF("vec_id"), "vec_id", path)
    val after = served()
    assert(!after.exists(_._3 == victim), s"victim $victim still served: $after")
    val rowsBefore = spark.read.parquet(path).count()
    IvfPq.compact(spark, path)
    assert(spark.read.parquet(path).count() === rowsBefore - 1)
    assert(served() === after, "survivors must serve identically after compact")
  }
}
