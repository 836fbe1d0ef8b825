package graft.tools

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Retrieval}

/** Serve-cost probe for the materialized lexical index at sf0.1:
  * separates the one-time index build from the per-query-batch serve
  * cost, and compares serving from the index against the direct path
  * (which recomputes postings + df every call). The claim: once built,
  * index serving beats direct recomputation and reads only the
  * query-term buckets. */
object LexProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val queries = docs.filter(col("doc_id") % 100 === 3)
      .select(col("doc_id"),
        array_join(slice(Dedup.tokens(col("text")), 1, 5), " ").as("qtext"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val path = java.nio.file.Files.createTempDirectory("graft_lexprobe_").toString
    time("index build (write full corpus)")(
      Retrieval.writeIndex(docs, "text", "doc_id", path))
    time("serve from index (cold)")(
      Retrieval.bm25TopKFromIndex(spark, path, queries, "qtext", "doc_id", 10).count())
    time("serve from index (warm)")(
      Retrieval.bm25TopKFromIndex(spark, path, queries, "qtext", "doc_id", 10).count())
    time("direct bm25TopK (recomputes postings)")(
      Retrieval.bm25TopK(docs, "text", "doc_id", queries, "qtext", "doc_id", 10).count())
    // a SMALL query batch is where pruning pays: 3 queries, few buckets
    val tiny = queries.limit(3).cache(); tiny.count()
    time("serve 3 queries from index")(
      Retrieval.bm25TopKFromIndex(spark, path, tiny, "qtext", "doc_id", 10).count())
    time("direct 3 queries (recomputes postings)")(
      Retrieval.bm25TopK(docs, "text", "doc_id", tiny, "qtext", "doc_id", 10).count())
    spark.stop()
  }
}
