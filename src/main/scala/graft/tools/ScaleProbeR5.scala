package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Scaling probe for the round-5 curation/retrieval operators at 1x vs
  * 10x corpus (10x = clone-union with id offsets, the duplicate-heavy
  * crawl shape — the WORST case for duplicated-span detection, since
  * every gram in the clones is corpus-duplicated and every position gets
  * flagged). */
object ScaleProbeR5 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def corpus(k: Int) = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-36s ${(System.nanoTime()-t0)/1e9}%8.1f s   rows=$n")
    }
    for (k <- Seq(1, 10)) {
      val docs = corpus(k).cache(); docs.count()
      println(s"=== corpus x$k (${5000*k} docs) ===")
      time(s"duplicated_spans x$k")(
        Curation.duplicatedSpans(docs, "text", "doc_id").count())
      time(s"quality_filter x$k")(
        Curation.gopherQualityFilter(docs, "text", "doc_id").count())
      val urls = docs.select(col("doc_id"),
        concat(lit("HTTP://WWW.Site"), (col("doc_id") % 997).cast("string"),
          lit(".com:80/p/"), (col("doc_id") % 4999).cast("string"),
          lit("?utm_source=x&id="), (col("doc_id") % 4999).cast("string"),
          lit("#f")).as("url"))
      time(s"url_dedup x$k")(
        Curation.urlDedup(urls, "url", "doc_id").count())
      val queries = base.filter(col("doc_id") % 500 === 3)
        .select(col("doc_id"),
          array_join(slice(Dedup.tokens(col("text")), 1, 5), " ").as("qtext"))
      time(s"tfidf_topk x$k")(
        Retrieval.tfidfTopK(docs, "text", "doc_id",
          queries, "qtext", "doc_id", k = 10).count())
      // blocklist drawn from the corpus: every clone of a blocked doc is
      // fully excised — the worst case for span construction
      val bl = base.filter(col("doc_id") % 100 === 7)
        .select(col("doc_id"),
          array_join(slice(Dedup.tokens(col("text")), 1, 10), " ").as("text"))
      time(s"excise_passages x$k")(
        Curation.excisePassages(docs, bl, "text", "doc_id").count())
      docs.unpersist()
    }
    spark.stop()
  }
}
