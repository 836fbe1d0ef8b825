package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Scaling probe for the round-6 batch-2 operators at 1x vs 10x corpus.
  *
  * Claims under test:
  *  - LmScore train + score: two content-keyed aggregations + two
  *    equi-joins — linear in corpus rows;
  *  - Similarity.sqTopK: one encoded scan + broadcast queries — linear;
  *  - Curation.domainBlocklistFilter: per-depth broadcast joins — linear;
  *  - Dedup.semanticDedup: pair work is Σ cluster² ≈ n²/k, so k MUST
  *    scale with n (SemDeDup operates at k ∝ n); probed 1x/k=16 vs
  *    10x/k=160 where the per-pair work should stay ~10x, not 100x. */
object ScaleProbeR6b {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def docsX(k: Int) = (0 until k).map(i =>
      docsBase.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def embX(k: Int) = (0 until k).map(i =>
      embBase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    for (k <- Seq(1, 10)) {
      val docs = docsX(k).cache(); val nd = docs.count()
      val emb = embX(k).cache(); val ne = emb.count()
      println(s"=== corpus x$k ($nd docs, $ne vectors) ===")

      val model = time(s"lm_train x$k")(LmScore.train(docs, "text"))
      time(s"lm_score x$k")(
        LmScore.score(docs, "text", "doc_id", model)
          .agg(sum("sum_bits")).head())

      val m = col("doc_id")
      val urls = docs.select(m.as("doc_id"),
        concat(lit("https://sub"), (m % 97).cast("string"), lit(".site"),
          (m % 31).cast("string"), lit(".com/p")).as("url"))
      val bl = spark.range(0, 7).select(
        concat(lit("site"), col("id").cast("string"), lit(".com")).as("domain"))
      time(s"domain_filter x$k")(
        Curation.domainBlocklistFilter(urls, "url", bl).count())

      val queries = embBase.filter(col("vec_id") < 10)
      time(s"sq_topk x$k")(
        Similarity.sqTopK(emb, queries, "embedding", "vec_id", 10).count())

      val cells = 16 * k // k ∝ n: the SemDeDup scale discipline
      val cents = time(s"kmeans_fit(k=$cells) x$k")(
        KMeans.fit(emb, "embedding", "vec_id", k = cells, iters = 2,
          corpusRows = Some(ne)))
      time(s"semantic_dedup(k=$cells) x$k")(
        Dedup.semanticDedup(emb, "embedding", "vec_id", cents, 0.9)
          .filter(!col("keep")).count())

      // the incremental claim: FIXED batch against a k-times corpus —
      // cost must track the batch (touched cells only), not the corpus
      val corpusIndexed = KMeans.assign(
        emb.select(col("vec_id"), col("embedding")), "embedding", cents)
      val batch = embBase.filter(col("vec_id") < 50)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      time(s"semantic_dedup_incremental(batch=50) x$k")(
        Dedup.semanticDedupIncremental(corpusIndexed, batch,
            "embedding", "vec_id", cents, 0.9)
          .filter(!col("keep")).count())

      docs.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
