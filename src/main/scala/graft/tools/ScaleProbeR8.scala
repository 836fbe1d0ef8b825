package graft.tools
import org.apache.spark.sql.functions._
import graft.llm._

/** Round-8 scaling probes at 1x vs 10x corpus (clone-union, id offsets).
  * Claims under test:
  *  - topKRerank adds only a candidate-bounded refine stage on top of
  *    ADC serving: the exact-cosine stage touches |queries|·k·refine
  *    vectors regardless of corpus size, so rerank-minus-adc stays flat
  *    while stage 1 tracks the probed-cell scan;
  *  - Dsir model tables stay nBuckets rows at any corpus size (fit cost
  *    linear, model bytes constant), and scoring is one explode +
  *    bounded-broadcast join (linear);
  *  - rrfFuse cost is queries-bound, not corpus-bound (fusion input is
  *    already top-k per list). */
object ScaleProbeR8 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-38s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // ---- rerank: 1x vs 10x embedding corpus -----------------------------
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def vecCorpus(k: Int) = (0 until k).map(i =>
      emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    for (k <- Seq(1, 10)) {
      val docs = vecCorpus(k).cache(); val n = docs.count()
      println(s"=== rerank corpus x$k ($n vectors) ===")
      val path = java.nio.file.Files.createTempDirectory(s"graft_rrprobe_x$k").toString
      time(s"ivfpq write x$k")(
        IvfPq.write(docs, "embedding", "vec_id", path,
          nCells = 16, m = 8, k = 16, iters = 3, corpusRows = Some(n)))
      val queries = emb.filter(col("vec_id") < 10)
      time(s"adc topK x$k")(
        IvfPq.topK(spark, path, queries, "embedding", "vec_id", 10, 4).count())
      time(s"rerank topK (refine=4) x$k")(
        IvfPq.topKRerank(spark, path, queries, docs, "embedding", "vec_id",
          10, 4, 4).count())
      docs.unpersist()
    }

    // ---- DSIR: 1x vs 10x document corpus --------------------------------
    val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    def docCorpus(k: Int) = (0 until k).map(i =>
      docsBase.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    for (k <- Seq(1, 10)) {
      val raw = docCorpus(k).cache(); val n = raw.count()
      println(s"=== dsir corpus x$k ($n docs) ===")
      val target = docsBase.filter(pmod(col("doc_id"), lit(20L)) === 1)
      time(s"dsir fit+score x$k")(
        Dsir.score(raw, target, "text", "doc_id", nBuckets = 4096).count())
      raw.unpersist()
    }

    // ---- RRF: fusion cost vs corpus size --------------------------------
    // both lists computed on the FULL corpus; fusion itself then runs on
    // 2 * |queries| * 10 rows — timed separately via pre-collected lists
    val docs1 = docsBase
    val qs = docs1.filter(col("doc_id") % 100 === 3)
      .select(col("doc_id"),
        array_join(slice(Dedup.tokens(col("text")), 1, 5), " ").as("qtext"))
    val lex = Retrieval.bm25TopK(docs1, "text", "doc_id", qs, "qtext", "doc_id", 10)
      .localCheckpoint(true)
    val sem = lex.select(col("query_id"), col("rank"),
      (col("doc_id") + 17L).as("doc_id")).localCheckpoint(true)
    time("rrfFuse on materialized lists")(
      Retrieval.rrfFuse(Seq(lex, sem), 10).count())
    spark.stop()
  }
}
