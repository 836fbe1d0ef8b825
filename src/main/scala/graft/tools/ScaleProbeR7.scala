package graft.tools

import org.apache.spark.sql.functions._

import graft.llm._

/** Round-7 probes for the two de-fused plan bombs and the SemDeDup
  * trained-scale discipline.
  *
  * Claims under test:
  *  1. `Similarity.assignCells` through the native NearestCentroids
  *     kernel has CONSTANT plan size in nCells: assignment cost grows
  *     only with the O(nCells·dim) per-row flops, and a production
  *     2048-cell quantizer is fine — where the former candidate-struct
  *     Column form was the measured codegen collapse (KMeans precedent:
  *     46 s → 0.9 s at k=160).
  *  2. ADC through AdcLut/AdcScore at the PRODUCTION codebook shape
  *     (m=16, k=256 — 4096 expression nodes in the former literal-array
  *     form) builds and serves fine, with recall@10 vs brute force
  *     recorded at the near-dup operating point.
  *  3. SemDeDup pair work is Σ cluster² ≈ n²/k: raising k at fixed n
  *     must shrink within-cell pair work ~1/k (the paper's k ∝ √n-to-
  *     thousands discipline), and the native kernel keeps the assign
  *     cost flat while k grows 64×.
  */
object ScaleProbeR7 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb = (0 until 5).map(i =>
        embBase.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _).cache()
    val n = emb.count()
    println(s"=== corpus: $n vectors ===")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // --- 1. coarse-assign at production cell counts --------------------
    for (nCells <- Seq(16, 256, 2048)) {
      val cents = embBase.select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").limit(nCells).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
      time(s"assign_kernel nCells=$nCells keep=1")(
        emb.select(graft.functions.VectorFunctions
            .nearestCentroids(col("embedding"), cents, 1).getItem(0).as("cid"))
          .agg(sum(col("cid"))).head())
    }

    // --- 2. ADC at the production codebook shape -----------------------
    val books = time("pq_fit m=16 k=256 iters=2")(
      Pq.fit(emb, "embedding", "vec_id", m = 16, k = 256, iters = 2,
        corpusRows = Some(n)))
    val codes = time("pq_encode m=16 k=256")(
      Pq.encode(emb, "embedding", "vec_id", books).cache())
    codes.count()
    val queries = embBase.filter(col("vec_id") < 20)
    val adc = time("pq_topk m=16 k=256 (20 queries)")(
      Pq.topK(codes, books, queries, "embedding", "vec_id", 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet)
    val brute = time("brute_topk (20 queries)")(
      Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet)
    println(f"recall@10 vs brute: ${adc.intersect(brute).size.toDouble / brute.size}%.3f")
    codes.unpersist()

    // --- 2b. materialized pipeline vs localCheckpoint staging ----------
    {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
      val train = docs.filter(col("doc_id") % 2 === 0)
      time("curation localCheckpoint staging (gate shape)") {
        val model = LmScore.train(train, "text")
        val lmKeep = LmScore.score(docs, "text", "doc_id", model)
          .filter(col("n_bigrams") > 0 &&
            col("sum_bits") * 10L <= col("n_bigrams") * 44L)
          .select("doc_id").localCheckpoint()
        val kept = docs.join(lmKeep, Seq("doc_id"), "left_semi")
        val survivors = Dedup.exact(kept, "text", "doc_id").select("doc_id")
        Sampling.splitAssign(kept.join(survivors, Seq("doc_id"), "left_semi"),
            "doc_id", seed = 7L, valPct = 10, testPct = 10)
          .groupBy("split")
          .agg(count(lit(1)), sum(length(col("text")).cast("long"))).collect()
      }
      val wh = new graft.warehouse.Warehouse(
        java.nio.file.Files.createTempDirectory("graft_probe_wh_").toString, spark)
      val st = CurationPipeline.Stages("proj", "curation")
      time("curation warehouse-materialized (cold run)")(
        CurationPipeline.run(wh, docs, train, "text", "doc_id", st).collect())
      time("curation warehouse-materialized (resume)")(
        CurationPipeline.run(wh, docs, train, "text", "doc_id", st).collect())
    }

    // --- 3. SemDeDup pair-work curve: k from 16 to 1024 at fixed n -----
    for (k <- Seq(16, 128, 448, 1024)) {
      val cents = time(s"kmeans_fit k=$k iters=2")(
        KMeans.fit(emb, "embedding", "vec_id", k = k, iters = 2,
          corpusRows = Some(n)))
      val assigned = KMeans.assign(emb, "embedding", cents)
      val pairWork = assigned.groupBy("cid").count()
        .agg(sum(col("count") * col("count"))).as[Long].head()
      time(s"semantic_dedup k=$k (pair_work=$pairWork)")(
        Dedup.semanticDedup(emb, "embedding", "vec_id", cents, 0.9)
          .filter(!col("keep")).count())
    }
    emb.unpersist()
    spark.stop()
  }
}
