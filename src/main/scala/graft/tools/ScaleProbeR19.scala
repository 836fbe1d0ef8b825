package graft.tools

import org.apache.spark.sql.functions._

/** Round-19 data-bound scaling slice (r18 verdict item 4): the sf0.1
  * bench is per-gate fixed-cost-bound, so the driver's 8-vs-32-core
  * ratios sit at ≈1 for every gate and cannot show which operators
  * parallelize. This probe times the heavy DATA-BOUND operator kernels
  * on the 10×-replicated corpus (the SCALING.md instrument — sf0.1
  * documents replicated with id offsets, the exact-duplicate-heavy
  * crawl shape) at whatever core count `$SPARK_GRAFT_CPUS` names; run
  * it once at 32 and once at 8 and compare the printed seconds.
  * Each op runs twice; the second (warm) time is the one to compare
  * (the first absorbs codegen JIT). Usage: ScaleProbeR19 <sfDir> */
object ScaleProbeR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val docs0 = graft.Tables.read(spark, sfDir, "documents")
      .select("doc_id", "text")
    val docs10 = (0 until 10).map(i =>
        docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text")))
      .reduce(_ unionByName _).persist()
    val n = docs10.count()
    println(s"[scale] cpus=$cpus corpus10x_rows=$n")
    def timeIt(label: String)(f: => Long): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val out = f
      println(f"[scale] $label%-34s run$r ${(System.nanoTime() - t0) / 1e9}%7.2f s (out=$out)")
    }
    timeIt("exact_dedup") {
      graft.llm.Dedup.exact(docs10, "text", "doc_id").count()
    }
    timeIt("minhash_lsh_pairs") {
      graft.llm.Dedup.minhashNearDupPairs(docs10, "text", "doc_id", 0.8)
        .count()
    }
    timeIt("cc_run_over_minhash_pairs") {
      graft.operators.ConnectedComponents.run(
        graft.llm.Dedup.minhashNearDupPairs(docs10, "text", "doc_id", 0.8),
        "id_a", "id_b").count()
    }
    val edges = docs10.select(col("doc_id").as("src"),
        (col("doc_id") + 1).as("dst"))
      .unionByName(docs10.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 7L, lit(n)).as("dst")))
      .withColumn("w", lit(1L))
    timeIt("pagerank_5iters") {
      graft.operators.PageRank.rank(edges, "src", "dst", Some("w"),
        iters = 5).count()
    }
    timeIt("chunkstore_write_delete_gc") {
      val p = java.nio.file.Files
        .createTempDirectory("graft_scale19_ch_").toString
      graft.llm.ChunkStore.write(docs10, "text", "doc_id", p, nBuckets = 64)
      graft.llm.ChunkStore.deleteDocs(
        docs10.select("doc_id").filter(col("doc_id") % 9 === 4),
        "doc_id", p)
      graft.llm.ChunkStore.gc(spark, p)._2
    }
    // a genuinely data-bound slice: the same operator kernels over a
    // range-generated input big enough that task compute dominates the
    // per-job fixed costs — this is where 8-vs-32 separates (the corpus
    // slice above shows the OPPOSITE: at 50k docs the fixed costs
    // dominate and extra cores only add scheduling overhead, which is
    // exactly why the driver's sf0.1 scaling block reads ≈1)
    val big = spark.range(4000000L)
    val bigEdges = big.select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(big.select(col("id").as("src"),
        pmod(col("id") * 7919L, lit(4000000L)).as("dst")))
      .withColumn("w", lit(1L))
    timeIt("synthetic_pagerank_4m_nodes") {
      graft.operators.PageRank.rank(bigEdges, "src", "dst", Some("w"),
        iters = 3).count()
    }
    timeIt("synthetic_shingle_minhash_200k") {
      val txt = spark.range(200000L).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit(s"w$i"), pmod(col("id") * lit(31L + i), lit(997L)))): _*)
          .as("text"))
      graft.llm.Dedup.shingleHashSets(txt, "text", "doc_id", 3)
        .select(explode(col("hs"))).count()
    }
    docs10.unpersist()
    spark.stop()
  }
}
