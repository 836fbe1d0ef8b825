package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, LabelStore}

/** Round-11 probe: incremental CC per-batch cost vs label-table size.
  *
  * r10's probe showed the in-memory incremental fold near-flat, but its
  * residual growth term is the two FULL label-table scans (the
  * touched-member semi/anti-joins + the full-table rewrite). The
  * bucketed [[LabelStore]] replaces those with `nb=`/`cb=` pruned reads
  * and a changed-rows delta write. This probe fixes ONE batch and grows
  * the label table 10×: the store path should stay flat (cost tracks
  * the batch's buckets), while the in-memory path pays the full scan +
  * full rewrite. */
object ScaleProbeR11 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-52s $s%7.1f s"); (r, s)
    }

    // label table: components of 5 consecutive ids, label = min member
    def labels(n: Long) = spark.range(n)
      .select(col("id").as("node"), (col("id") - pmod(col("id"), lit(5L))).as("label"))

    // fixed batch: 500 pairs — 400 touch existing components (merge
    // neighbors), 100 connect brand-new nodes
    val batch = spark.range(400)
      .select((col("id") * 5000L + 2L).as("id_a"), (col("id") * 5000L + 7L).as("id_b"))
      .unionByName(spark.range(100)
        .select((col("id") + 900000000L).as("id_a"),
          (col("id") + 900001000L).as("id_b")))
      .persist()
    batch.count()

    // ---- warm-start PageRank: grown graph, cold vs warm to tolerance --
    // Zipfian out-link graph (the ScaleProbeR10b generator); grow edges
    // ~2% and re-rank to the same L1 tolerance: the warm start's wall
    // is the iterations it saves (the unchanged bulk starts at the old
    // fixed point).
    def graph(nV: Long, nE: Long) = spark.range(nE).select(
      (pmod(xxhash64(col("id")), lit(nV)) + 1).as("src"),
      (pmod(
        (pow(pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).cast("double") / 1e6, 2.0)
          * nV).cast("long"), lit(nV)) + 1).as("dst"))
    val nV = 200000L
    val g1 = graph(nV, 2000000L).persist(); g1.count()
    val g2 = g1.unionByName(graph(nV, 40000L)).persist(); g2.count()
    val tol = 50000L // L1 micro-mass tolerance
    val prevRanks = graft.operators.PageRank
      .rank(g1, "src", "dst", iters = 30, tolL1 = Some(tol))
    val (_, tCold) = timeIt("re-rank grown graph COLD (tolL1)") {
      graft.operators.PageRank.rank(g2, "src", "dst", iters = 30, tolL1 = Some(tol))
        .count()
    }
    val (_, tWarm) = timeIt("re-rank grown graph WARM (tolL1)") {
      graft.operators.PageRank
        .rankWarm(g2, prevRanks, "src", "dst", iters = 30, tolL1 = Some(tol))
        .count()
    }
    println(f"  warm/cold wall ratio: ${tWarm / tCold}%.2f")
    g1.unpersist(); g2.unpersist()

    // ---- warm-start training: grown labeled set, cold vs warm --------
    // Accuracy after k iterations, fitting from zeros vs continuing
    // from the half-corpus model: the warm start banks the old fit.
    val docsQ = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text")).persist()
    docsQ.count()
    val mStar = graft.llm.QualityTrain.train(docsQ, "text", "doc_id", "y",
      d = 256, iters = 12) // the (near-)converged target
    def l1(m: graft.llm.QualityTrain.Model): Long =
      m.weightsMicro.zip(mStar.weightsMicro).map { case (a, b) => math.abs(a - b) }.sum
    val mHalf = graft.llm.QualityTrain.train(
      docsQ.filter(col("doc_id") % 2 === 0), "text", "doc_id", "y",
      d = 256, iters = 4)
    for (k <- Seq(1, 2)) {
      val cold = graft.llm.QualityTrain.train(docsQ, "text", "doc_id", "y",
        d = 256, iters = k)
      val warm = graft.llm.QualityTrain.trainFrom(mHalf, docsQ,
        "text", "doc_id", "y", iters = k)
      println(f"train grown corpus k=$k: L1-to-converged cold=${l1(cold)}%d  warm=${l1(warm)}%d")
    }
    docsQ.unpersist()

    for ((tag, n) <- Seq("1x" -> 2000000L, "10x" -> 20000000L)) {
      val lab = labels(n)
      // in-memory path: full label DF scan per batch (materialized the
      // way the versioned streaming store would hand it over)
      val labDf = lab.localCheckpoint(true)
      timeIt(s"incremental (full-scan) $tag (|labels|=$n)") {
        ConnectedComponents.incremental(labDf, batch, "id_a", "id_b").count()
      }
      // store path: seed once (not timed against the batch), then fold
      // production sizing: nBuckets grows with the corpus so rows-per-
      // bucket stays constant — the config under which per-batch cost
      // is flat (fixed nBuckets would grow each touched bucket 10x)
      val nb = (n / 2000L).toInt
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_probe_ls_${tag}_").toString
      LabelStore.write(lab, path, nBuckets = nb)
      val (delta, _) = timeIt(s"LabelStore.applyBatch $tag (|labels|=$n, nb=$nb)") {
        LabelStore.applyStreamBatch(spark, path, batch, "id_a", "id_b", 0L)
      }
      println(f"  delta rows: ${delta.count()}%d")
    }
    spark.stop()
  }
}
