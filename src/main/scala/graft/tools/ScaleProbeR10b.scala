package graft.tools
import org.apache.spark.sql.functions._
import graft.llm.QualityTrain
import graft.operators.{PageRank, SketchStore}

/** Round-10 fourth-wave probes:
  *
  *  1. QualityTrain: feature-build vs per-iteration cost on 1× vs 10×
  *     corpus — tokenization is paid ONCE (cached features); iteration
  *     cost is a cache pass, so deep training amortizes the corpus scan.
  *  2. PageRank on a Zipfian host graph 1× vs 10× — per-iteration wall
  *     should track |E| (the contribution join), and the lineage cut
  *     must keep 30-iteration runs flat-per-iter (no plan blowup).
  *  3. SketchStore: union-serve cost vs exact recount as raw rows grow
  *     10× — serve reads day×group sketch rows, not raw rows.
  */
object ScaleProbeR10b {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def timeIt[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-48s $s%7.1f s"); (r, s)
    }

    // ---- 1. trainer ---------------------------------------------------
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("text"))
    val docs10 = (0 until 10).map(j =>
        docs1.select((col("doc_id") + lit(j * 10000000L)).as("doc_id"),
          col("y"), col("text")))
      .reduce(_ unionByName _)
    for ((label, d) <- Seq("1x" -> docs1, "10x" -> docs10)) {
      val n = d.count()
      val (_, t2) = timeIt(s"train $label ($n docs) d=256 iters=2") {
        QualityTrain.train(d, "text", "doc_id", "y", d = 256, iters = 2)
      }
      val (_, t6) = timeIt(s"train $label ($n docs) d=256 iters=6") {
        QualityTrain.train(d, "text", "doc_id", "y", d = 256, iters = 6)
      }
      println(f"  per-extra-iteration cost: ${(t6 - t2) / 4}%5.2f s " +
        f"(vs ${t2 / 2}%5.2f s/iter incl. build)")
    }

    // ---- 1b. trainer width: literal vs broadcast weight path ----------
    for (d <- Seq(256, 65546)) {
      val form = if (d > QualityTrain.LiteralWeightMax) "broadcast" else "literal"
      timeIt(s"train 1x d=$d iters=2 ($form weights)") {
        QualityTrain.train(docs1, "text", "doc_id", "y", d = d, iters = 2)
      }
    }

    // ---- 2. pagerank --------------------------------------------------
    // Zipfian out-link graph: source uniform, destination ~ Zipf via
    // floor(U^2 * V) so hot hosts take quadratically more in-links.
    def graph(nV: Long, nE: Long) = spark.range(nE).select(
      (pmod(xxhash64(col("id")), lit(nV)) + 1).as("src"),
      (pmod(
        (pow(pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).cast("double") / 1e6, 2.0)
          * nV).cast("long"), lit(nV)) + 1).as("dst"),
      (pmod(xxhash64(col("id"), lit(2)), lit(5L)) + 1).as("w"))
    for ((label, nv, ne) <- Seq(("1x", 50000L, 500000L), ("10x", 500000L, 5000000L))) {
      val g = graph(nv, ne).persist()
      g.count()
      val (r, t) = timeIt(s"pagerank $label (|V|=$nv |E|=$ne) 5 iters") {
        PageRank.rank(g, "src", "dst", Some("w"), iters = 5)
          .agg(sum("pr")).first().getLong(0)
      }
      println(f"  mass=$r%d  per-iter=${t / 5}%5.2f s")
      g.unpersist()
    }
    // lineage stability: 30 iterations on the small graph
    val gSmall = graph(50000L, 500000L).persist(); gSmall.count()
    timeIt("pagerank 1x 30 iters (lineage-cut stability)") {
      PageRank.rank(gSmall, "src", "dst", Some("w"), iters = 30)
        .agg(sum("pr")).first().getLong(0)
    }
    gSmall.unpersist()

    // ---- 2b. incremental CC: fixed batch vs corpus size ----------------
    // Corpus = 3-node chain components; the batch touches 100 of them
    // and adds 100 brand-new pairs. Incremental cost should track the
    // BATCH (touched members + new nodes), not the label table.
    def chainEdges(nComp: Long) = spark.range(nComp).selectExpr(
        "id * 3 AS a", "id * 3 + 1 AS b")
      .union(spark.range(nComp).selectExpr("id * 3 + 1", "id * 3 + 2"))
    for ((label, nComp) <- Seq(("1x", 20000L), ("10x", 200000L))) {
      val edges = chainEdges(nComp).persist(); edges.count()
      val (labels, tFull) = timeIt(s"cc full      $label ($nComp comps)") {
        val l = graft.operators.ConnectedComponents.run(edges, "a", "b")
          .persist()
        l.count(); l
      }
      val batch = spark.range(100).selectExpr(
          "id * 600 AS a", "id * 600 + 2 AS b") // touch every 200th comp
        .union(spark.range(100).selectExpr(
          "10000000 + id * 2", "10000000 + id * 2 + 1")) // brand-new pairs
      val (_, tInc) = timeIt(s"cc incremental $label (200-pair batch)") {
        graft.operators.ConnectedComponents
          .incremental(labels, batch, "a", "b").count()
      }
      println(f"  incremental/full = ${tInc / tFull}%5.2f")
      labels.unpersist(); edges.unpersist()
    }

    // ---- 3. sketch store ----------------------------------------------
    val ev1 = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .withColumn("day", to_date(col("ts")))
      .select("day", "event_type", "user_id")
    val ev10 = (0 until 10).map(j =>
        ev1.select(col("day"), col("event_type"),
          (col("user_id") + lit(j * 100000000L)).as("user_id")))
      .reduce(_ unionByName _)
    for ((label, ev) <- Seq("1x" -> ev1, "10x" -> ev10)) {
      val n = ev.count()
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_sketch_probe_$label").toString
      timeIt(s"sketch build $label ($n rows, daily)") {
        SketchStore.build(ev, Seq("event_type"), "user_id", "day", path)
      }
      val (_, tServe) = timeIt(s"sketch union-serve $label") {
        SketchStore.estimate(spark, path, Seq("event_type")).collect()
      }
      val (_, tExact) = timeIt(s"exact recount      $label") {
        ev.groupBy("event_type")
          .agg(countDistinct(col("user_id"))).collect()
      }
      println(f"  serve/exact = ${tServe / tExact}%5.2f")
    }
    spark.stop()
  }
}
