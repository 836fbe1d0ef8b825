package graft.tools

import org.apache.spark.sql.functions._

/** Round-15 scale probes: the new erasure ops' footprints at ×10 data.
  *
  *  1. EdgeStore.dropNodes — rewrite must touch only the DIRTY buckets
  *     (those holding an edge that mentions a dropped node) while the
  *     census is a 3-column scan; the probe reports buckets rewritten
  *     vs total and the wall split vs a full compact of the same store;
  *  2. TopKStore.dropKeys / SampleStore.dropKeys — full summary-table
  *     rewrites by design (the stores are ≤ |instances × m| rows,
  *     never corpus-scale); the probe reports the summary row count
  *     the rewrite actually moves vs the corpus row count it never
  *     touches — the quantity that makes "full rewrite" the right
  *     shape here and the wrong one for the chunk/label stores.
  *
  * Usage: runMain graft.tools.ProbeR15 [sfDir] */
object ProbeR15 {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ids = docs.select("doc_id")
    val n = ids.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe15_").toString

    // ---- 1. edge store: small takedown on a 512-bucket graph -------------
    val es = s"$tmp/es"
    val edges = ids.select(col("doc_id").as("src"),
        (col("doc_id") * 7L % lit(n)).as("dst"), lit(1L).as("w"))
      .filter(col("src") =!= col("dst"))
    val (_, tBuild) = timed(graft.operators.EdgeStore.write(
      edges, "src", "dst", Some("w"), es, nBuckets = 512))
    val nBucketDirs = {
      val fs = new org.apache.hadoop.fs.Path(es)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$es/edges/run=__base__"))
        .count(_.getPath.getName.startsWith("eb="))
    }
    // a 10-node takedown: src-side hits land in <=10 buckets, dst-side
    // hits (doc*7 % n) in up to 10 more — tiny against 512
    val victims = ids.filter(col("doc_id") % (n / 10L) === 3L)
    val ((buckets, removed), tDrop) = timed(
      graft.operators.EdgeStore.dropNodes(spark, es, victims, "doc_id"))
    val (_, tCompact) = timed(graft.operators.EdgeStore.compact(spark, es))
    println(f"[probe15] edge store: ${n}%d nodes, $nBucketDirs%d buckets, " +
      f"build $tBuild%.1f s")
    println(f"[probe15] dropNodes(10 victims): $removed%d edges removed, " +
      f"$buckets%d/$nBucketDirs%d buckets rewritten, $tDrop%.1f s " +
      f"(full compact of the same store: $tCompact%.1f s)")

    // ---- 2. summary stores: rewrite size vs corpus size ------------------
    val tk = s"$tmp/tk"
    graft.operators.TopKStore.write(docs, Seq.empty, "lang", "source", tk,
      m = 8)
    val tkRows = spark.read.parquet(s"$tk/topk").count()
    val (_, tTk) = timed(graft.operators.TopKStore.dropKeys(spark, tk,
      Seq("en").toDF("v"), "v"))
    val sm = s"$tmp/sm"
    graft.operators.SampleStore.write(docs, Seq.empty, "doc_id", "source",
      sm, kMax = 64)
    val smRows = spark.read.parquet(s"$sm/sample").count()
    val (_, tSm) = timed(graft.operators.SampleStore.dropKeys(spark, sm,
      victims, "doc_id"))
    println(f"[probe15] topk dropKeys: rewrites $tkRows%d summary rows " +
      f"(corpus $n%d), $tTk%.1f s; sample dropKeys: $smRows%d rows, $tSm%.1f s")

    // ---- 3. bloom rebuild at a geometry that does NOT saturate ------------
    // (the bloom_rebuild GATE pins fill-drop at a deliberately tight
    // w=512, which saturates to 1000‰ at ×10 keys — both geometries
    // pegged, the strict require fires. The OPERATOR scales as a
    // single corpus pass; time it at widths sized for the corpus.)
    val bl = s"$tmp/bl"
    graft.operators.BloomStore.write(docs, "doc_id", "source", bl,
      depth = 3, width = 1 << 16)
    val (_, tRebuild) = timed(graft.operators.BloomStore.rebuild(
      docs, "doc_id", "source", bl, depth = 3, width = 1 << 18))
    println(f"[probe15] bloom rebuild (w 65536 -> 262144, ${n}%d keys): " +
      f"$tRebuild%.1f s")
    spark.stop()
  }
}
