package graft.tools

import org.apache.spark.sql.functions._
import graft.llm._

/** Round-9 scaling probes at 1x vs 10x corpus (clone-union, id offsets).
  * Claims under test:
  *  - cdcChunks is a map-only projection: cost linear in corpus bytes,
  *    zero exchanges at any scale;
  *  - containmentPairs candidate volume is governed by the prefix
  *    postings (clone-union inflates true duplicates 10x, so pair output
  *    grows ~100x on clones — the probe separates candidate growth from
  *    per-candidate verify cost);
  *  - temperatureMixThreshold (zero-shuffle) tracks the exact windowed
  *    form's per-source counts within hash-granularity tolerance at a
  *    fraction of the cost;
  *  - Z-ordered layout skips parquet row groups on two-column selective
  *    filters where a single-column sort cannot (footer min/max audit,
  *    not wall-clock).
  */
object ScaleProbeR9 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text", "source")
    def corpus(k: Int) = (0 until k).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("source"))).reduce(_ unionByName _)

    // ---- cdc chunking: linear map-only ---------------------------------
    for (k <- Seq(1, 10)) {
      val docs = corpus(k).cache(); val n = docs.count()
      val c = time(s"cdcChunks x$k ($n docs)")(
        Curation.cdcChunks(docs, "text", "doc_id").count())
      println(s"  chunks: $c")
      docs.unpersist()
    }

    // ---- containment: candidate volume vs corpus ------------------------
    // Clone-union makes every doc have 10x exact copies, so the TRUE pair
    // count grows ~100x — report candidates and survivors separately to
    // show verify cost tracks output size, not corpus size.
    for (k <- Seq(1, 3)) {
      val docs = corpus(k).cache(); val n = docs.count()
      val pairs = time(s"containmentPairs x$k ($n docs)")(
        Dedup.containmentPairs(docs, "text", "doc_id", 0.9).count())
      println(s"  pairs >= 0.9: $pairs")
      docs.unpersist()
    }

    // ---- temperature mix: exact window vs zero-shuffle threshold -------
    {
      val docs = corpus(10).cache(); docs.count()
      val exact = time("temperatureMix exact x10")(
        Sampling.temperatureMix(docs, "doc_id", "source", 5000L)
          .groupBy("source").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val approx = time("temperatureMixThreshold x10")(
        Sampling.temperatureMixThreshold(docs, "doc_id", "source", 5000L)
          .groupBy("source").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val drift = exact.map { case (s, e) =>
        val a = approx.getOrElse(s, 0L); math.abs(a - e).toDouble / math.max(e, 1L) }
      println(f"  per-source |approx-exact|/exact: max ${drift.max}%.3f")
      docs.unpersist()
    }

    // ---- z-order row-group skipping (footer min/max audit) --------------
    {
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val zdir = java.nio.file.Files.createTempDirectory("graft_zord_").toString
      val sdir = java.nio.file.Files.createTempDirectory("graft_sing_").toString
      // small row groups so the 600k-row table has enough groups to prune
      val rg = (64 * 1024).toString
      graft.operators.ZOrder.clusterByZ(ord.repartition(1), "o_orderkey", "o_custkey")
        .write.option("parquet.block.size", rg).mode("overwrite").parquet(zdir)
      ord.repartition(1).sortWithinPartitions("o_orderkey")
        .write.option("parquet.block.size", rg).mode("overwrite").parquet(sdir)
      def survivingGroups(dir: String, loA: Long, hiA: Long, loB: Long, hiB: Long): (Int, Int) = {
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import org.apache.hadoop.fs.Path
        val conf = spark.sparkContext.hadoopConfiguration
        val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
        var total = 0; var alive = 0
        files.foreach { f =>
          val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
          try {
            val schema = rd.getFooter.getFileMetaData.getSchema
            val ia = schema.getFieldIndex("o_orderkey")
            val ib = schema.getFieldIndex("o_custkey")
            rd.getFooter.getBlocks.forEach { b =>
              total += 1
              def rangeOf(i: Int): (Long, Long) = {
                val st = b.getColumns.get(i).getStatistics
                (st.genericGetMin.asInstanceOf[Number].longValue,
                  st.genericGetMax.asInstanceOf[Number].longValue)
              }
              val (mna, mxa) = rangeOf(ia); val (mnb, mxb) = rangeOf(ib)
              if (mxa >= loA && mna <= hiA && mxb >= loB && mnb <= hiB) alive += 1
            }
          } finally rd.close()
        }
        (alive, total)
      }
      // a selective box on BOTH columns: 1/8 of each axis
      val (mx, my) = (ord.agg(max("o_orderkey"), max("o_custkey")).collect()(0) match {
        case r => (r.getLong(0), r.getLong(1))
      })
      val (za, zt) = survivingGroups(zdir, 0, mx / 8, 0, my / 8)
      val (sa, st) = survivingGroups(sdir, 0, mx / 8, 0, my / 8)
      println(s"  two-col box: z-order $za/$zt row groups overlap; " +
        s"single-col sort $sa/$st")
      // the discriminating case: a filter on the NON-leading column only —
      // a single-column sort has no min/max structure there at all
      val (zb, _) = survivingGroups(zdir, 0, mx, 0, my / 8)
      val (sb, _) = survivingGroups(sdir, 0, mx, 0, my / 8)
      println(s"  second-col-only box: z-order $zb/$zt; single-col sort $sb/$st")
    }
    spark.stop()
  }
}
