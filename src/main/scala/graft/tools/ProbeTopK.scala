package graft.tools

import org.apache.spark.sql.functions._

/** TopKStore scale probe: windowed heavy-hitter serve must track
  * |instances × m| summary rows, never raw-row count. Compares a
  * direct top-k recount over RAW rows vs TopKStore.topK from the
  * store, at 1x and 10x raw rows, plus the bound-tightness the
  * Misra-Gries algebra actually delivers on a skewed distribution.
  * Usage: runMain graft.tools.ProbeTopK [rows1x] */
object ProbeTopK {
  def main(args: Array[String]): Unit = {
    val n1 = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val spark = graft.core.GraftSession.builder("local[8]", Some(8))
      .appName("probe-topk").getOrCreate()
    import graft.operators.TopKStore
    import java.nio.file.Files

    // skewed values: ~half the mass on 16 hot ids, a long uniform tail
    def data(n: Long) = spark.range(n).select(
      concat(lit("d"), pmod(col("id"), lit(30L))).as("day"),
      when(pmod(xxhash64(col("id")), lit(2L)) === 0L,
        concat(lit("hot"), pmod(col("id"), lit(16L))))
        .otherwise(concat(lit("t"), pmod(xxhash64(col("id"), lit(7)),
          lit(50000L)))).as("v"))

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (mult <- Seq(1L, 10L)) {
      val n = n1 * mult
      val df = data(n)
      // direct: exact windowed top-k over RAW rows (7-day window)
      val (_, tDirect) = time {
        df.filter(col("day").isin((0 until 7).map(i => s"d$i"): _*))
          .groupBy("v").count()
          .orderBy(col("count").desc, col("v").asc).limit(10).collect()
      }
      val path = Files.createTempDirectory(s"graft_pt_${mult}_").toString
      val (_, tBuild) = time {
        TopKStore.write(df, Seq.empty, "v", "day", path, m = 64)
      }
      val ((rows, maxGap), tServe) = time {
        val r = TopKStore.topK(spark, path, Seq.empty, k = 10,
          Some((0 until 7).map(i => s"d$i"))).collect()
        // relative bound width (ub-lb)/lb — how tight the Misra-Gries
        // algebra is on this skew (hot values miss half the day
        // instances by construction, so `exact` is deliberately rare
        // here; tightness is the honest metric)
        (r.length, r.map(x => (x.getAs[Long]("ub") - x.getAs[Long]("lb"))
          .toDouble / x.getAs[Long]("lb")).max)
      }
      println(f"[probe] rows=$n%d direct=$tDirect%.2fs build=$tBuild%.2fs " +
        f"storeServe=$tServe%.2fs served=$rows maxRelGap=$maxGap%.4f")
    }
    spark.stop()
  }
}
