package graft.tools

import org.apache.spark.sql.functions._

/** HistStore scale probe: serve cost must track |parts × groups × bins|
  * (the store), never raw-row count. Compares a direct distribution
  * query over raw rows vs HistStore.quantile from the store, at 1x and
  * 10x raw rows. Usage: runMain graft.tools.ProbeHist [rows1x] */
object ProbeHist {
  def main(args: Array[String]): Unit = {
    val n1 = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val spark = graft.core.GraftSession.builder("local[8]", Some(8))
      .appName("probe-hist").getOrCreate()
    import graft.operators.HistStore
    import java.nio.file.Files

    def data(n: Long) = spark.range(n).select(
      concat(lit("d"), pmod(col("id"), lit(30L))).as("day"),
      concat(lit("g"), pmod(col("id"), lit(8L))).as("grp"),
      pmod(xxhash64(col("id")), lit(100000L)).as("v"))

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (mult <- Seq(1L, 10L)) {
      val n = n1 * mult
      val df = data(n)
      // direct: exact per-group histogram quantile over RAW rows
      val (_, tDirect) = time {
        df.groupBy("grp", "v").count()
          .groupBy("grp").agg(count(lit(1)), sum("count")).collect()
      }
      val path = Files.createTempDirectory(s"graft_ph_${mult}_").toString
      val (_, tBuild) = time {
        HistStore.write(df, Seq("grp"), "v", "day", path,
          lo = 0L, hi = 100000L, nBins = 100)
      }
      val (_, tServe) = time {
        HistStore.quantile(spark, path, Seq("grp"), 1L, 2L).collect()
      }
      val (_, tWindow) = time {
        HistStore.counts(spark, path, Seq("grp"),
          Some((0 until 7).map(i => s"d$i"))).collect()
      }
      println(f"[probe] rows=$n%d direct=$tDirect%.2fs build=$tBuild%.2fs " +
        f"storeQuantile=$tServe%.2fs window7=$tWindow%.2fs")
    }
    spark.stop()
  }
}
