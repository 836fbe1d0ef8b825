package graft.tools

/** Time named gates in isolation (bench-style count(), N runs each) —
  * the per-gate bisect harness the full Bench can't give (it runs the
  * whole surface in Map order, so any one gate's number embeds
  * whatever warm-up its predecessors did or didn't do).
  *
  * Usage: BenchOne <sfDir> <runs> <name>[,<name>...] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, runs, names) = (args(0), args(1).toInt, args(2).split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s ${times.map(t => f"$t%6.2f").mkString(" ")}  best=${times.min}%6.2f")
    }
    spark.stop()
  }
}
