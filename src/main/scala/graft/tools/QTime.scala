package graft.tools

/** Time named SparkEntry queries locally: `runMain graft.tools.QTime
  * <sfDir> <name,name,...> [reps]` — the single-query iteration loop the
  * full Bench is too slow for. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val rows = try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[qtime] $n FAILED: ${e.getMessage}"); -1L }
      println(f"[qtime] rep=$r $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
