package graft.tools

import scala.collection.mutable

/** Aggregate full driver stacks for one gate: samples the gate thread
  * every 10 ms and prints the most frequent collapsed stacks (top 25
  * frames each) — the "which exact code path owns the wall" instrument
  * when ProfileGate's buckets are too coarse.
  * Usage: StackDump <sfDir> <name> */
object StackDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    val gateThread = Thread.currentThread()
    val hist = mutable.Map.empty[String, Int].withDefaultValue(0)
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = gateThread.getStackTrace
        if (st.nonEmpty) {
          val key = st.take(25).map(f =>
            f.getClassName.split("\\.").takeRight(2).mkString(".") + "." +
              f.getMethodName).mkString(" <- ")
          hist.synchronized { hist(key) += 1 }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false; sampler.join()
    val total = hist.values.sum.max(1)
    println(f"==== $name warm=$wall%.2f s, $total samples")
    hist.toSeq.sortBy(-_._2).take(12).foreach { case (k, n) =>
      println(f"-- ${n * 100.0 / total}%5.1f%% --")
      k.split(" <- ").foreach(f => println(s"    $f"))
    }
    spark.stop()
  }
}
