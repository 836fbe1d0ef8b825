package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import scala.collection.mutable

/** Job-level + driver-side profile of one gate — the breakdown the full
  * Bench can't give (one number per gate) and the UI can't either
  * (spark.ui.enabled=false in GraftSession). Two instruments:
  *
  *  1. a SparkListener counting jobs and summing their wall (executor
  *     work happens inside jobs; everything else is driver time);
  *  2. a sampling profiler on the gate's calling thread (10 ms period)
  *     bucketing stacks into coarse driver-cost families: query
  *     planning/optimization, codegen+Janino compile, Hadoop FS
  *     metadata (list/rename/open), parquet footer reads, DataSource
  *     file-index refresh, and await-job (idle while executors run).
  *
  * Optimization-round tooling: find whether a fixture-heavy gate's
  * seconds go to tasks, to planning, or to filesystem churn before
  * touching any code. Usage: ProfileGate <sfDir> <name>[,<name>...] */
object ProfileGate {

  private def bucket(stack: Array[StackTraceElement]): String = {
    // first recognizable frame wins, scanning from the top
    val s = stack.map(_.getClassName)
    def has(p: String) = s.exists(_.startsWith(p))
    if (s.exists(c => c.contains("DAGScheduler") || c.contains("JobWaiter")) &&
        s.headOption.exists(c => c.startsWith("java.lang.Object") ||
          c.startsWith("jdk.internal.misc")))
      "await-job (executors busy)"
    else if (has("org.codehaus.janino") || has("org.apache.spark.sql.catalyst.expressions.codegen"))
      "codegen+janino"
    else if (has("org.apache.parquet.hadoop.ParquetFileReader") ||
             has("org.apache.parquet.format"))
      "parquet footers"
    else if (has("org.apache.spark.sql.execution.datasources.InMemoryFileIndex") ||
             has("org.apache.spark.util.HadoopFSUtils"))
      "file listing (InMemoryFileIndex)"
    else if (has("org.apache.hadoop.fs"))
      "hadoop fs ops"
    else if (has("org.apache.spark.sql.catalyst.optimizer") ||
             has("org.apache.spark.sql.catalyst.analysis") ||
             has("org.apache.spark.sql.catalyst.rules") ||
             has("org.apache.spark.sql.catalyst.trees") ||
             has("org.apache.spark.sql.catalyst.plans"))
      "catalyst plan/analyze/optimize"
    else if (has("org.apache.spark.sql.execution.adaptive"))
      "AQE re-planning"
    else if (has("org.apache.spark.sql"))
      "spark.sql other"
    else if (s.headOption.exists(c => c.startsWith("java.lang.Object") ||
               c.startsWith("jdk.internal.misc") || c.startsWith("java.util.concurrent")))
      "wait/park other"
    else "other"
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    case class Job(id: Int, var desc: String, var t0: Long = 0L, var t1: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, d, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val tw0 = System.nanoTime()
      fn(spark, sfDir).count() // warm run; profile the warm (best-of-N) shape
      val tw = (System.nanoTime() - tw0) / 1e9
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val gateThread = Thread.currentThread()
      val hist = mutable.Map.empty[String, Int].withDefaultValue(0)
      @volatile var sampling = true
      val frames = mutable.Map.empty[String, Int].withDefaultValue(0)
      val sampler = new Thread(() => {
        while (sampling) {
          val st = gateThread.getStackTrace
          if (st.nonEmpty) hist.synchronized {
            hist(bucket(st)) += 1
            // deepest "interesting" frame: first spark/janino/hadoop frame
            // below any thread/wait noise — names the actual hot method
            st.find { f =>
              val c = f.getClassName
              (c.startsWith("org.apache.spark.sql.catalyst") ||
               c.startsWith("org.apache.spark.sql.execution") ||
               c.startsWith("org.apache.hadoop") ||
               c.startsWith("org.codehaus.janino") ||
               c.startsWith("org.apache.parquet")) &&
              !f.getMethodName.contains("$")
            }.foreach { f =>
              frames(f.getClassName.split("\\.").takeRight(2).mkString(".") +
                "." + f.getMethodName) += 1
            }
          }
          Thread.sleep(10)
        }
      })
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false; sampler.join()
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200)
      val jobWall = jobs.synchronized {
        jobs.values.map(j => (j.t1 - j.t0).max(0L)).sum / 1e3 }
      val nJobs = jobs.synchronized { jobs.size }
      println(f"==== $name cold=$tw%.2f warm=$wall%.2f s jobs=$nJobs jobWall=$jobWall%.2f")
      val total = hist.values.sum.max(1)
      hist.toSeq.sortBy(-_._2).foreach { case (b, n) =>
        println(f"  ${b}%-40s ${n * 100.0 / total}%5.1f%%  (~${n * 0.01 * wall / (total * 0.01)}%5.2f s)")
      }
      // top job descriptions by cumulated wall
      val byDesc = jobs.synchronized {
        jobs.values.toSeq.groupBy(_.desc).map { case (d, js) =>
          (d, js.map(j => (j.t1 - j.t0).max(0L)).sum / 1e3, js.size) }
          .toSeq.sortBy(-_._2).take(12) }
      byDesc.foreach { case (d, sec, n) =>
        println(f"  job ${d.take(70)}%-70s $sec%6.2f s x$n%d")
      }
      println("  -- hot driver frames --")
      frames.toSeq.sortBy(-_._2).take(15).foreach { case (f, n) =>
        println(f"  ${n * 100.0 / total}%5.1f%%  $f")
      }
    }
    spark.stop()
  }
}
