package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.mutable

/** Per-gate Catalyst cost accounting from Spark's own
  * QueryPlanningTracker: one row per executed query (action) with its
  * analysis/optimization/planning phase durations, aggregated per gate.
  * Complements ProfileGate's stack sampler — the tracker misses AQE
  * re-optimization (which happens during execution), but pins exactly
  * how many query executions a gate runs and what each pays before its
  * first task. Usage: PlanCost <sfDir> <name>[,<name>...] */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    case class Rec(phases: Map[String, Long], nodes: Int)
    val recs = mutable.ArrayBuffer.empty[Rec]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = recs.synchronized {
        val ph = qe.tracker.phases.map { case (k, v) =>
          k -> (v.endTimeMs - v.startTimeMs) }.toMap
        recs += Rec(ph, qe.optimizedPlan.collect { case p => p }.size)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      recs.synchronized(recs.clear())
      spark.listenerManager.register(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.listenerManager.unregister(listener)
      val rs = recs.synchronized(recs.toVector)
      val keys = rs.flatMap(_.phases.keys).distinct.sorted
      println(f"==== $name warm=$wall%.2f s  executions=${rs.size}")
      keys.foreach { k =>
        val tot = rs.map(_.phases.getOrElse(k, 0L)).sum
        println(f"  phase $k%-16s total=${tot / 1000.0}%7.2f s  " +
          f"mean=${if (rs.nonEmpty) tot.toDouble / rs.size else 0}%6.1f ms")
      }
      val topN = rs.map(r => r.phases.values.sum).sorted.reverse.take(10)
      println(s"  top-10 per-execution totals (ms): ${topN.mkString(", ")}")
      println(f"  mean plan nodes: ${if (rs.nonEmpty) rs.map(_.nodes).sum.toDouble / rs.size else 0}%.1f  max: ${if (rs.nonEmpty) rs.map(_.nodes).max else 0}")
    }
    spark.stop()
  }
}
