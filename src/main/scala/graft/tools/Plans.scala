package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump physical plans for the plan-review pass: pushdown, pruning,
  * broadcast, codegen spans. Usage: runMain graft.tools.Plans [names...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val wanted = if (args.isEmpty) Set("q1_lineitem_agg", "q3_top_revenue",
      "a1_window_filter", "a3_partitions_distinct", "ann_topk_brute")
    else args.toSet
    graft.Queries.all.filter(q => wanted.contains(q.name)).foreach { q =>
      println(s"\n======== ${q.name} ========")
      try println(q.fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
