package graft.tools

/** Dump `.explain("formatted")` of each named gate's RETURNED frame to
  * `<outDir>/<name>_<tag>.txt` — the plans/r18 before/after evidence
  * (run once on the pre-round tree with tag=before via a git worktree,
  * once on the optimized tree with tag=after). The returned frame is
  * the gate's oracle-graded output; gates whose optimization lives in
  * fixture/maintenance INTERNALS additionally get the internal shapes
  * documented in OPTIMIZATION_r18.md (ProbePlanSize, ProfileGate).
  * Usage: PlanDump <sfDir> <outDir> <tag> <name>[,<name>...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, tag, names) =
      (args(0), args(1), args(2), args(3).split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder(s"local[$cpus]", Some(cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $name -> ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
