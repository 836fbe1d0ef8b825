package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cut for multi-referenced iteration intermediates (the CC /
  * PageRank per-round vectors and their edge inputs) with a CLUSTER
  * FAULT-TOLERANCE posture knob.
  *
  * Default: `localCheckpoint` — blocks live unreplicated on executors,
  * which is the right local/bench trade (no distributed write per
  * iteration) but means one executor loss mid-iteration costs a full
  * job rerun at cluster scale (r18 verdict "What's wrong #2").
  *
  * Posture: set `spark.graft.checkpoint.dir` to a reliable location
  * (HDFS/object store) and every cut becomes a RELIABLE
  * `Dataset.checkpoint` there — an executor loss replays from the
  * checkpoint files instead of rerunning the whole iteration chain.
  * The knob is session-wide configuration, not code: a 100 TB CC or
  * PageRank run opts in without touching operators, and the bench /
  * local default is byte-identical to the historical behavior.
  *
  * Both forms are EAGER (the operators' contract: the cut is also the
  * materialization barrier their unpersist/convergence logic relies
  * on) and both truncate the logical plan to one leaf — the
  * multi-reference AQE re-render fix is posture-independent. */
object Lineage {

  // the conf value this JVM last applied via setCheckpointDir (Spark
  // appends a UUID subdir, so the context's own getCheckpointDir can't
  // be compared back to the conf string)
  @volatile private var appliedDir: String = null

  /** Cut `df`'s lineage eagerly: reliable checkpoint when
    * `spark.graft.checkpoint.dir` is set, localCheckpoint otherwise. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.dir") match {
      case Some(dir) if dir.nonEmpty =>
        if (appliedDir != dir) synchronized {
          if (appliedDir != dir) {
            spark.sparkContext.setCheckpointDir(dir)
            appliedDir = dir
          }
        }
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
