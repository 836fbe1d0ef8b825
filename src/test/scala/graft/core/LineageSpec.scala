package graft.core

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Lineage.cut's fault-tolerance posture knob: default = local
  * checkpoint (historical behavior, nothing written anywhere), and
  * `spark.graft.checkpoint.dir` switches every cut — CC's pair/edge
  * inputs and per-round labels included — to RELIABLE checkpoints under
  * that directory, with bit-identical results. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def chain = (1L until 9L).map(i => (i, i + 1))
    .filter(_._1 != 4L).toDF("u", "v") // two components: {1..4}, {5..9}

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toMap

  test("reliable-checkpoint posture: same labels, files land under the dir") {
    val local = labelsOf(ConnectedComponents.run(chain, "u", "v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lineage_ck_").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val reliable = labelsOf(ConnectedComponents.run(chain, "u", "v"))
      assert(reliable === local, "posture must not change results")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0
      while (files.hasNext) { files.next(); n += 1 }
      assert(n > 0, "reliable checkpoints must write under the dir")
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
    // and the default posture still works after unsetting
    assert(labelsOf(ConnectedComponents.run(chain, "u", "v")) === local)
  }
}
