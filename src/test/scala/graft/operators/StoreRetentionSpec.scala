package graft.operators

import graft.SparkSpec
import graft.llm.RunSlots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** StoreRetention: part leaves removed whole across slots and layouts,
  * idempotent, manifest untouched, wrong paths refused. */
class StoreRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("d1", "a", 5L), ("d2", "a", 15L), ("d3", "a", 25L), ("d3", "b", 35L)
  ).toDF("day", "grp", "v")

  test("slotted store: live-slot target refused; after compact the drop sticks under replay") {
    val p = Files.createTempDirectory("graft_ret_").toString
    QuantileStore.write(rows.filter(col("day") === "d1"),
      Seq("grp"), "v", "day", p, width = 10L)
    QuantileStore.appendBatch(rows.filter(col("day") =!= "d1"),
      Seq("grp"), "v", "day", p, batchId = 0L)
    // d2 lives under the LIVE slot run=b0: a replay of b0 would
    // statically rewrite the whole slot and re-land the dropped part —
    // the call must refuse with the compact-first remedy (ADVICE r13)
    val e = intercept[IllegalArgumentException] {
      StoreRetention.dropParts(spark, s"$p/quant", Seq("d1", "d2"))
    }
    assert(e.getMessage.contains("live run slot") &&
      e.getMessage.contains("b0"))
    // a base-only target is NOT blocked by the live slot (d1 is folded)
    assert(StoreRetention.dropParts(spark, s"$p/quant", Seq("d1")) === 1)
    // remedy path: compact folds b0 into __base__, then the drop works
    QuantileStore.compact(spark, p)
    assert(RunSlots.foldedRuns(spark, s"$p/quant").contains("b0"))
    val n = StoreRetention.dropParts(spark, s"$p/quant", Seq("d2"))
    assert(n === 1, s"d2 in folded base = 1 part dir, got $n")
    val served = QuantileStore.counts(spark, p, Seq("grp"))
      .as[(String, Long, Long)].collect().toSet
    assert(served === Set(("a", 2L, 1L), ("b", 3L, 1L)),
      "only d3 rows survive")
    // idempotent: nothing left to drop
    assert(StoreRetention.dropParts(spark, s"$p/quant", Seq("d1")) === 0)
    // the dropped batch cannot resurrect: its id is folded
    QuantileStore.appendBatch(rows.filter(col("day") =!= "d1"),
      Seq("grp"), "v", "day", p, batchId = 0L)
    assert(QuantileStore.counts(spark, p, Seq("grp"))
      .as[(String, Long, Long)].collect().toSet === served)
  }

  test("a PARTIAL live slot refuses the drop even when it lacks the target part yet") {
    val p = Files.createTempDirectory("graft_ret_part_").toString
    QuantileStore.write(rows.filter(col("day") === "d1"),
      Seq("grp"), "v", "day", p, width = 10L)
    QuantileStore.appendBatch(rows.filter(col("day") === "d3"),
      Seq("grp"), "v", "day", p, batchId = 0L)
    // b0 "crashed" mid-write: marker gone. Its replay rewrites the
    // whole slot and could create part=d1 right after a drop deleted
    // it from the base — content is unknown until _SUCCESS
    val marker = new org.apache.hadoop.fs.Path(s"$p/quant/run=b0/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(marker, false))
    val e = intercept[IllegalArgumentException] {
      StoreRetention.dropParts(spark, s"$p/quant", Seq("d1"))
    }
    assert(e.getMessage.contains("_SUCCESS") && e.getMessage.contains("b0"),
      e.getMessage)
    // the replay lands the slot whole; compact folds it; then it works
    QuantileStore.appendBatch(rows.filter(col("day") === "d3"),
      Seq("grp"), "v", "day", p, batchId = 0L)
    QuantileStore.compact(spark, p)
    assert(StoreRetention.dropParts(spark, s"$p/quant", Seq("d1")) === 1)
  }

  test("flat store: part dir dropped from the root") {
    val p = Files.createTempDirectory("graft_ret_fl_").toString
    BloomStore.write(Seq(("d1", "x"), ("d2", "y")).toDF("day", "k"),
      "k", "day", p, depth = 4, width = 1 << 16)
    assert(StoreRetention.dropParts(spark, p, Seq("d1")) === 1)
    val v = BloomStore.mightContain(spark, p, Seq("x", "y").toDF("k"), "k")
      .as[(String, Boolean)].collect().toMap
    assert(v === Map("x" -> false, "y" -> true),
      "d1's key is gone, d2's survives")
  }

  test("wrong path refused; empty value list refused") {
    val p = Files.createTempDirectory("graft_ret_no_").toString
    new java.io.File(p, "data").mkdirs()
    val e = intercept[IllegalArgumentException] {
      StoreRetention.dropParts(spark, p, Seq("d1"))
    }
    assert(e.getMessage.contains("neither run= slots nor part="))
    intercept[IllegalArgumentException] {
      StoreRetention.dropParts(spark, p, Seq.empty)
    }
  }
}
