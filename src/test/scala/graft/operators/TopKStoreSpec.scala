package graft.operators

import graft.SparkSpec
import graft.llm.RunSlots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** TopKStore: mergeable windowed heavy hitters — hand-pinned
  * Misra-Gries bound algebra, window pruning, run-slot exactly-once,
  * compaction invariance. */
class TopKStoreSpec extends SparkSpec {
  import spark.implicits._

  private def expand(part: String, vc: (String, Int)*) =
    vc.flatMap { case (v, c) => Seq.fill(c)((part, v)) }

  // instance d1/base: x:5 y:3 z:2 w:1 (m=2 keeps x,y; cut=2)
  // instance d2/base: x:4 z:4 q:1   (m=2 keeps x,z; cut=1)
  private def baseRows =
    (expand("d1", "x" -> 5, "y" -> 3, "z" -> 2, "w" -> 1) ++
      expand("d2", "x" -> 4, "z" -> 4, "q" -> 1)).toDF("day", "v")

  // appended instance d1/b0: y:5 x:1 (keeps both; cut=0)
  private def batchRows = expand("d1", "y" -> 5, "x" -> 1).toDF("day", "v")

  private def mk(): String = {
    val p = Files.createTempDirectory("graft_topk_").toString
    TopKStore.write(baseRows, Seq.empty, "v", "day", p, m = 2)
    p
  }

  private def served(p: String, k: Int, parts: Option[Seq[String]] = None) =
    TopKStore.topK(spark, p, Seq.empty, k, parts)
      .as[(String, Long, Long, Boolean)].collect().toSeq

  test("hand-pinned bound algebra: lb/ub/exact and guaranteed candidates") {
    val p = mk()
    // total_cut = 2 + 1 = 3
    // x: lb 9, covered 3 -> ub 9 exact (kept everywhere)
    // z: lb 4 (d2 only), covered 1 -> ub 6 (true 6: 2 hidden in d1's tail)
    // y: lb 3, covered 2 -> ub 4
    assert(served(p, 3) === Seq(
      ("x", 9L, 9L, true), ("z", 4L, 6L, false), ("y", 3L, 4L, false)))
    // any value with true count > total_cut (3) is present: z (6) is
    assert(served(p, 10).map(_._1).contains("z"))
    // window pruning: d1 alone — total_cut 2
    assert(served(p, 2, Some(Seq("d1"))) === Seq(
      ("x", 5L, 5L, true), ("y", 3L, 3L, true)))
  }

  test("appended instance merges; replay and folded replay cannot double-count") {
    val p = mk()
    TopKStore.append(batchRows, Seq.empty, "v", "day", p, runId = "b0")
    // x: lb 10, covered 3/3 -> exact 10; y: lb 8, covered 2 -> ub 9
    val expect = Seq(("x", 10L, 10L, true), ("y", 8L, 9L, false),
      ("z", 4L, 6L, false))
    assert(served(p, 3) === expect)
    TopKStore.append(batchRows, Seq.empty, "v", "day", p, runId = "b0")
    assert(served(p, 3) === expect, "slot replay must overwrite, not add")
    TopKStore.compact(spark, p)
    assert(served(p, 3) === expect, "compaction must not move any bound")
    assert(RunSlots.foldedRuns(spark, s"$p/topk") === Set("b0"))
    TopKStore.append(batchRows, Seq.empty, "v", "day", p, runId = "b0")
    assert(served(p, 3) === expect, "folded replay must be a no-op")
    // a FRESH batch still lands and shifts bounds
    TopKStore.append(batchRows, Seq.empty, "v", "day", p, runId = "b1")
    assert(served(p, 1) === Seq(("y", 13L, 14L, false)))
  }

  test("grouped top-k ranks within each group") {
    val rows = (expand("d1", "a" -> 3, "b" -> 1).map { case (d, v) => (d, "g1", v) } ++
      expand("d1", "c" -> 2, "a" -> 1).map { case (d, v) => (d, "g2", v) })
      .toDF("day", "grp", "v")
    val p = Files.createTempDirectory("graft_topk_g_").toString
    TopKStore.write(rows, Seq("grp"), "v", "day", p, m = 1)
    val got = TopKStore.topK(spark, p, Seq("grp"), 1)
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    // m=1 keeps only the top value per (part, grp); cuts: g1 -> 1, g2 -> 1
    assert(got === Set(("g1", "a", 3L, 3L, true), ("g2", "c", 2L, 2L, true)))
  }

  test("m is pinned in the sidecar and bounds survive store reads") {
    val p = mk()
    assert(TopKStore.readMeta(spark, p) === 2)
    // per-instance rows are <= m+... kept rows only: 2 per instance
    val rows = spark.read.parquet(s"$p/topk")
    assert(rows.groupBy("part", "inst").count()
      .agg(max("count")).first().getLong(0) <= 2L)
  }
}
