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
    TopKStore.appendBatch(batchRows, Seq.empty, "v", "day", p, batchId = 0L)
    // x: lb 10, covered 3/3 -> exact 10; y: lb 8, covered 2 -> ub 9
    val expect = Seq(("x", 10L, 10L, true), ("y", 8L, 9L, false),
      ("z", 4L, 6L, false))
    assert(served(p, 3) === expect)
    TopKStore.appendBatch(batchRows, Seq.empty, "v", "day", p, batchId = 0L)
    assert(served(p, 3) === expect, "slot replay must overwrite, not add")
    TopKStore.compact(spark, p)
    assert(served(p, 3) === expect, "compaction must not move any bound")
    assert(RunSlots.foldedRuns(spark, s"$p/topk").contains("b0"))
    TopKStore.appendBatch(batchRows, Seq.empty, "v", "day", p, batchId = 0L)
    assert(served(p, 3) === expect, "folded replay must be a no-op")
    // a FRESH batch still lands and shifts bounds
    TopKStore.appendBatch(batchRows, Seq.empty, "v", "day", p, batchId = 1L)
    assert(served(p, 1) === Seq(("y", 13L, 14L, false)))
  }

  test("append rejects the legacy seed tag so instances can never collide") {
    val p = mk()
    val e = intercept[IllegalArgumentException] {
      TopKStore.append(batchRows, Seq.empty, "v", "day", p, runId = "base")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("pruneCompact: hand-pinned Misra-Gries merge, bounds valid and widened deterministically") {
    // part d1 only: seed x:5 y:3 z:2 w:1 (m=2 keeps x:5,y:3; cut=2),
    // append b0 z:5 q:4 x:1 (keeps z:5,q:4; cut=1)
    val p = Files.createTempDirectory("graft_topk_pr_").toString
    TopKStore.write(expand("d1", "x" -> 5, "y" -> 3, "z" -> 2, "w" -> 1)
      .toDF("day", "v"), Seq.empty, "v", "day", p, m = 2)
    TopKStore.appendBatch(expand("d1", "z" -> 5, "q" -> 4, "x" -> 1)
      .toDF("day", "v"), Seq.empty, "v", "day", p, batchId = 0L)
    // pre-prune: C=3; x lb5 ub6, z lb5 ub7, q lb4 ub6, y lb3 ub4
    assert(served(p, 4) === Seq(("x", 5L, 6L, false), ("z", 5L, 7L, false),
      ("q", 4L, 6L, false), ("y", 3L, 4L, false)))

    TopKStore.pruneCompact(spark, p)
    // merge per part: cands x(5,slack1) z(5,slack2) q(4,slack2)
    // y(3,slack1); rank (cnt desc, v asc) keeps x,z; excluded max
    // (cnt+slack) = q:6 -> cut' = max(C=3, 6) = 6
    // store shrank to ONE instance of m rows
    val rows = spark.read.parquet(s"$p/topk")
    assert(rows.count() === 2L)
    assert(rows.select("inst").distinct().collect().map(_.getString(0))
      .toSeq === Seq("(pruned)"))
    // serve: x lb5 ub 5+1+6-6=6, z lb5 ub 5+2+6-6=7 — true counts are
    // x=6, z=5 by construction, so lb <= true <= ub holds for both
    assert(served(p, 3) === Seq(("x", 5L, 6L, false), ("z", 5L, 7L, false)))

    // a fresh append onto the pruned part still merges by the algebra:
    // b1 y:5 (kept, cut 0) -> y lb5 ub 5+0+6-6+... covered 0 -> ub 11;
    // x lb5 slack1 covered6 total6 -> ub6 (true 6)
    TopKStore.appendBatch(expand("d1", "y" -> 5).toDF("day", "v"),
      Seq.empty, "v", "day", p, batchId = 1L)
    assert(served(p, 3) === Seq(("x", 5L, 6L, false), ("y", 5L, 11L, false),
      ("z", 5L, 7L, false)))
  }

  test("pruneCompact is idempotent on an already-pruned part") {
    val p = mk() // one instance per part: prune must not move bounds
    val before = served(p, 3)
    TopKStore.pruneCompact(spark, p)
    assert(served(p, 3) === before,
      "single-instance parts lose nothing: kept rows exact, cut'=C=cut")
    TopKStore.pruneCompact(spark, p)
    assert(served(p, 3) === before, "re-pruning a pruned store is stable")
  }

  test("grouped pruneCompact keeps per-group instance cuts distinct") {
    val rows = (expand("d1", "a" -> 3, "b" -> 2, "c" -> 1)
        .map { case (d, v) => (d, "g1", v) } ++
      expand("d1", "c" -> 4, "a" -> 1).map { case (d, v) => (d, "g2", v) })
      .toDF("day", "grp", "v")
    val p = Files.createTempDirectory("graft_topk_prg_").toString
    TopKStore.write(rows, Seq("grp"), "v", "day", p, m = 1)
    TopKStore.appendBatch(
      expand("d1", "b" -> 5).map { case (d, v) => (d, "g1", v) }
        .toDF("day", "grp", "v"),
      Seq("grp"), "v", "day", p, batchId = 0L)
    TopKStore.pruneCompact(spark, p)
    val got = TopKStore.topK(spark, p, Seq("grp"), 1)
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    // g1: seed kept a:3 cut2; b0 kept b:5 cut0. merge: C=2,
    // cands a(3,slack 2-2=0... covered(a)=2 -> slack=0) wait: covered
    // of a = cut of instances keeping a = 2 -> slack = 2-2 = 0;
    // b(5, covered 0 -> slack 2). rank: b5 > a3 -> keep b (m=1);
    // excluded a: 3+0=3 -> cut' = max(2,3) = 3.
    // serve g1: b lb5 ub 5+2+3-3 = 7
    // g2: single instance kept c:4 cut1 -> unchanged: c lb4 ub4 exact
    assert(got === Set(("g1", "b", 5L, 7L, false), ("g2", "c", 4L, 4L, true)))
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

  // fixture recap (mk): d1/base keeps x:5 y:3 (cut 2, z:2 w:1 excluded);
  // d2/base keeps x:4 z:4 (cut 1, q:1 excluded)

  test("dropKeys: hand-pinned merge — dropped value gone, surviving bounds stay valid") {
    val p = mk()
    TopKStore.dropKeys(spark, p, Seq("x").toDF("v"), "v")
    // both parts touched (x kept in both) -> each merges to (pruned):
    // d1: candidates y:3 (covered 2, C 2 -> slack 0), cut=max(2,·)=2
    // d2: candidates z:4 (covered 1, C 1 -> slack 0), cut=max(1,·)=1
    // serve: total_cut 3; z: lb 4 ub 4+3-1=6; y: lb 3 ub 3+3-2=4
    assert(served(p, 3) === Seq(("z", 4L, 6L, false), ("y", 3L, 4L, false)))
    // bounds stay TRUE bounds: true y = 3 <= 4, true z = 6 <= 6
  }

  test("dropKeys: untouched parts ride verbatim with their instances intact") {
    val p = mk()
    // y is kept only in d1 -> d2 is untouched and keeps its base rows
    TopKStore.dropKeys(spark, p, Seq("y").toDF("v"), "v")
    val insts = spark.read.parquet(s"$p/topk")
      .select("part", "inst").distinct()
      .as[(String, String)].collect().toSet
    assert(insts === Set(("d1", "(pruned)"), ("d2", "(base)")),
      "only the touched part may be re-merged")
    // x's bound is unchanged by the drop: lb 9 covered 3/3 -> exact
    assert(served(p, 3) === Seq(("x", 9L, 9L, true), ("z", 4L, 6L, false)))
  }

  test("dropKeys: a part losing EVERY kept value leaves a ghost cut-carrier — window ubs stay valid") {
    val p = mk()
    // drop x and y: d1 keeps nothing (z:2 w:1 were never stored), but
    // its C=2 must keep counting or z's window ub would fall to 4
    // BELOW its true count 6 (z:2 hidden in d1's tail + z:4 in d2)
    TopKStore.dropKeys(spark, p, Seq("x", "y").toDF("v"), "v")
    assert(served(p, 3) === Seq(("z", 4L, 6L, false)),
      "ub must still cover occurrences hidden behind d1's cut")
    val ghost = spark.read.parquet(s"$p/topk")
      .filter(col("cnt") === 0L)
      .select("part", "value", "cut")
      .as[(String, String, Long)].collect().toSeq
    assert(ghost === Seq(("d1", "", 2L)),
      "the emptied part carries its summed cut in a cnt=0 row")
    // the ghost is never served, even with room
    assert(!served(p, 10).map(_._1).contains(""))
    // and survives a later pruneCompact (still merge-safe)
    TopKStore.pruneCompact(spark, p)
    assert(served(p, 3) === Seq(("z", 4L, 6L, false)),
      "pruneCompact over a ghost-carrying store must not move bounds")
  }

  test("dropKeys on a store never containing the value is a plain fold") {
    val p = mk()
    val before = served(p, 4)
    TopKStore.dropKeys(spark, p, Seq("nope").toDF("v"), "v")
    assert(served(p, 4) === before, "no touched part -> bounds unchanged")
  }
}
