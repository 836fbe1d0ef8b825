package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank: hand-computed fixed-point iteration on a 4-node graph with
  * a dangling node, plus full parity vs a driver-side reference on a
  * larger random-ish graph. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // 1→2, 2→1, 3→1, 3→4; node 4 is dangling
  private val toyEdges = Seq((1L, 2L), (2L, 1L), (3L, 1L), (3L, 4L))

  test("one iteration matches the hand computation (dangling mass, truncation)") {
    val edges = toyEdges.toDF("src", "dst")
    val r = PageRank.rank(edges, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // per-node scale: r0 = 1e6 each (total 4e6); dangling mass 1e6 ->
    // dm 250000; base 150000; in: v1=1.5e6, v2=1e6, v3=0, v4=0.5e6
    assert(r === Map(1L -> 1637500L, 2L -> 1212500L, 3L -> 362500L, 4L -> 787500L))
    assert(r.values.sum === 4000000L) // no mass lost on this graph
  }

  /** Driver-side reference: the documented recurrence in plain Scala;
    * `seeds` switches to the personalized base/dangling placement. */
  private def referenceRank(edges: Seq[(Long, Long, Long)], iters: Int,
                            dampNum: Long = 85, dampDen: Long = 100,
                            scale: Long = 1000000L,
                            seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val ea = edges.groupBy(e => (e._1, e._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    val outw = ea.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (ea.map(_._1) ++ ea.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val present = seeds.map(_.intersect(nodes.toSet))
    val nBase = present.map(_.size.toLong).getOrElse(n)
    val isSeed = (v: Long) => present.forall(_.contains(v))
    val base = present match {
      case None => ((dampDen - dampNum) * scale) / dampDen
      case Some(_) => ((dampDen - dampNum) * scale * n) / (dampDen * nBase)
    }
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outw.contains).map(r).sum
      val dm = dang / nBase
      val in = ea.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => r(e._1) * e._3 / outw(e._1)).sum
      }
      r = nodes.map(v =>
        v -> ((if (isSeed(v)) base else 0L)
          + dampNum * (in.getOrElse(v, 0L) + (if (isSeed(v)) dm else 0L)) / dampDen)).toMap
    }
    r
  }

  test("multi-iteration parity vs the reference on a weighted graph") {
    // deterministic pseudo-random graph: 30 nodes, weighted edges,
    // several dangling sinks
    val edges = (for {
      s <- 1L to 24L
      k <- 1 to 3
    } yield (s, (s * 7 + k * 11) % 30 + 1, (s + k) % 5 + 1)).toSeq
    val df = edges.toDF("src", "dst", "w")
    val got = PageRank.rank(df, "src", "dst", Some("w"), iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val want = referenceRank(edges, iters = 6)
    assert(got === want)
  }

  test("rank mass is conserved up to deterministic truncation dust") {
    val edges = toyEdges.toDF("src", "dst")
    val r = PageRank.rank(edges, "src", "dst", iters = 10)
      .agg(sum("pr")).first().getLong(0)
    // each division can only LOSE mass; dust bounded by iters * (N + 2)
    assert(r <= 4000000L && r > 4000000L - 10 * 6)
  }

  test("personalized: hand computation with a single seed") {
    val edges = toyEdges.toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val r = PageRank.personalized(edges, seeds, "v", "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // base(1) = (15e6*4)//100 = 600000, others 0; dangling 1e6 all to
    // seed 1; in: v1=1.5e6 v2=1e6 v3=0 v4=0.5e6
    assert(r === Map(1L -> 2725000L, 2L -> 850000L, 3L -> 0L, 4L -> 425000L))
    assert(r.values.sum === 4000000L)
  }

  test("personalized: multi-iteration parity vs the seeded reference") {
    val edges = (for {
      s <- 1L to 24L
      k <- 1 to 3
    } yield (s, (s * 7 + k * 11) % 30 + 1, (s + k) % 5 + 1)).toSeq
    val df = edges.toDF("src", "dst", "w")
    val seedSet = Set(2L, 5L, 9L)
    val got = PageRank.personalized(df, seedSet.toSeq.toDF("v"), "v",
        "src", "dst", Some("w"), iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val want = referenceRank(edges, iters = 6, seeds = Some(seedSet))
    assert(got === want)
    // authority concentrates near the seeds: total seed mass beats a
    // uniform share
    val seedMass = seedSet.toSeq.map(got).sum
    assert(seedMass > 3L * 1000000L)
  }

  test("personalized: absent seeds are ignored; all-absent refuses") {
    val edges = toyEdges.toDF("src", "dst")
    val got = PageRank.personalized(edges, Seq(1L, 999L).toDF("v"), "v",
        "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val want = referenceRank(toyEdges.map(e => (e._1, e._2, 1L)), iters = 2,
      seeds = Some(Set(1L)))
    assert(got === want)
    val e = intercept[IllegalArgumentException] {
      PageRank.personalized(edges, Seq(999L).toDF("v"), "v", "src", "dst")
    }
    assert(e.getMessage.contains("no seed"))
  }

  test("non-positive weights and empty edge lists refuse loudly") {
    val zw = intercept[IllegalArgumentException] {
      PageRank.rank(Seq((1L, 2L, 0L)).toDF("src", "dst", "w"),
        "src", "dst", Some("w"))
    }
    assert(zw.getMessage.contains("positive"))
    val empty = intercept[IllegalArgumentException] {
      PageRank.rank(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    }
    assert(empty.getMessage.contains("empty edge list"))
  }

  test("tolL1 stops early: an enormous tolerance yields the 1-iteration result") {
    val edges = toyEdges.toDF("src", "dst")
    val one = PageRank.rank(edges, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val tol = PageRank.rank(edges, "src", "dst", iters = 10,
        tolL1 = Some(Long.MaxValue))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(tol === one)
  }

  test("a hub with heavy in-links outranks the periphery") {
    // everyone links to node 1; node 1 links to node 2. The 1⇄2 cycle
    // makes the power iteration oscillate with period 2 (damped by
    // 0.85/step) — 25 iterations are needed before the stationary
    // ordering (r1 ≈ 0.468 > r2 ≈ 0.412) emerges from a uniform start.
    val edges = ((2L to 10L).map(s => (s, 1L)) :+ (1L, 2L)).toDF("src", "dst")
    val r = PageRank.rank(edges, "src", "dst", iters = 25)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L))
    assert((3L to 10L).forall(v => r(2L) > r(v)))
  }

  test("rankWarm on an unchanged graph IS continued iteration: warm(3)+3 == cold 6") {
    val edges = Seq((1L,2L),(2L,3L),(3L,1L),(4L,1L),(2L,1L)).toDF("src", "dst")
    val cold6 = PageRank.rank(edges, "src", "dst", iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val warm = PageRank.rankWarm(edges,
        PageRank.rank(edges, "src", "dst", iters = 3),
        "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(warm === cold6)
  }

  test("rankWarm: nodes new to the grown graph start at the cold init") {
    val e1 = Seq((1L,2L),(2L,1L)).toDF("src", "dst")
    val e2 = Seq((1L,2L),(2L,1L),(9L,1L)).toDF("src", "dst") // 9 is new
    val prev = PageRank.rank(e1, "src", "dst", iters = 2)
    val warm = PageRank.rankWarm(e2, prev, "src", "dst", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // manual: r0 = (prev(1), prev(2), 1e6 for 9); one iteration of the
    // documented recurrence over e2
    val p = prev.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r0 = Map(1L -> p(1L), 2L -> p(2L), 9L -> 1000000L)
    val base = (15L * 1000000L) / 100L
    def it(r: Map[Long, Long]): Map[Long, Long] = {
      val contrib = Map(
        2L -> r(1L), // 1->2
        1L -> (r(2L) + r(9L))) // 2->1, 9->1
      r.keys.map(v => v -> (base + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    assert(warm === it(r0))
  }

  test("rankWarm converges in fewer iterations than cold on a grown graph") {
    // star graph grown by a few edges: warm start sits near the new
    // fixed point already
    val e1 = (2L to 40L).map(i => (i, 1L)) ++ Seq((1L, 2L))
    val e2 = e1 ++ Seq((41L, 1L), (42L, 1L), (1L, 3L))
    val prev = PageRank.rank(e1.toDF("src", "dst"), "src", "dst", iters = 30)
    def fixpoint = PageRank.rank(e2.toDF("src", "dst"), "src", "dst", iters = 40)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val fp = fixpoint
    def l1(m: Map[Long, Long]) = m.map { case (k, v) => math.abs(v - fp(k)) }.sum
    val coldK = PageRank.rank(e2.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val warmK = PageRank.rankWarm(e2.toDF("src", "dst"), prev, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(l1(warmK) < l1(coldK),
      s"warm start must be closer to the fixed point (warm ${l1(warmK)} vs cold ${l1(coldK)})")
  }
}
