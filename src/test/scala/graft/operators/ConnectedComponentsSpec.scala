package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two components resolve to their min ids") {
    assert(cc(Seq(1L -> 2L, 2L -> 3L, 5L -> 6L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("a long path converges (diameter > 2 needs multiple rounds)") {
    val path = (1L until 9L).map(i => i -> (i + 1))
    assert(cc(path) === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("star and direction-insensitivity: labels flow against edge direction") {
    // all edges point AT the hub; min sits on a leaf
    assert(cc(Seq(7L -> 100L, 8L -> 100L, 3L -> 100L)) ===
      Map(3L -> 3L, 7L -> 3L, 8L -> 3L, 100L -> 3L))
  }

  test("nodes without edges are absent (documented contract)") {
    val got = cc(Seq(1L -> 2L))
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("empty pair list yields an empty labeling, not a crash") {
    assert(cc(Seq.empty) === Map.empty)
  }

  // ---- incremental ------------------------------------------------------

  private def incr(old: Seq[(Long, Long)], batch: Seq[(Long, Long)]): Map[Long, Long] = {
    val labels = ConnectedComponents.run(old.toDF("a", "b"), "a", "b")
    ConnectedComponents.incremental(labels, batch.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("incremental: batch merging two old components equals full recompute") {
    val old = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L)
    val batch = Seq(3L -> 10L) // bridges {1,2,3} and {10,11}
    assert(incr(old, batch) === cc(old ++ batch))
    // untouched component keeps its label
    assert(incr(old, batch)(21L) === 20L)
  }

  test("incremental: brand-new nodes and new-to-old attachments") {
    val old = Seq(5L -> 6L)
    val batch = Seq(100L -> 101L, 6L -> 200L, 1L -> 6L) // new comp + growth + new min
    assert(incr(old, batch) === cc(old ++ batch))
    // the new node 1 becomes the merged component's min label
    assert(incr(old, batch)(5L) === 1L)
  }

  test("incremental: empty batch is the identity") {
    val old = Seq(1L -> 2L, 7L -> 8L)
    assert(incr(old, Seq.empty) === cc(old))
  }

  test("incremental: chain of merges across several old components") {
    val old = (0 until 5).flatMap(k =>
      Seq((k * 10 + 1).toLong -> (k * 10 + 2).toLong,
        (k * 10 + 2).toLong -> (k * 10 + 3).toLong))
    val batch = Seq(3L -> 11L, 13L -> 21L, 33L -> 41L) // merge 0-1-2 and 3-4
    assert(incr(old, batch) === cc(old ++ batch))
  }
}
