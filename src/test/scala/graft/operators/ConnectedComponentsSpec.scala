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
}
