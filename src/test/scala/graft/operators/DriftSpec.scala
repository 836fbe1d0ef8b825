package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataQuality.distributionDrift: exact per-mille proportions and the
  * integer χ²-style contribution, hand-computed. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("hand computation incl. a vanished and a new category") {
    // ref: a×6, b×4 (total 10); cur: a×3, c×7 (total 10)
    val ref = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).toDF("k")
    val cur = (Seq.fill(3)("a") ++ Seq.fill(7)("c")).toDF("k")
    val d = DataQuality.distributionDrift(ref, cur, "k")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // pm: a 600 vs 300 -> (300^2*1000)/900 = 100000
    assert(d("a") === ((6L, 3L, 600L, 300L, 100000L)))
    // b vanished: (400-0)^2*1000/400 = 400000
    assert(d("b") === ((4L, 0L, 400L, 0L, 400000L)))
    // c new: (0-700)^2*1000/700 = 700000
    assert(d("c") === ((0L, 7L, 0L, 700L, 700000L)))
  }

  test("identical windows drift zero") {
    val w = Seq("x", "x", "y").toDF("k")
    val d = DataQuality.distributionDrift(w, w, "k")
    assert(d.agg(sum("drift_contrib")).first().getLong(0) === 0L)
  }

  test("an empty window refuses loudly") {
    val w = Seq("x").toDF("k")
    val e = intercept[IllegalArgumentException] {
      DataQuality.distributionDrift(w, w.filter(lit(false)), "k")
    }
    assert(e.getMessage.contains("empty window"))
  }
}
