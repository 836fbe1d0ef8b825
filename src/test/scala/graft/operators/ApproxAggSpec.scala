package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ApproxAggSpec extends SparkSpec {

  private lazy val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("distinctAudit: HLL estimate within tolerance on real data") {
    val rows = ApproxAgg.distinctAudit(ev, Seq("event_type"), "user_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"HLL off by >5% for ${r.getAs[String]("event_type")}: " +
          s"exact=${r.getAs[Long]("n_exact")} approx=${r.getAs[Long]("n_approx")}")
    }
  }

  test("distinctAudit: exact count is exact") {
    val got = ApproxAgg.distinctAudit(ev, Seq("event_type"), "user_id")
      .select("event_type", "n_exact")
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("quantileAudit: sketch within tolerance and exact matches percentile") {
    val rows = ApproxAgg.quantileAudit(ev, Seq("event_type"), "value",
      ps = Seq(0.5, 0.95)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok_p50") && r.getAs[Boolean]("ok_p95"))
      assert(r.getAs[Double]("exact_p50") <= r.getAs[Double]("exact_p95"))
    }
  }
}
