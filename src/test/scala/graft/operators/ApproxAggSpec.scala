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

  test("heavyHittersAudit: exact heads, deterministic ties, CMS bounds hold") {
    val sp = spark
    import sp.implicits._
    val data = (Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ Seq.fill(50)("ab") ++
      (1 to 30).map(i => s"rare_$i")).toDF("v")
    val got = ApproxAgg.heavyHittersAudit(data, "v", k = 3)
      .as[(String, Long, Boolean)].collect()
    // count desc, value asc on the tie: a(100), ab(50), b(50)
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", 100L), ("ab", 50L), ("b", 50L)))
    assert(got.forall(_._3), "CMS estimate must bracket the true count")
  }
}
