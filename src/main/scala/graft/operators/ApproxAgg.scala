package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based aggregation with built-in accuracy audits.
  *
  * At 100 TB, exact COUNT(DISTINCT) is a full shuffle of every distinct
  * value and exact percentiles are a global sort; the sketch forms
  * (HyperLogLog++, Greenwald-Khanna) are constant memory per group and
  * merge associatively — they partial-aggregate map-side like any sum, so
  * the shuffle carries one sketch per group per mapper instead of the
  * data. Production pipelines run the sketch alone; the `*Audit` forms
  * compute sketch and exact side by side and flag divergence — the shape
  * used for gating/QA runs at a small scale factor before trusting the
  * sketch at full scale.
  */
object ApproxAgg {

  /** Per group: exact distinct count, HLL++ estimate, and whether the
    * estimate lands within `relTol` of exact. */
  def distinctAudit(
      df: DataFrame, groups: Seq[String], valueCol: String,
      rsd: Double = 0.02, relTol: Double = 0.05): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(
        countDistinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("n_approx"))
      .withColumn("hll_ok",
        abs(col("n_approx") - col("n_exact")).cast("double") <=
          lit(relTol) * col("n_exact"))

  /** Heavy hitters with a Count-Min audit: the exact top-k values of
    * `valueCol` (count desc, value asc — deterministic ties) checked
    * against a Count-Min sketch built in ONE distributed pass
    * (`df.stat.countMinSketch` — per-partition sketches merged
    * associatively, the mergeable-summary shape that replaces a full
    * count-groupBy when only the heads matter at 100 TB).
    *
    * Audit per hitter: `cms_ok` = the estimate is >= the true count (CMS
    * never underestimates — a structural guarantee) AND <= true + eps*N
    * (the sketch's width bound; holds with prob. `confidence`, and
    * deterministically for a fixed seed once measured at gate scale).
    * Production runs keep the sketch and drop the exact pass; the audit
    * form is the small-SF gate run before trusting it. */
  def heavyHittersAudit(
      df: DataFrame, valueCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    // NULLs: the sketch never counts them (stat.countMinSketch skips
    // null inputs), so they must not reach the exact side either — and
    // estimateCount(null) would NPE
    val nn = df.filter(col(valueCol).isNotNull)
    val cms = nn.stat.countMinSketch(valueCol, eps, confidence, seed)
    val spark = df.sparkSession
    // the sketch already holds N — no separate count() pass over the data
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val exact = nn.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("value"))
      .limit(k)
      .collect() // k rows — bounded driver state
    val rows = exact.toSeq.map { r =>
      val v = r.get(0)
      val ne = r.getLong(1)
      val est = cms.estimateCount(v)
      (v.toString, ne, est >= ne && est <= ne + bound)
    }
    import spark.implicits._
    rows.toDF("value", "n_exact", "cms_ok")
  }

  /** Per group, for each requested percentile p: the exact
    * (interpolating) percentile `exact_p<P>`, the sketch estimate
    * `approx_p<P>`, and `ok_p<P>` = within `relTol` relative error. */
  def quantileAudit(
      df: DataFrame, groups: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000, relTol: Double = 0.05): DataFrame = {
    require(ps.nonEmpty, "quantileAudit: at least one percentile required")
    def tag(p: Double): Int = math.round(p * 100).toInt
    val aggs = ps.flatMap { p =>
      Seq(
        expr(s"percentile($valueCol, ${p}d)").as(s"exact_p${tag(p)}"),
        expr(s"approx_percentile($valueCol, ${p}d, $accuracy)").as(s"approx_p${tag(p)}"))
    }
    val base = df.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
    ps.foldLeft(base) { (acc, p) =>
      acc.withColumn(s"ok_p${tag(p)}",
        abs(col(s"approx_p${tag(p)}") - col(s"exact_p${tag(p)}")) <=
          lit(relTol) * abs(col(s"exact_p${tag(p)}")))
    }
  }
}
