package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-core schema tests, Spark-first: the four generic data tests every
  * dbt project (including users of the reference library — its `tests/`
  * directory is the dbt-core hook — reference `dbt_project.yml:17`
  * declares `test-paths: ["tests"]`) runs against its models:
  *
  *  - `not_null`     — rows where the column IS NULL;
  *  - `unique`       — VALUES that occur more than once (dbt semantics:
  *    the test query groups by the column and keeps HAVING count > 1 —
  *    the violation count is duplicated values, not duplicated rows);
  *  - `accepted_values` — rows whose value is outside the allowed set
  *    (NULLs are NOT violations — dbt composes with not_null for that);
  *  - `relationships` — child rows whose non-null foreign key has no
  *    match in the parent (referential integrity; NULL fks pass, as in
  *    dbt and ANSI FK semantics).
  *
  * Each check compiles to one declarative aggregate the optimizer owns:
  *  - not_null / accepted_values are metadata-cheap scans — a single
  *    map-side-combinable `sum(when(...))` over the table, no shuffle
  *    beyond the 1-row final agg, and the scan they share is the
  *    column-pruned one (only the tested column is read);
  *  - unique is one hash-groupBy on the tested column (partial counts
  *    map-side, one exchange on the key — the minimum for exact
  *    duplicate detection at any scale);
  *  - relationships is a LEFT ANTI equi-join child->parent on the key —
  *    Catalyst broadcasts the parent when it is small (the dimension
  *    case) and falls back to a shuffled hash join for fact-to-fact.
  *
  * The report is the union of per-check 1-row aggregates — each check
  * stays an independent subtree (no common scan is forced, so a report
  * over N tables parallelizes into N independent stage DAGs).
  */
object DataQuality {

  /** One schema test: `kind` in {not_null, unique, accepted_values,
    * relationships}. `table`/`column` label the report row. */
  final case class Check(
      name: String,
      violations: DataFrame)

  /** Rows where `col` is null. */
  def notNull(df: DataFrame, colName: String): Check =
    Check(s"not_null:$colName",
      df.filter(col(colName).isNull).select(col(colName)))

  /** Duplicated VALUES of `col` (dbt `unique` semantics: group-by HAVING
    * count > 1; a value appearing 3 times is ONE violation). */
  def unique(df: DataFrame, colName: String): Check =
    Check(s"unique:$colName",
      df.groupBy(col(colName)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select(col(colName)))

  /** Rows whose `col` value is outside `allowed` (nulls pass). */
  def acceptedValues(df: DataFrame, colName: String,
                     allowed: Seq[Any]): Check =
    Check(s"accepted_values:$colName",
      df.filter(col(colName).isNotNull &&
          !col(colName).isin(allowed: _*))
        .select(col(colName)))

  /** Child rows whose non-null `fkCol` has no match in
    * `parent.pkCol` — the dbt `relationships` test. LEFT ANTI join:
    * the parent side deduplicates to its distinct keys first (anti
    * joins need only key existence, and the distinct build side is
    * what makes the broadcast branch viable for big-but-low-cardinality
    * parents). */
  def relationships(child: DataFrame, fkCol: String,
                    parent: DataFrame, pkCol: String): Check =
    Check(s"relationships:$fkCol->$pkCol",
      child.filter(col(fkCol).isNotNull).select(col(fkCol))
        .join(parent.select(col(pkCol).as(fkCol)).distinct(),
          Seq(fkCol), "left_anti"))

  /** The report: one row per check with its violation count, ordered by
    * check name — the artifact a `dbt test` run prints, as a table. */
  def report(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "dqReport: no checks given")
    checks.map { c =>
      c.violations.agg(count(lit(1)).as("violations"))
        .select(lit(c.name).as("check_name"),
          col("violations").cast("long"))
    }.reduce(_.unionByName(_)).orderBy("check_name")
  }

  /** One source table for [[freshness]]: report label, the table, its
    * loaded-at timestamp column, and its OWN thresholds (dbt configures
    * warn_after/error_after per source, not per run). */
  final case class FreshnessSource(name: String, df: DataFrame, tsCol: String,
                                   warnAfterSec: Long, errorAfterSec: Long) {
    require(warnAfterSec >= 0 && errorAfterSec >= warnAfterSec,
      s"freshness($name): need 0 <= warnAfterSec <= errorAfterSec")
  }

  /** `dbt source freshness`: per source, the newest loaded-at timestamp,
    * its age at `asOf`, and a pass/warn/error status against the
    * source's thresholds (dbt semantics: age strictly greater than the
    * threshold trips it; a source with NO rows is an error — silence is
    * staleness, not health). `asOf` is an explicit epoch-micros
    * parameter, not wall-clock: freshness runs must be reproducible and
    * testable, and a scheduler supplies its tick.
    *
    * Each source costs one column-pruned scan + a 1-row max aggregate
    * (map-side combinable, no shuffle beyond the final merge); the
    * report unions S single-row subtrees — independent stage DAGs, same
    * scale shape as [[report]]. */
  def freshness(sources: Seq[FreshnessSource], asOfUs: Long): DataFrame = {
    require(sources.nonEmpty, "freshness: no sources given")
    sources.map { s =>
      s.df.agg(max(col(s.tsCol).cast("timestamp")).as("max_loaded_at"))
        .select(
          lit(s.name).as("source_name"),
          unix_micros(col("max_loaded_at")).as("max_loaded_us"),
          (lit(asOfUs) - unix_micros(col("max_loaded_at"))).as("age_us"))
        .withColumn("status",
          when(col("max_loaded_us").isNull, lit("error"))
            .when(col("age_us") > s.errorAfterSec * 1000000L, lit("error"))
            .when(col("age_us") > s.warnAfterSec * 1000000L, lit("warn"))
            .otherwise(lit("pass")))
    }.reduce(_.unionByName(_)).orderBy("source_name")
  }

  /** Distribution-drift monitor between a REFERENCE ingest window and a
    * CURRENT one — the ingest-health check a long-running pipeline runs
    * before letting a new day's data into training (schema tests catch
    * broken columns; drift catches silently SHIFTED ones). Both sides
    * are bucketed by the caller's `bucketCol` (a category, or a binned
    * numeric), proportions are exact per-mille integers
    * (`n·1000 div total`), and the per-bucket drift contribution is the
    * χ²-flavored symmetric index `(pmʳ−pmᶜ)²·1000 div (pmʳ+pmᶜ)` —
    * rational throughout, so the whole report is bit-stable
    * cross-engine (PSI's logarithm is deliberately traded away for
    * exactness; the two indexes order drifts the same way in practice).
    * A bucket absent from one side contributes its full squared mass —
    * new/vanished categories are the loudest drift there is.
    *
    * Cost: one map-side-combinable count aggregate per side over the
    * bucket key, a full-outer join of |buckets| rows, two scalar
    * totals. Corpus-size-independent output. */
  /** The [[distributionDrift]] statistic computed PER GROUP from two
    * already-counted summaries `(groupCols..., bucketCol, cnt)` — the
    * shared serve for the maintained distribution stores
    * ([[HistStore.drift]], [[QuantileStore.drift]]), whose summaries
    * align by construction (one layout/width per store). Groups absent
    * from either side are dropped (the per-group form of
    * distributionDrift's empty-window refusal). Returns
    * (groupCols..., drift_pm, n_ref, n_cur); exact integers end to
    * end. Cost: a |groups × buckets| full-outer join + window totals —
    * summary scale, never raw rows. */
  def driftFromSummaries(ref: DataFrame, cur: DataFrame,
                         groupCols: Seq[String],
                         bucketCol: String): DataFrame = {
    require(groupCols.nonEmpty, "driftFromSummaries: need group columns")
    val r = ref.withColumnRenamed("cnt", "n_ref")
    val c = cur.withColumnRenamed("cnt", "n_cur")
    val keys = groupCols :+ bucketCol
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    r.join(c, keys, "full_outer")
      .select(keys.map(col) :+
        coalesce(col("n_ref"), lit(0L)).as("n_ref") :+
        coalesce(col("n_cur"), lit(0L)).as("n_cur"): _*)
      .withColumn("tr", sum(col("n_ref")).over(wAll))
      .withColumn("tc", sum(col("n_cur")).over(wAll))
      .filter(col("tr") > 0 && col("tc") > 0)
      .withColumn("pm_ref", expr("n_ref * 1000L div tr"))
      .withColumn("pm_cur", expr("n_cur * 1000L div tc"))
      .withColumn("contrib",
        when(col("pm_ref") + col("pm_cur") > 0,
          expr("(pm_ref - pm_cur) * (pm_ref - pm_cur) * 1000L " +
            "div (pm_ref + pm_cur)"))
          .otherwise(lit(0L)))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("contrib")).as("drift_pm"),
        max(col("tr")).as("n_ref"), max(col("tc")).as("n_cur"))
  }

  def distributionDrift(ref: DataFrame, cur: DataFrame,
                        bucketCol: String): DataFrame = {
    def cnt(df: DataFrame, as: String) =
      df.groupBy(col(bucketCol).as("bucket")).agg(count(lit(1)).as(as))
    val r = cnt(ref, "n_ref").persist()
    val c = cnt(cur, "n_cur").persist()
    val tr = r.agg(coalesce(sum(col("n_ref")), lit(0L))).first().getLong(0)
    val tc = c.agg(coalesce(sum(col("n_cur")), lit(0L))).first().getLong(0)
    require(tr > 0 && tc > 0, "distributionDrift: empty window")
    val out = r.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("pm_ref", expr(s"n_ref * 1000 div $tr"))
      .withColumn("pm_cur", expr(s"n_cur * 1000 div $tc"))
      .withColumn("drift_contrib",
        when(col("pm_ref") + col("pm_cur") > 0,
          expr("(pm_ref - pm_cur) * (pm_ref - pm_cur) * 1000 " +
            "div (pm_ref + pm_cur)"))
          .otherwise(lit(0L)))
    // |buckets| rows: materialize eagerly so the caches can be released
    // without the count aggregates re-running at the caller's action
    val m = out.localCheckpoint(true)
    r.unpersist(); c.unpersist()
    m
  }
}
