package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt unit tests (dbt-core 1.8): run a MODEL against literal `given`
  * fixtures instead of its real inputs and diff the result against
  * literal `expect` rows — logic tests that run before a model ever
  * touches warehouse data, complementing [[DataQuality]]'s data tests
  * (which run after). A reference-library user writes these against
  * macro-heavy models; here the model is any
  * `Map[input-name, DataFrame] => DataFrame`.
  *
  * The diff is dbt's: row MULTISETS must match exactly. `exceptAll`
  * gives that null-safely in both directions (a full-outer join on the
  * row columns would drop null-keyed matches under SQL equality).
  * Each direction is one aggregate-sized subtree over fixture-sized
  * inputs — cost is test-fixture-bound, never corpus-bound. */
object UnitTest {

  final case class Case(
      name: String,
      model: Map[String, DataFrame] => DataFrame,
      given: Map[String, DataFrame],
      expect: DataFrame)

  /** One report row per case: missing = expected rows the model did not
    * produce, unexpected = produced rows not expected (multiset
    * counts); pass iff both are zero. Schema mismatches surface as a
    * failed case (analysis errors are what the test is FOR), not an
    * exception that kills the whole report. */
  def report(cases: Seq[Case]): DataFrame = {
    require(cases.nonEmpty, "UnitTest.report: no cases given")
    val spark = cases.head.expect.sparkSession
    import spark.implicits._
    cases.map { c =>
      val (missing, unexpected, err) =
        try {
          val actual = c.model(c.given)
          (c.expect.exceptAll(actual).count(),
            actual.exceptAll(c.expect).count(), null: String)
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            (-1L, -1L, e.getClass.getSimpleName)
        }
      (c.name, missing == 0 && unexpected == 0, missing, unexpected,
        Option(err).getOrElse(""))
    }.toDF("test_name", "pass", "missing_rows", "unexpected_rows", "error")
      .orderBy("test_name")
  }
}
