package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, attach the single latest
  * right row with `rightTime <= leftTime` on the same key, optionally
  * within a tolerance. The temporal-enrichment primitive (trades-to-quotes,
  * events-to-rates) that plain Spark has no operator for.
  *
  * Shape: union both sides with a marker and run ONE window over
  * (key ORDER BY time, marker) forward-filling the right payload with
  * `last(..., ignoreNulls)`. One shuffle on the key, one sort within
  * partitions — no per-row subquery, no range explosion, no broadcast
  * requirement on either side. This is the partitioning a 1000-executor
  * run wants: hash(key) co-location, time-local sort, linear scan.
  */
object AsOfJoin {

  /** @param payload  right-side columns to attach (null when unmatched or
    *                 outside tolerance); may include `rightTime` itself
    * @param toleranceUs  max allowed `leftTime - rightTime` in microseconds;
    *                     matches older than this surface as null payload
    *
    * The right side must be unique per (key, time): an as-of match that is
    * ambiguous at the same instant is a data bug — pre-aggregate rather
    * than letting a silent tie-break pick a winner.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payload: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asOf: at least one payload column required")
    val leftCols = left.columns.toSeq

    // Right rows carry their payload in one struct; __mt (the match time)
    // rides along for the tolerance predicate. A NULL-time right row can
    // never be a valid as-of match, but NULLs sort FIRST under asc — it
    // would become the forward-fill source for every left row before the
    // first real match. Drop them at the door.
    val rKeyed = right.filter(col(rightTime).isNotNull).select(
        col(key).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        struct(col(rightTime).cast("timestamp").as("__mt") +:
          payload.filterNot(_ == rightTime).map(col): _*).as("__p"))
      .withColumn("__is_left", lit(0))
    val lKeyed = left.select(
        col(key).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        struct(leftCols.map(col): _*).as("__l"))
      .withColumn("__is_left", lit(1))

    val pType = rKeyed.schema("__p").dataType
    val lType = lKeyed.schema("__l").dataType
    val unioned = lKeyed.withColumn("__p", lit(null).cast(pType))
      .unionByName(rKeyed.withColumn("__l", lit(null).cast(lType)))

    // Right rows (marker 0) sort before left rows at the same instant, so
    // a right row at exactly leftTime is visible: <= match semantics.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)

    val within = toleranceUs match {
      case Some(tol) => col("__m").isNotNull &&
        unix_micros(col("__t")) - unix_micros(col("__m.__mt")) <= tol
      case None => col("__m").isNotNull
    }
    val outCols =
      leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        payload.map { p =>
          val src = if (p == rightTime) col("__m.__mt") else col(s"__m.`$p`")
          when(within, src).as(p)
        }
    filled.select(outCols: _*)
  }
}
