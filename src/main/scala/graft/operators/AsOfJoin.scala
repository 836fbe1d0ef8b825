package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the single temporally-nearest
  * right row on the same key, optionally within a tolerance. The
  * temporal-enrichment primitive (trades-to-quotes, events-to-rates)
  * that plain Spark has no operator for. Three directions, mirroring
  * pandas `merge_asof`:
  *
  *  - `backward` (default): latest right with `rightTime <= leftTime`
  *  - `forward`: earliest right with `rightTime >= leftTime`
  *  - `nearest`: whichever of the two is closer; exact ties break
  *    backward (the match that was already knowable at leftTime)
  *
  * Shape: union both sides with a marker and run ONE window over
  * (key ORDER BY time, marker) filling the right payload with
  * `last(..., ignoreNulls)` over the preceding frame (backward) or
  * `first(...)` over the following frame (forward); `nearest` computes
  * both fills — same single exchange, one extra within-partition sort
  * for the reversed marker order. One shuffle on the key, time-local
  * sort, linear scan — no per-row subquery, no range explosion, no
  * broadcast requirement on either side. This is the partitioning a
  * 1000-executor run wants.
  */
object AsOfJoin {

  /** @param payload  right-side columns to attach (null when unmatched or
    *                 outside tolerance); may include `rightTime` itself
    * @param toleranceUs  max allowed |leftTime - rightTime| in microseconds
    *                     in the match direction; farther matches surface
    *                     as null payload
    * @param direction `backward` | `forward` | `nearest`
    *
    * The right side must be unique per (key, time): an as-of match that is
    * ambiguous at the same instant is a data bug — pre-aggregate rather
    * than letting a silent tie-break pick a winner.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payload: Seq[String],
      toleranceUs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(payload.nonEmpty, "asOf: at least one payload column required")
    require(Set("backward", "forward", "nearest")(direction),
      s"asOf: unknown direction '$direction'")
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

    // Backward: right rows (marker 0) sort BEFORE left rows at the same
    // instant, so a right row at exactly leftTime is inside the preceding
    // frame: <= match semantics. Forward mirrors it: marker DESC puts the
    // left row first at the same instant, so that right row is inside the
    // following frame: >= semantics. Both windows share the exchange on
    // __k; the reversed marker order costs one extra in-partition sort.
    val wB = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def backFill: Column = last(col("__p"), ignoreNulls = true).over(wB)
    def fwdFill: Column = first(col("__p"), ignoreNulls = true).over(wF)

    val filled = (direction match {
      case "backward" => unioned.withColumn("__mb", backFill)
      case "forward"  => unioned.withColumn("__mf", fwdFill)
      case "nearest"  => unioned.withColumn("__mb", backFill)
        .withColumn("__mf", fwdFill)
    }).filter(col("__is_left") === 1)

    // distances are >= 0 by construction of each fill's frame
    def distB: Column =
      unix_micros(col("__t")) - unix_micros(col("__mb.__mt"))
    def distF: Column =
      unix_micros(col("__mf.__mt")) - unix_micros(col("__t"))
    def okB: Column = col("__mb").isNotNull &&
      toleranceUs.map(t => distB <= t).getOrElse(lit(true))
    def okF: Column = col("__mf").isNotNull &&
      toleranceUs.map(t => distF <= t).getOrElse(lit(true))

    val m = direction match {
      case "backward" => when(okB, col("__mb"))
      case "forward"  => when(okF, col("__mf"))
      case "nearest"  => // tie (distB == distF) keeps the backward match
        when(okB && (!okF || distB <= distF), col("__mb"))
          .when(okF, col("__mf"))
    }
    val withM = filled.withColumn("__m", m)
    val outCols =
      leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        payload.map { p =>
          val src = if (p == rightTime) col("__m.__mt") else col(s"__m.`$p`")
          src.as(p)
        }
    withM.select(outCols: _*)
  }
}
