package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys: interleave the bits of two
  * dimensions into one sort key so that sorting by it co-locates rows
  * close in BOTH dimensions — the multi-column data-layout trick behind
  * Delta/Iceberg Z-ORDER. Sorting files by z-value tightens parquet
  * row-group min/max stats on every participating column at once, so
  * selective filters on either column skip row groups that a
  * single-column sort could only provide for its leading column.
  *
  * Pure integer expression (a static sum of disjoint-bit shifts — bitwise
  * OR equals + here), fully inside codegen; engine-portable, so the
  * DuckDB oracle reproduces it with the same arithmetic.
  */
object ZOrder {

  /** Morton key of two dimensions, `bits` low bits each. Out-of-range
    * values are CLAMPED to [0, 2^bits) — saturating, not masked: a
    * modulo wrap would map the largest values next to the smallest,
    * silently destroying the locality (and therefore the row-group
    * skipping) the key exists for. Callers should still range-normalize
    * for meaningful resolution. Even result bits take `a`, odd take `b`. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits > 0 && bits <= 31, "zValue: bits must be in [1, 31]")
    val max = (1L << bits) - 1
    def clamp(c: Column) = least(greatest(c.cast("long"), lit(0L)), lit(max))
    val (ac, bc) = (clamp(a), clamp(b))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(ac, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The matching DuckDB SQL expression (shared definition keeps the
    * oracle's arithmetic in lockstep with zValue). */
  private[graft] def zValueSql(a: String, b: String, bits: Int = 21): String = {
    val max = (1L << bits) - 1
    def clamp(c: String) = s"least(greatest(CAST($c AS BIGINT), 0), $max)"
    val (ac, bc) = (clamp(a), clamp(b))
    (0 until bits).flatMap { i =>
      Seq(s"((($ac >> $i) & 1) << ${2 * i})", s"((($bc >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
  }

  /** Rewrite a DataFrame sorted-within-partitions by the z-value of two
    * columns — the write-side layout step (pair with
    * `df.write.partitionBy(...)` or bucketing; the sort only reorders
    * rows inside each partition, no shuffle). */
  def clusterByZ(df: DataFrame, a: String, b: String, bits: Int = 21): DataFrame =
    df.sortWithinPartitions(zValue(col(a), col(b), bits))
}
