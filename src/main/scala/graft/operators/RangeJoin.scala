package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pairs every point with every interval of
  * the same key satisfying `iStart <= pTime < iEnd`.
  *
  * A naive theta-join is a per-key cross product — quadratic on hot keys
  * and a broadcast-nested-loop at scale. Instead both sides are bucketed
  * to a fixed time grain and equi-joined on (key, bucket) with the range
  * predicate left as a residual filter: the shuffle is hash(key, bucket)
  * — time-spread keys fan out across partitions — and each interval is
  * replicated only into the ceil(len/bucket)+1 buckets it overlaps, so
  * the blow-up is bounded by interval length over bucket size, never by
  * data volume. A point falls in exactly one bucket, so pairs are emitted
  * exactly once (no post-join dedup).
  *
  * Pick `bucketSeconds` near the typical interval length: too small
  * multiplies interval replicas, too large degrades the residual filter's
  * selectivity within a bucket.
  */
object RangeJoin {

  // floor-division of epoch micros into bucket ordinals — `div` truncates
  // toward zero, which would misalign buckets for pre-1970 timestamps
  // (shared with Resample's grid alignment)
  private[operators] def bucketOf(usCol: String, bUs: Long): Column =
    expr(s"$usCol div $bUs - (case when $usCol % $bUs < 0 then 1 else 0 end)")

  /** Output: all point columns + all interval columns (the join key is
    * emitted once); column names must not collide across the two inputs. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      key: String, pTime: String, iStart: String, iEnd: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "pointInInterval: bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L

    // Empty/inverted intervals match nothing; filtering them also protects
    // sequence(), which counts DOWN on an inverted range.
    val iv = intervals.filter(col(iEnd) > col(iStart))
      .withColumn("__us0", unix_micros(col(iStart).cast("timestamp")))
      .withColumn("__us1", unix_micros(col(iEnd).cast("timestamp")) - 1)
      .withColumn("__b", explode(sequence(bucketOf("__us0", bUs), bucketOf("__us1", bUs))))
      .drop("__us0", "__us1")
    val pt = points
      .withColumn("__pus", unix_micros(col(pTime).cast("timestamp")))
      .withColumn("__b", bucketOf("__pus", bUs))
      .drop("__pus")

    pt.join(iv, Seq(key, "__b"))
      .filter(col(pTime) >= col(iStart) && col(pTime) < col(iEnd))
      .drop("__b")
  }

  /** Interval-overlap join: pairs (a, b) with the same key whose half-open
    * spans intersect (`aStart < bEnd && bStart < aEnd`).
    *
    * Same bucketed shape as pointInInterval, but two intervals can share
    * MANY buckets — instead of a post-join dedup, each pair is emitted in
    * exactly one bucket: the bucket of the LATER start. When two
    * intervals overlap, the later start lies inside both spans, so both
    * sides have a replica in that bucket, and no earlier bucket is shared
    * — it is the unique minimum shared bucket. Dedup-free, shuffle on
    * (key, bucket) only. Column names across `a` and `b` must not
    * collide. */
  def intervalOverlap(
      a: DataFrame, b: DataFrame,
      key: String, aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "intervalOverlap: bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L

    def spanBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn(s"__${s}_us", unix_micros(col(s).cast("timestamp")))
        .withColumn(s"__${e}_us", unix_micros(col(e).cast("timestamp")) - 1)
        .withColumn("__b", explode(sequence(
          bucketOf(s"__${s}_us", bUs), bucketOf(s"__${e}_us", bUs))))
        .drop(s"__${e}_us")

    val av = spanBuckets(a, aStart, aEnd)
    val bv = spanBuckets(b, bStart, bEnd)
    av.join(bv, Seq(key, "__b"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__b") === greatest(
        bucketOf(s"__${aStart}_us", bUs), bucketOf(s"__${bStart}_us", bUs)))
      .drop("__b", s"__${aStart}_us", s"__${bStart}_us")
  }
}
