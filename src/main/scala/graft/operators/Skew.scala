package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on in GraftSession). This
  * operator is the explicit fallback for cases AQE can't rescue — e.g. a
  * hot key whose *build side* row is joined by billions of probe rows, or
  * deterministic plans with AQE off.
  *
  * Mechanics: the large (probe) side gets a deterministic salt in
  * [0, saltFactor) derived from hashing its non-key columns; the small
  * (build) side is replicated saltFactor times, once per salt value. The
  * join key becomes (keys..., salt), splitting each hot key's rows across
  * saltFactor reducers. Replication multiplies the small side by
  * saltFactor — use only when |small| × saltFactor is still broadcast- or
  * shuffle-cheap.
  */
object Skew {

  def saltedJoin(
      large: DataFrame, small: DataFrame,
      keys: Seq[String], saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full-outer would emit saltFactor duplicates of every UNMATCHED
    // small-side row (the replicas only collapse through a match), so only
    // join types that never surface unmatched build-side rows are allowed
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
      .contains(normalized),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched small-side " +
        "rows; use inner/cross/left/left_semi/left_anti")
    // deterministic per-row salt: hash of the non-key columns (falls back
    // to the keys when there are none — degenerate but still valid)
    val nonKey = large.columns.filterNot(keys.contains).toSeq
    val saltSrc: Seq[String] = if (nonKey.nonEmpty) nonKey else large.columns.toSeq
    val l = large.withColumn("__salt",
      pmod(hash(saltSrc.map(col): _*), lit(saltFactor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
