package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents to fixed-capacity
  * token bins (context-window batches) ahead of training.
  *
  * Packing is a prefix sum — inherently sequential — so a single global
  * ordering would serialize 100 TB through one partition. Instead the
  * corpus is split into `nShards` by a stable hash of the id and packed
  * independently per shard: each shard is one window partition (ordered
  * by id, contiguous fill), shards run fully parallel, and the result is
  * reproducible on any cluster shape because both the shard assignment
  * (md5 bucket) and the within-shard order (id) are data-determined.
  * Size `nShards` so a shard's documents fit a partition comfortably.
  *
  * A document is assigned to the bin where its span begins (greedy
  * contiguous fill; bins may overflow by at most one document — the
  * standard trade against leaving tail gaps).
  */
object Packing {

  /** @param nTokensCol pre-computed token count column (see
    *                   TextStats.wsTokenCount / regexTokenCount)
    * Output: input id + (shard, bin, off_in_bin, n_tokens). */
  def packBins(
      df: DataFrame, idCol: String, nTokensCol: String,
      maxTokens: Long, nShards: Int): DataFrame = {
    require(maxTokens > 0 && nShards > 0)
    val shard = Sampling.hashBucket(col(idCol), nShards)
    val fill = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("shard", shard)
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(fill), lit(0L)))
      .select(col(idCol), col("shard"),
        expr(s"__cum div ${maxTokens}L").as("bin"), // integer div: no double rounding
        pmod(col("__cum"), lit(maxTokens)).as("off_in_bin"),
        col("n_tokens"))
  }

  /** Overlapping context windows over each document's token span: one
    * row per window of `size` tokens advancing by `stride` (stride <
    * size = overlap, the usual training-window prep); the final window
    * clamps to the document end, and every token is covered. Pure
    * integer projection + bounded explode (windows per doc =
    * ceil((n-size)/stride)+1) — no shuffle, scale-free. */
  def slidingWindows(
      df: DataFrame, idCol: String, nTokensCol: String,
      size: Long, stride: Long): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "slidingWindows: need 0 < stride <= size")
    val n = col(nTokensCol).cast("long")
    // integer-exact ceil((n-size)/stride); 0 when the doc fits one window
    val lastIdx = when(n <= size, lit(0L))
      .otherwise(expr(s"($nTokensCol - ${size}L + ${stride}L - 1) div ${stride}L"))
    df.select(col(idCol), n.as("__n"), explode(sequence(lit(0L), lastIdx)).as("win_idx"))
      .select(col(idCol), col("win_idx"),
        (col("win_idx") * stride).as("start_tok"),
        least(col("win_idx") * stride + size, col("__n")).as("end_tok"))
  }
}
