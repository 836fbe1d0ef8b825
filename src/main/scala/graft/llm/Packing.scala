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

  /** Token-bounded JSONL shard export — the dataloader handoff at the
    * end of every curation pipeline: "give me shard files of ≤ B tokens
    * each, reproducibly". Documents are assigned by [[packBins]] (hash
    * shards packed greedily into `maxTokens` bins), each (shard, bin)
    * becomes one JSONL partition directory, and file CONTENT order is
    * pinned by an explicit within-partition sort — the same corpus on
    * any cluster shape writes byte-identical shard files.
    *
    * Scale shape: the pack is one hash exchange + per-shard window; the
    * write is one `partitionBy(shard, bin)` JSONL sink (task-parallel,
    * append-free); the returned manifest is aggregated from a READ-BACK
    * of the written tree — it reports what a dataloader will actually
    * see, not what the writer intended. Manifest rows are bounded by the
    * shard-dir count (corpus_tokens / maxTokens), never corpus rows.
    *
    * Returns the manifest: (shard, bin, n_docs, n_tokens, min_id,
    * max_id), one row per written shard file directory. */
  def exportShards(
      df: DataFrame, idCol: String, textCol: String, nTokensCol: String,
      maxTokens: Long, nShards: Int, path: String): DataFrame = {
    val spark = df.sparkSession
    val packed = packBins(df, idCol, nTokensCol, maxTokens, nShards)
    val rows = df.select(col(idCol), col(textCol))
      .join(packed.select(col(idCol), col("shard"), col("bin"), col("n_tokens")),
        Seq(idCol))
    rows
      .repartition(col("shard"), col("bin"))
      .sortWithinPartitions(col("shard"), col("bin"), col(idCol))
      .select(col("shard"), col("bin"), col(idCol), col(textCol), col("n_tokens"))
      .write.partitionBy("shard", "bin").mode("overwrite").json(path)
    // manifest from the written tree (schema pinned — no inference pass;
    // shard/bin resolve from the partition directories)
    val back = spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(textCol,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType))))
      .json(path)
    back.groupBy(col("shard").cast("long").as("shard"),
        col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
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
