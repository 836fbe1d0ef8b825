package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table training (Sennrich et al. 2016 — the
  * tokenizer-training step of an LLM data pipeline), Spark-shaped:
  *
  *  - the corpus collapses ONCE to a word-frequency dict (distinct words
  *    only — the classic BPE working set, orders of magnitude smaller
  *    than the corpus and hash-partitioned);
  *  - each merge round is one distributed weighted pair-count (explode +
  *    map-side-combinable sum) whose ONLY collect is the single argmax
  *    row (ties broken on the pair strings, so training is
  *    deterministic), followed by a dict rewrite;
  *  - the rewrite is a pure Column fold (`aggregate` HOF): greedy
  *    left-to-right non-overlapping adjacent-pair merge, the reference
  *    semantics — no UDF, stays in codegen;
  *  - `localCheckpoint` per round caps lineage growth across rounds
  *    (same device as ConnectedComponents' iteration).
  *
  * Scale: corpus size only affects the initial word count; rounds cost
  * O(dict). numMerges is a driver loop by nature (each merge depends on
  * the previous) — exactly how reference BPE trainers iterate. */
object Bpe {

  /** Greedy left-to-right merge of the adjacent pair (a, b) into `a+b`
    * within a symbol array — one fold, no UDF. After a merge the new
    * symbol cannot chain into the next match (matching reference BPE:
    * "l l l" + (l,l) -> ["ll", "l"]). */
  private[llm] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, 1, size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges over the corpus; returns
    * (rank, left, right, freq) in merge order. Stops early when no pair
    * occurs twice. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(Long, String, String, Long)] = {
    require(numMerges > 0, "Bpe.train: numMerges must be positive")
    var dict = docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(split(col("w"), "").as("syms"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val nPairs = size(col("syms")) - 1
      val pairs = dict
        .select(col("n"),
          explode(when(nPairs < 1, array().cast("array<struct<a:string,b:string>>"))
            .otherwise(transform(sequence(lit(1), nPairs), i =>
              struct(element_at(col("syms"), i.cast("int")).as("a"),
                element_at(col("syms"), (i + 1).cast("int")).as("b"))))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("freq"))
      val top = pairs.orderBy(desc("freq"), col("a"), col("b")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, f))
        dict = dict.select(mergePair(col("syms"), a, b).as("syms"), col("n"))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
  }

  /** The merge table as a DataFrame (rank, left, right, freq) — the
    * artifact a tokenizer ships. */
  def trainDf(spark: SparkSession, docs: DataFrame, textCol: String,
              numMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, numMerges).toDF("rank", "left", "right", "freq")
  }

  /** Apply a learned merge table to a token: fold the merges in rank
    * order over the char-split symbols (how a shipped BPE tokenizer
    * segments unseen text). */
  def segment(token: Column, merges: Seq[(Long, String, String, Long)]): Column =
    merges.foldLeft(split(token, "")) { case (syms, (_, a, b, _)) =>
      mergePair(syms, a, b)
    }
}
