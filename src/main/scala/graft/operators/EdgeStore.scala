package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.RunSlots

/** Materialized link-graph edge store — the persistence between
  * [[graft.llm.Curation.linkHostEdges]] (per-crawl-batch edge
  * extraction) and [[PageRank.rankWarm]] (periodic authority refresh).
  * Each batch appends its (src, dst, w) aggregates under its own
  * `run=<id>` slot ([[RunSlots]]), so a replayed crawl batch
  * OVERWRITES its slot instead of double-counting its anchors — a
  * duplicate-landed batch would silently bias every rank downstream,
  * which is why exactly-once matters more here than for any candidate
  * index (those only over-generate candidates; this changes answers).
  *
  * Reads sum weights across slots per (src, dst): parallel edges are
  * additive, so slot-level aggregation composes exactly — the read
  * equals extracting edges from the union corpus in one pass.
  * Layout: `edges/run=<slot>/eb=<pmod(src, nBuckets)>/…`; `eb` keeps
  * per-slot files bounded and write parallelism even (the rank reads
  * everything, so bucket pruning is not the point here). */
object EdgeStore {

  private def eb(src: org.apache.spark.sql.Column, n: Int) =
    pmod(src, lit(n.toLong))

  private def agg(edges: DataFrame, srcCol: String, dstCol: String,
                  wCol: Option[String]): DataFrame = {
    val w = wCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
  }

  /** Seed the store (replaces any existing one). */
  def write(edges: DataFrame, srcCol: String, dstCol: String,
            wCol: Option[String], path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "EdgeStore.write: nBuckets must be positive")
    RunSlots.reset(edges.sparkSession, s"$path/edges")
    RunSlots.write(
      agg(edges, srcCol, dstCol, wCol)
        .withColumn("eb", eb(col("src"), nBuckets))
        .repartition(col("eb")),
      s"$path/edges", "eb", Some(RunSlots.Base))
  }

  /** Append an ad-hoc/backfill batch's edges into its own run slot
    * (None = plain accumulate under `__adhoc__`). The `b<digits>`
    * namespace is REJECTED here — it belongs to the store's
    * checkpointed stream ([[appendBatch]]), and a manual id of that
    * shape would inherit the fold manifest's collapse semantics. */
  def append(edges: DataFrame, srcCol: String, dstCol: String,
             wCol: Option[String], path: String, nBuckets: Int = 64,
             runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "EdgeStore.append")
    appendSlot(edges, srcCol, dstCol, wCol, path, nBuckets, runId)
  }

  /** [[append]] for the store's single checkpointed stream: mints the
    * reserved `b<batchId>` run id from the foreachBatch micro-batch id
    * (monotonic — the contract the bounded fold manifest leans on). */
  def appendBatch(edges: DataFrame, srcCol: String, dstCol: String,
                  wCol: Option[String], path: String, nBuckets: Int,
                  batchId: Long): Unit =
    appendSlot(edges, srcCol, dstCol, wCol, path, nBuckets,
      Some(s"b$batchId"))

  private def appendSlot(edges: DataFrame, srcCol: String, dstCol: String,
                         wCol: Option[String], path: String, nBuckets: Int,
                         runId: Option[String]): Unit =
    RunSlots.write(
      agg(edges, srcCol, dstCol, wCol)
        .withColumn("eb", eb(col("src"), nBuckets))
        .repartition(col("eb")),
      s"$path/edges", "eb", runId)

  /** The full (src, dst, w) edge list: weights summed across slots. */
  def read(spark: SparkSession, path: String): DataFrame = {
    require(RunSlots.hasParts(spark, s"$path/edges", "eb"),
      s"EdgeStore: no edges at $path")
    spark.read.parquet(s"$path/edges")
      .groupBy("src", "dst").agg(sum("w").as("w"))
  }

  /** Fold all slots into one pre-aggregated `run=__base__` generation. */
  def compact(spark: SparkSession, path: String): Unit =
    graft.llm.IvfLayout.compact(spark, s"$path/edges", "eb",
      transform = df => df.groupBy("src", "dst", "eb").agg(sum("w").as("w")))
}
