package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TableId
import graft.warehouse.Warehouse

/** Materialized multi-stage curation pipeline — the RESUME-ABLE
  * production shape of the `curation_e2e` composition (LM-surprisal
  * quality filter → exact dedup → split assignment → corpus report).
  *
  * The gate variant stages through `localCheckpoint`: correct, and
  * measured FASTER at gate scale (small keep-sets, warm executors), but
  * a crash anywhere recomputes the world. This variant writes each
  * stage's output through the [[Warehouse]] (crash-safe swap protocol)
  * and the next stage reads the TABLE back, so:
  *
  *  - a re-run after a crash resumes at the first stage whose output
  *    table is missing (`resume = true` skips completed stages — the
  *    orchestrator-retry contract);
  *  - every stage boundary is an inspectable, independently-consumable
  *    table (the id keep-sets feed OTHER pipelines: decontamination,
  *    retrieval indexing) rather than executor-memory blocks;
  *  - at 100 TB the intermediate id-sets are many-GB — executor-local
  *    checkpoint blocks of that size evict under memory pressure and
  *    recompute anyway, while warehouse parquet is partition-parallel
  *    to write and read once.
  *
  * Measure both at your scale (SCALING.md records the gate-scale
  * numbers: localCheckpoint wins under ~1 s of stage work; the
  * warehouse's fixed per-table cost is ~0.5 s a stage) — the crossover
  * is where stage recompute cost exceeds table write cost.
  */
object CurationPipeline {

  /** Stage-output table ids for a pipeline namespace. */
  final case class Stages(database: String, schema: String) {
    val lmKeep: TableId = TableId(database, schema, "lm_keep_ids")
    val curated: TableId = TableId(database, schema, "curated_ids")
    val report: TableId = TableId(database, schema, "split_report")
    def all: Seq[TableId] = Seq(lmKeep, curated, report)
  }

  /** Run the pipeline, materializing every stage boundary. Returns the
    * final split-level report (reading it back from its table).
    *
    * @param docs      corpus (idCol, textCol, …)
    * @param trainDocs LM training slice (the quality-model reference
    *                  corpus — pass a clean subset, not necessarily docs)
    * @param maxBits10 keep docs with sum_bits·10 ≤ n_bigrams·maxBits10
    *                  (integer surprisal threshold, bits·10 per bigram)
    * @param resume    skip any stage whose output table already exists —
    *                  the crash-retry contract. Pass false to force a
    *                  full recompute into the same tables. */
  def run(
      wh: Warehouse, docs: DataFrame, trainDocs: DataFrame,
      textCol: String, idCol: String, stages: Stages,
      maxBits10: Long = 44L, seed: Long = 7L,
      valPct: Int = 10, testPct: Int = 10,
      resume: Boolean = true): DataFrame = {

    def stage(t: TableId)(build: => DataFrame): DataFrame = {
      if (!(resume && wh.exists(t))) wh.overwrite(t, build)
      wh.read(t)
    }

    val lmKeep = stage(stages.lmKeep) {
      val model = LmScore.train(trainDocs, textCol)
      LmScore.score(docs, textCol, idCol, model)
        .filter(col("n_bigrams") > 0 &&
          col("sum_bits") * 10L <= col("n_bigrams") * maxBits10)
        .select(idCol)
    }

    val curated = stage(stages.curated) {
      val kept = docs.join(lmKeep, Seq(idCol), "left_semi")
      Dedup.exact(kept, textCol, idCol).select(idCol)
    }

    stage(stages.report) {
      val curatedDocs = docs.join(curated, Seq(idCol), "left_semi")
      Sampling.splitAssign(curatedDocs, idCol,
          seed = seed, valPct = valPct, testPct = testPct)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col(textCol)).cast("long")).as("total_chars"))
    }.orderBy("split")
  }
}
