package graft.operators

import org.apache.spark.sql.SparkSession

/** Public entry point for the family-wide swap-install crash repair
  * (r15 verdict "What's missing #4", generic case): every maintained
  * store's compact / rebuild / retrain installs a fully-staged tree by
  * backup-rename (`<tree>__<op>_old`) + move, and refuses to run again
  * while wreckage exists. [[swap]] executes the remedy the refusal
  * describes — restore the backup when the live tree is missing (crash
  * between the two renames), drop it when the live tree is present
  * (the staged tree installed; only the backup delete was lost), and
  * remove orphan staging dirs. See
  * [[graft.llm.IvfLayout.repairSwap]] for the decision table.
  *
  * Tree paths and ops per store (what to pass):
  *  - ChunkStore: use [[graft.llm.ChunkStore.repairCompact]] /
  *    [[graft.llm.ChunkStore.repairGc]] instead — its compact couples
  *    the manifest, chunk, and parked-tombstone trees, and gc installs
  *    per-bucket; the generic single-tree repair does not apply.
  *  - EdgeStore / LabelStore dropNodes wreckage: use their
  *    `repairDrop` (per-bucket, two-copy coupling).
  *  - EdgeStore compact:      `<path>/edges`, op "compact"
  *  - LabelStore compact:     `<path>/byn` AND `<path>/byc`, "compact"
  *  - TopKStore:              `<path>/topk`, "compact"
  *  - SampleStore:            `<path>/sample`, "compact"
  *  - HistStore:              `<path>/hist`, "compact"
  *  - QuantileStore:          `<path>/quant`, "compact"
  *  - CmsStore:               `<path>/cms`, "compact" and "rebuild"
  *  - BloomStore:             `<path>`, "compact" and "rebuild"
  *  - IvfIndex / IvfPq:       `<path>`, "compact" and "retrain"
  *  - lexical index:          `<path>`, "compact"
  *  - MinHashIndex:           `<path>/bands` AND `<path>/sets`, "compact"
  *  - ContainIndex:           `<path>/pref`, `<path>/post`,
  *    `<path>/sets`, "compact"
  *
  * For the two-tree stores (label byn/byc, minhash bands/sets, contain
  * pref/post/sets) repair EVERY tree before re-running the op — each
  * tree's swap is independent, so a crash can leave them one
  * generation apart; the op's own staged rewrite reconverges them.
  *
  * Idempotent per tree; "clean" when nothing to do. */
object StoreRepair {
  def swap(spark: SparkSession, tree: String,
           op: String = "compact"): String =
    graft.llm.IvfLayout.repairSwap(spark, tree, op)
}
