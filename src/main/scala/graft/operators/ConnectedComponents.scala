package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * resolution step every near-dup pipeline needs between "pairs found"
  * (MinHash/SimHash/Jaccard emit PAIRS) and "pick one canonical doc per
  * cluster" (drop the rest).
  *
  * Algorithm: minimum-label propagation with PATH HALVING — each round
  * every node takes the min label among itself and its neighbors (one
  * equi-join on node id + a map-side-combinable min), then chases one
  * pointer hop (`label := label-of(label)`, a join on the tiny label
  * table). The hop compresses label chains geometrically, so rounds
  * needed are O(log diameter) instead of O(diameter) — a 9-node path
  * converges in 3 rounds, and near-dup graphs (stars/near-cliques,
  * diameter 2-4) in 2. Per-round wall-clock is dominated by fixed job
  * overhead once components collapse, so halving rounds matters more
  * than shaving per-round work.
  *
  * Convergence detection: labels only ever DECREASE, so the label sum is
  * strictly monotone until fixpoint — one scalar aggregate on the
  * already-materialized round output replaces a change-count join.
  * Driver holds that one long, never data; each round's labels are
  * localCheckpoint'ed to cut lineage (without it, round k replays rounds
  * 1..k-1 and iteration goes quadratic).
  */
object ConnectedComponents {

  /** @return (node, label) — label is the minimum node id reachable from
    *         `node`; isolated ids absent from `pairs` are absent here
    *         (union the full id universe in with label = id if needed). */
  def run(pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    // Materialize the pair list ONCE before fanning it into both edge
    // directions: `pairs` is typically the output of an expensive LSH
    // pipeline, and two lazy references would run that pipeline twice.
    // Eager localCheckpoint, not persist+count: the pair plan is
    // referenced 3x by `edges` (both directions + self-loops), so every
    // downstream plan would embed the WHOLE upstream LSH pipeline 3x —
    // and AQE re-renders the full tree on every plan update
    // (onUpdatePlan builds explainString unconditionally), which
    // ProfileGate measured at ~70% of cc-family gate wall (round-1
    // sweep plan: 196 KB of treeString). Checkpoint collapses it to one
    // LogicalRDD node; same blocks stored, same results, lineage
    // truncated like the per-round labels below.
    val p = graft.core.Lineage.cut(
      pairs.select(col(aCol).as("u"), col(bCol).as("v")))
    // Undirected = both directions, plus a self-loop per node so one
    // join+agg computes min(own, neighbors') directly. No distinct():
    // duplicate edges cannot change a MIN.
    // Pre-partitioned by the sweep's join key (guide §2.4 "share one
    // exchange"): every round joins edges on `v`, so paying the edge
    // shuffle ONCE here lets each round's sort-merge join reuse the
    // partitioning instead of re-exchanging the big side per iteration
    // — per-round shuffle cost drops from O(E + nodes) to O(nodes).
    // Eager localCheckpoint keeps that partitioning in the LogicalRDD
    // AND collapses the 3-way union-of-cache-references plan to one
    // node (the AQE re-render blow-up, see `p` above).
    val nodes = p.select(col("u")).unionByName(p.select(col("v").as("u"))).distinct()
    val edges = graft.core.Lineage.cut(p
      .unionByName(p.select(col("v").as("u"), col("u").as("v")))
      .unionByName(nodes.withColumn("v", col("u")))
      .repartition(col("v")))
    // no materialized init vector: round 1's labels are the identity
    // (label(v) = v), so its sweep is min(v) per u over the edge table
    // directly — one node-scale join and one checkpoint job less per
    // run than materializing (node, node) and joining it (§1.2 "don't
    // compute things you throw away"; at graph scale that join is a
    // full pass over the vector)
    var labels: DataFrame = null
    // sum() over an empty table is NULL — getLong would NPE on a corpus
    // with zero pairs; an empty graph is already converged
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var prevSum = -1L
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // sweep: label <- min over self+neighborhood (self-loops make the
      // "own label" term part of the same aggregation)
      val swept = (
        if (iter == 0) edges.select(col("u"), col("v").as("vlab"))
        else edges
          .join(labels.select(col("node").as("v"), col("label").as("vlab")), "v"))
        .groupBy(col("u")).agg(min(col("vlab")).as("label"))
        .select(col("u").as("node"), col("label"))
        .persist() // self-joined below
      // path halving: label <- label's label (labels are node ids, so the
      // lookup table is the sweep itself; a root keeps its own label via
      // the left join's null)
      val next = graft.core.Lineage.cut(swept
        .join(swept.select(col("node").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("label2"), col("label")).as("label")))
      swept.unpersist()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    // p's and edges' checkpoint blocks release via the context cleaner
    // when the RDDs go out of scope (same lifecycle as the per-round
    // labels)
    if (labels == null) // maxIter = 0: the identity labeling, as before
      nodes.select(col("u").as("node"), col("u").as("label"))
    else labels
  }

  /** INCREMENTAL update: merge a batch of new pairs into an existing
    * (node, label) table without re-running CC over history — the
    * dedup-cluster analogue of the repo's incremental-index discipline
    * (per-run cost tracks the batch, not the corpus).
    *
    * Only components the batch TOUCHES are recomputed: the batch's
    * nodes select their components, those components' members
    * contribute STAR edges (member — root), and [[run]] executes over
    * stars + batch pairs. Stars preserve exactly the old
    * intra-component connectivity (every label is the min member id, so
    * the root is itself a member), so the subgraph solution equals the
    * full recompute restricted to touched components; untouched rows
    * pass through verbatim. Brand-new nodes appear via the batch pairs.
    *
    * Cost: two semi-joins to find touched members, then [[run]] on
    * O(batch + touched members) edges. Worst case (a batch pair touching
    * every component) degrades to a full run — the same bound, never
    * worse. `labels` MUST be a [[run]]-style min-id labeling; anything
    * else breaks the root-is-a-member invariant. */
  def incremental(labels: DataFrame, pairs: DataFrame,
                  aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    // eager checkpoint for the same reason as [[run]]'s pair input: the
    // batch pairs fan into batchNodes + the sub-closure, and a persist
    // would embed the caller's whole pair-mining pipeline in every
    // downstream plan AQE re-renders
    val p = graft.core.Lineage.cut(
      pairs.select(col(aCol).as("u"), col(bCol).as("v")))
    val batchNodes = p.select(col("u"))
      .unionByName(p.select(col("v").as("u"))).distinct()
    val touchedLabels = labels
      .join(batchNodes, labels("node") === batchNodes("u"), "left_semi")
      .select(col("label")).distinct()
      .persist() // feeds both the member semi-join and the anti-join
    touchedLabels.count()
    val touchedMembers = labels.join(touchedLabels, Seq("label"), "left_semi")
    val stars = touchedMembers.filter(col("node") =!= col("label"))
      .select(col("node").as("u"), col("label").as("v"))
    val sub = run(stars.unionByName(p), "u", "v", maxIter)
    val untouched = labels.join(touchedLabels, Seq("label"), "left_anti")
    val out = graft.core.Lineage.cut(
      untouched.select(col("node"), col("label")).unionByName(sub))
    touchedLabels.unpersist()
    out
  }
}
