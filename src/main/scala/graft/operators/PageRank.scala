package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted PageRank over an edge list — the domain-authority signal a
  * web-corpus curation stack ranks hosts with (Common Crawl publishes
  * exactly this style of host-level centrality for corpus selection;
  * cf. Page et al. 1999). The reference library has no graph operator —
  * this extends the curation surface: feed it the host→host link graph
  * and use the ranks as a quality prior in [[graft.llm.Curation]]
  * filters, domain quotas, and mixing weights.
  *
  * CROSS-ENGINE EXACT: ranks are fixed-point BIGINT micros, the damping
  * split is rational (`dampNum/dampDen`), and every division is integer
  * division (truncate-toward-zero in both Spark `div` and DuckDB `//`),
  * so a DuckDB oracle replays all iterations bit-for-bit. Truncation
  * happens per edge BEFORE the destination sum, keeping partial
  * aggregation order-independent. The usual float PageRank invariant
  * (Σr = 1) holds only up to truncation dust — deterministic dust, the
  * same on both engines.
  *
  * Per iteration:
  *   dm      = idiv(Σ_{dangling v} r_v, N)          -- redistributed mass
  *   c_e     = idiv(r_src · w_e, W_src)             -- per-edge share
  *   in_v    = Σ_{e into v} c_e
  *   r'_v    = idiv((dampDen−dampNum)·scale, dampDen·N)
  *           + idiv(dampNum · (in_v + dm), dampDen)
  *
  * Distribution shape (the 100 TB audit): the edge frame joins its
  * out-weight once, is repartitioned by src and PERSISTED — iterations
  * never re-shuffle the edges (at web scale |E| ≫ |V|, this is the
  * frame that must not move). Each iteration shuffles only node-scale
  * rows: ranks align to src for the contribution join (AQE broadcasts
  * them under the threshold — the common case while |V| ≪ |E|), the
  * destination sum is a map-side-combinable hash aggregate, and the
  * dangling mass is one driver scalar (the DSIR-totals pattern). Ranks
  * are persisted per iteration (they feed BOTH the dangling sum and the
  * contribution join — PLANS.md rule 7) and the previous iteration's
  * cache is released. */
object PageRank {

  /** Rank every node of `edges` (parallel edges are pre-summed; nodes
    * are the union of sources and destinations; a node with no
    * out-edges is dangling and redistributes its mass uniformly).
    * Returns (node, pr).
    *
    * `scale` is the PER-NODE initial rank (total mass = N·scale) — NOT
    * the total. This keeps fixed-point precision independent of graph
    * size: with a total-mass scale, per-node ranks at |V| ≥ scale
    * truncate to zero and the whole vector underflows (measured: a
    * 500k-node probe at total-scale 1e6 lost ALL mass by iteration 5).
    * Per-node scale 1e6 holds to ~9e12 nodes before the Σ overflows
    * BIGINT. */
  def rank(edges: DataFrame, srcCol: String, dstCol: String,
           weightCol: Option[String] = None, iters: Int = 10,
           dampNum: Long = 85L, dampDen: Long = 100L,
           scale: Long = 1000000L): DataFrame = {
    require(iters > 0, "PageRank.rank: iters must be positive")
    require(dampNum > 0 && dampDen > dampNum,
      "PageRank.rank: need 0 < dampNum < dampDen")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val ea = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = ea.groupBy("src").agg(sum("w").as("wt"))
    // the corpus-scale frame: shuffled by src ONCE, reused every iteration
    val ew = ea.join(outw, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = ea.select(col("src").as("v"))
      .union(ea.select(col("dst").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = nodes.count()
      val dangling = nodes.join(outw.select(col("src").as("v")), Seq("v"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val base = ((dampDen - dampNum) * scale) / dampDen
      var r = nodes.select(col("v"), lit(scale).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var it = 0
      while (it < iters) {
        val dangSum = r.join(dangling, Seq("v"), "left_semi")
          .agg(coalesce(sum("r"), lit(0L))).first().getLong(0)
        val dm = dangSum / n
        val contrib = ew.join(r, ew("src") === r("v"))
          .select(col("dst"), expr("(r * w) div wt").as("c"))
          .groupBy("dst").agg(sum("c").as("c"))
        // localCheckpoint CUTS THE LINEAGE — without it each iteration
        // nests the previous plan and analysis cost (and plan strings)
        // grow without bound; ~25 iterations OOM'd the driver building
        // explain trees. The checkpointed frame is node-scale (|V|
        // rows), cached in executor storage — the per-iteration state
        // an iterative algorithm is supposed to carry.
        val next = nodes.join(contrib, nodes("v") === contrib("dst"), "left")
          .select(col("v"),
            (lit(base) + expr(s"($dampNum * (coalesce(c, 0) + $dm)) div $dampDen"))
              .as("r"))
          .localCheckpoint(true)
        r.unpersist()
        r = next
        it += 1
      }
      dangling.unpersist()
      r.select(col("v").as("node"), col("r").as("pr"))
    } finally {
      // ew/nodes stay cached through the returned frame's lineage only
      // if the caller executes before session end; the returned frame is
      // rooted at the materialized `r`, so these caches can be released.
      ew.unpersist()
      nodes.unpersist()
    }
  }

  // ---- DuckDB oracle ----------------------------------------------------

  /** Unrolled DuckDB SQL replaying [[rank]] exactly. `edgesSql` must
    * yield (src, dst, w) rows. */
  def oracleSql(edgesSql: String, iters: Int,
                dampNum: Long = 85L, dampDen: Long = 100L,
                scale: Long = 1000000L): String = {
    val base =
      s"""WITH e AS ($edgesSql),
         |ea AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM e GROUP BY 1, 2),
         |outw AS (SELECT src, SUM(w) AS wt FROM ea GROUP BY 1),
         |nodes AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM ea UNION ALL SELECT dst FROM ea)),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nodes),
         |r0 AS (SELECT v, CAST($scale AS BIGINT) AS r FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { k =>
      val rp = s"r${k - 1}"
      s"""d$k AS (SELECT COALESCE(SUM(r.r), 0) AS ds FROM $rp r
         |        WHERE r.v NOT IN (SELECT src FROM ea)),
         |c$k AS (SELECT e.dst AS v, SUM((r.r * e.w) // o.wt) AS c
         |        FROM ea e JOIN $rp r ON r.v = e.src
         |                  JOIN outw o ON o.src = e.src
         |        GROUP BY 1),
         |r$k AS (SELECT n.v,
         |          (($dampDen - $dampNum) * $scale) // $dampDen
         |          + ($dampNum * (COALESCE(c$k.c, 0)
         |               + (SELECT ds // (SELECT c FROM nn) FROM d$k))) // $dampDen AS r
         |        FROM nodes n LEFT JOIN c$k ON c$k.v = n.v)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iterCtes\nSELECT v AS node, r AS pr FROM r$iters ORDER BY node"
  }
}
