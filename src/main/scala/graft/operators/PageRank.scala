package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weighted PageRank over an edge list — the domain-authority signal a
  * web-corpus curation stack ranks hosts with (Common Crawl publishes
  * exactly this style of host-level centrality for corpus selection;
  * cf. Page et al. 1999). The reference library has no graph operator —
  * this extends the curation surface: feed it the host→host link graph
  * and use the ranks as a quality prior in [[graft.llm.Curation]]
  * filters, domain quotas, and mixing weights. [[personalized]] is the
  * topic-focused variant (teleport restricted to a SEED set — "rank
  * hosts by authority as seen from these trusted domains").
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
  * Per iteration (uniform variant; the personalized one concentrates
  * the base and dangling terms on the seed set):
  *   dm      = idiv(Σ_{dangling v} r_v, N)          -- redistributed mass
  *   c_e     = idiv(r_src · w_e, W_src)             -- per-edge share
  *   in_v    = Σ_{e into v} c_e
  *   r'_v    = idiv((dampDen−dampNum)·scale, dampDen)
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
  * are localCheckpointed per iteration (they feed BOTH the dangling sum
  * and the contribution join — PLANS.md rule 7 — and the lineage cut
  * keeps plan size constant; without it ~25 iterations OOM'd the driver
  * building explain trees). */
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
    * BIGINT.
    *
    * `tolL1`: when set, iteration stops early once the L1 delta
    * Σ|r'−r| ≤ tolL1 (one extra node-scale join per iteration);
    * `iters` remains the hard cap. */
  def rank(edges: DataFrame, srcCol: String, dstCol: String,
           weightCol: Option[String] = None, iters: Int = 10,
           dampNum: Long = 85L, dampDen: Long = 100L,
           scale: Long = 1000000L,
           tolL1: Option[Long] = None): DataFrame =
    core(edges, srcCol, dstCol, weightCol, iters, dampNum, dampDen,
      scale, tolL1, seeds = None)

  /** WARM-START rank: continue iterating from a previous (node, pr)
    * vector instead of the uniform init — the incremental-authority
    * maintenance shape for a GROWING link graph (daily crawl batches
    * append edges; re-ranking from yesterday's vector reaches the new
    * fixed point in a fraction of the iterations a cold start needs,
    * because the old scores are already near it for the unchanged bulk
    * of the graph). Nodes new to the graph initialize at `scale`
    * (the cold init); nodes that left the graph drop out with their
    * mass. Same fixed-point/oracle contract as [[rank]] — a warm run
    * at fixed iters is replayed exactly by [[oracleSqlWarm]]. */
  def rankWarm(edges: DataFrame, prev: DataFrame,
               srcCol: String, dstCol: String,
               weightCol: Option[String] = None, iters: Int = 10,
               dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000L,
               tolL1: Option[Long] = None): DataFrame =
    core(edges, srcCol, dstCol, weightCol, iters, dampNum, dampDen,
      scale, tolL1, seeds = None,
      init = Some(prev.select(col("node").cast("long").as("v"),
        col("pr").cast("long").as("r"))))

  /** PERSONALIZED PageRank: the restart distribution concentrates on
    * `seeds` (a one-column frame of node ids) — the (1−d) base term and
    * the dangling mass land on seeds only, so authority is measured
    * from the seed set's vantage (topic-focused domain ranking:
    * seed with trusted hosts, rank the rest by how reachable they are
    * from trust). Seeds absent from the graph are ignored; at least
    * one seed must be present. Same fixed-point/oracle contract as
    * [[rank]]. */
  def personalized(edges: DataFrame, seeds: DataFrame, seedCol: String,
                   srcCol: String, dstCol: String,
                   weightCol: Option[String] = None, iters: Int = 10,
                   dampNum: Long = 85L, dampDen: Long = 100L,
                   scale: Long = 1000000L,
                   tolL1: Option[Long] = None): DataFrame =
    core(edges, srcCol, dstCol, weightCol, iters, dampNum, dampDen,
      scale, tolL1,
      seeds = Some(seeds.select(col(seedCol).cast("long").as("v")).distinct()))

  private def core(edges: DataFrame, srcCol: String, dstCol: String,
                   weightCol: Option[String], iters: Int,
                   dampNum: Long, dampDen: Long, scale: Long,
                   tolL1: Option[Long],
                   seeds: Option[DataFrame],
                   init: Option[DataFrame] = None): DataFrame = {
    require(iters > 0, "PageRank: iters must be positive")
    require(dampNum > 0 && dampDen > dampNum,
      "PageRank: need 0 < dampNum < dampDen")
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
    // seed membership rides the node table as a boolean column — one
    // setup join (broadcast only under the graft.llm.Denylist ceiling:
    // a trusted-host list broadcasts, a million-node seed set costs a
    // shuffle, never a driver OOM), zero per-iteration seed work
    val nodes0 = ea.select(col("src").as("v"))
      .union(ea.select(col("dst").as("v")))
      .distinct()
    val nodes = seeds.fold(nodes0.withColumn("is_seed", lit(true))) { s =>
      val side = graft.llm.Denylist.sizedByCount(edges.sparkSession,
        s.withColumn("is_seed", lit(true)), s.count())
      nodes0.join(side, Seq("v"), "left")
        .select(col("v"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // a non-positive edge weight would emit negative/zero shares and
      // silently corrupt the whole vector — refuse up front (reads the
      // just-persisted cache, no extra edge scan)
      val minWRow = ew.agg(min(col("w"))).first()
      require(!minWRow.isNullAt(0), "PageRank: empty edge list")
      require(minWRow.getLong(0) > 0,
        s"PageRank: edge weights must be positive (found ${minWRow.getLong(0)})")
      val n = nodes.count()
      val nBase = seeds.fold(n) { _ =>
        nodes.filter(col("is_seed")).count()
      }
      require(nBase > 0, "PageRank.personalized: no seed is present in the graph")
      // uniform: base lands on every node (nBase = n, factor n/n = 1);
      // personalized: total base mass (1-d)·N·scale concentrates on the
      // seeds. Overflow guard: the seed base multiplies N·scale.
      require(seeds.isEmpty ||
        n <= Long.MaxValue / scale / math.max(1L, dampDen - dampNum),
        "PageRank.personalized: N*scale too large for the seed base term")
      val base =
        if (seeds.isEmpty) ((dampDen - dampNum) * scale) / dampDen
        else ((dampDen - dampNum) * scale * n) / (dampDen * nBase)
      val dangling = nodes.select("v")
        .join(outw.select(col("src").as("v")), Seq("v"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      var r = init.fold(nodes.select(col("v"), lit(scale).as("r"))) { p =>
          nodes.select("v")
            .join(p.select(col("v"), col("r").as("r_prev")), Seq("v"), "left")
            .select(col("v"), coalesce(col("r_prev"), lit(scale)).as("r"))
        }.persist(StorageLevel.MEMORY_AND_DISK)
      var it = 0
      var done = false
      while (!done && it < iters) {
        // the dangling mass rides the SAME job as the rank pass: a
        // 1-row broadcast cross join instead of a driver-scalar action
        // per iteration (was: one extra pass over the rank vector per
        // iteration just to fetch Σ_dangling to the driver — identical
        // integer math, half the per-iteration actions)
        val dangRow = broadcast(r.join(dangling, Seq("v"), "left_semi")
          .agg(coalesce(sum("r"), lit(0L)).as("__dang")))
        val dmExpr = s"(__dang div $nBase)" // per-recipient dangling share
        val contrib = ew.join(r, ew("src") === r("v"))
          .select(col("dst"), expr("(r * w) div wt").as("c"))
          .groupBy("dst").agg(sum("c").as("c"))
        val rankCol =
          (when(col("is_seed"), lit(base)).otherwise(
            if (seeds.isEmpty) lit(base) else lit(0L))
            + expr(s"($dampNum * (coalesce(c, 0) + " +
              s"(case when is_seed then $dmExpr else ${if (seeds.isEmpty) dmExpr else "0"} end))) div $dampDen"))
            .as("r")
        val updated = nodes.join(contrib, nodes("v") === contrib("dst"), "left")
          .crossJoin(dangRow)
        // tol variants carry the PREVIOUS rank through the same job (an
        // equi-join on the already-materialized vector) so the L1 delta
        // is one aggregate over the checkpoint blocks — no second
        // node-scale join pass per iteration. The rank column itself is
        // the identical expression either way.
        // Partitioning note (§2.4): at scale the nodes⋈contrib join is
        // a sort-merge keyed on `v`, so the checkpointed LogicalRDD
        // already carries HashPartitioning(v) into the next iteration's
        // `v`-keyed joins — an explicit repartition(v) here was
        // measured to only ADD an exchange in the broadcast regime
        // (pagerank_warm 4.8 → 5.8 s) while duplicating what the SMJ
        // output partitioning provides for free in the shuffle regime.
        // lineage cut via Lineage.cut: localCheckpoint by default, a
        // reliable checkpoint under spark.graft.checkpoint.dir (the
        // cluster fault-tolerance posture — one executor loss must not
        // rerun the whole iteration chain at 100 TB)
        val next = graft.core.Lineage.cut(tolL1 match {
          case Some(_) =>
            updated.join(r.select(col("v").as("__pv"), col("r").as("__rp")),
                col("v") === col("__pv"))
              .select(nodes("v"), rankCol, col("__rp"))
          case None => updated.select(nodes("v"), rankCol)
        })
        tolL1.foreach { tol =>
          val delta = next
            .agg(coalesce(sum(abs(col("r") - col("__rp"))), lit(0L)))
            .first().getLong(0)
          if (delta <= tol) done = true
        }
        r.unpersist()
        r = if (tolL1.isDefined) next.select(col("v"), col("r")) else next
        it += 1
      }
      dangling.unpersist()
      r.select(col("v").as("node"), col("r").as("pr"))
    } finally {
      ew.unpersist()
      nodes.unpersist()
    }
  }

  // ---- DuckDB oracle ----------------------------------------------------

  /** Unrolled DuckDB SQL replaying [[rank]] (or, with `seedsSql`,
    * [[personalized]]) exactly. `edgesSql` must yield (src, dst, w)
    * rows; `seedsSql` one `v` column. Tolerance-stopped runs cannot be
    * unrolled — gate on fixed iters. */
  def oracleSql(edgesSql: String, iters: Int,
                dampNum: Long = 85L, dampDen: Long = 100L,
                scale: Long = 1000000L,
                seedsSql: Option[String] = None): String = {
    val seedCtes = seedsSql.map(s =>
      s""",
         |seeds AS (SELECT DISTINCT v FROM ($s) WHERE v IN (SELECT v FROM nodes)),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM seeds)""".stripMargin)
      .getOrElse("")
    val base =
      s"""WITH e AS ($edgesSql),
         |ea AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM e GROUP BY 1, 2),
         |outw AS (SELECT src, SUM(w) AS wt FROM ea GROUP BY 1),
         |nodes AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM ea UNION ALL SELECT dst FROM ea)),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nodes)$seedCtes,
         |r0 AS (SELECT v, CAST($scale AS BIGINT) AS r FROM nodes)""".stripMargin
    val uniform = seedsSql.isEmpty
    val baseExpr =
      if (uniform) s"(($dampDen - $dampNum) * $scale) // $dampDen"
      else
        s"""CASE WHEN n.v IN (SELECT v FROM seeds)
           |  THEN (($dampDen - $dampNum) * $scale * (SELECT c FROM nn))
           |         // ($dampDen * (SELECT c FROM ns))
           |  ELSE 0 END""".stripMargin
    def dmExpr(k: Int) =
      if (uniform) s"(SELECT ds // (SELECT c FROM nn) FROM d$k)"
      else
        s"""CASE WHEN n.v IN (SELECT v FROM seeds)
           |  THEN (SELECT ds // (SELECT c FROM ns) FROM d$k)
           |  ELSE 0 END""".stripMargin
    val iterCtes = (1 to iters).map { k =>
      val rp = s"r${k - 1}"
      s"""d$k AS (SELECT COALESCE(SUM(r.r), 0) AS ds FROM $rp r
         |        WHERE r.v NOT IN (SELECT src FROM ea)),
         |c$k AS (SELECT e.dst AS v, SUM((r.r * e.w) // o.wt) AS c
         |        FROM ea e JOIN $rp r ON r.v = e.src
         |                  JOIN outw o ON o.src = e.src
         |        GROUP BY 1),
         |r$k AS (SELECT n.v,
         |          $baseExpr
         |          + ($dampNum * (COALESCE(c$k.c, 0)
         |               + ${dmExpr(k)})) // $dampDen AS r
         |        FROM nodes n LEFT JOIN c$k ON c$k.v = n.v)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iterCtes\nSELECT CAST(v AS BIGINT) AS node, CAST(r AS BIGINT) AS pr FROM r$iters ORDER BY node"
  }

  /** One uniform-variant phase's CTE text with `prefix`-scoped names
    * and a caller-supplied `r0` body — the building block
    * [[oracleSqlWarm]] chains two of. */
  private def uniformPhaseCtes(prefix: String, edgesSql: String,
                               iters: Int, dampNum: Long, dampDen: Long,
                               r0Sql: String): String = {
    def nm(n: String) = s"$prefix$n"
    val head =
      s"""${nm("e")} AS ($edgesSql),
         |${nm("ea")} AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM ${nm("e")} GROUP BY 1, 2),
         |${nm("outw")} AS (SELECT src, SUM(w) AS wt FROM ${nm("ea")} GROUP BY 1),
         |${nm("nodes")} AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM ${nm("ea")} UNION ALL SELECT dst FROM ${nm("ea")})),
         |${nm("nn")} AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM ${nm("nodes")}),
         |${nm("r0")} AS ($r0Sql)""".stripMargin
    val baseExpr = s"(($dampDen - $dampNum) * 1000000) // $dampDen"
    val iterCtes = (1 to iters).map { k =>
      val rp = nm(s"r${k - 1}")
      s"""${nm(s"d$k")} AS (SELECT COALESCE(SUM(r.r), 0) AS ds FROM $rp r
         |        WHERE r.v NOT IN (SELECT src FROM ${nm("ea")})),
         |${nm(s"c$k")} AS (SELECT e.dst AS v, SUM((r.r * e.w) // o.wt) AS c
         |        FROM ${nm("ea")} e JOIN $rp r ON r.v = e.src
         |                  JOIN ${nm("outw")} o ON o.src = e.src
         |        GROUP BY 1),
         |${nm(s"r$k")} AS (SELECT n.v,
         |          $baseExpr
         |          + ($dampNum * (COALESCE(${nm(s"c$k")}.c, 0)
         |               + (SELECT ds // (SELECT c FROM ${nm("nn")}) FROM ${nm(s"d$k")}))) // $dampDen AS r
         |        FROM ${nm("nodes")} n LEFT JOIN ${nm(s"c$k")} ON ${nm(s"c$k")}.v = n.v)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$iterCtes"
  }

  /** Unrolled DuckDB SQL replaying a cold [[rank]] over `edgesSql1`
    * (`iters1` iterations) followed by a [[rankWarm]] continuation
    * over `edgesSql2` (`iters2` iterations seeded from phase 1's
    * vector; nodes new in phase 2 start at `scale`) — bit-exact, like
    * [[oracleSql]]. Uniform variant only; `scale` is fixed at 1e6
    * (the default) to keep the unrolled text simple. */
  def oracleSqlWarm(edgesSql1: String, iters1: Int,
                    edgesSql2: String, iters2: Int,
                    dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val p1 = uniformPhaseCtes("p1_", edgesSql1, iters1, dampNum, dampDen,
      r0Sql = "SELECT v, CAST(1000000 AS BIGINT) AS r FROM p1_nodes")
    val p2 = uniformPhaseCtes("", edgesSql2, iters2, dampNum, dampDen,
      r0Sql = s"""SELECT n.v, COALESCE(p.r, CAST(1000000 AS BIGINT)) AS r
                 |       FROM nodes n LEFT JOIN p1_r$iters1 p ON p.v = n.v""".stripMargin)
    s"WITH $p1,\n$p2\n" +
      s"SELECT CAST(v AS BIGINT) AS node, CAST(r AS BIGINT) AS pr " +
      s"FROM r$iters2 ORDER BY node"
  }
}
