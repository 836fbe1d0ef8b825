package graft

import org.apache.spark.sql.functions._

import graft.operators.{ApproxAgg, AsOfJoin, ConnectedComponents, RangeJoin, Resample, Sessionize}
import graft.llm.{Curation, Dedup, Packing, Sampling, TextStats}

/** Round-3 operator surface: temporal joins (as-of, range), gap
  * sessionization, sketch aggregates with accuracy audits, deterministic
  * stratified sampling, and vocabulary top-k — the operators a large-scale
  * events/corpus pipeline reaches for beyond the reference's own set.
  *
  * Portability notes (same rules as Queries):
  *  - events.ts is parquet TIMESTAMP(NANOS): Spark reads it truncated to
  *    microseconds (Tables.events), so every oracle comparison happens in
  *    the epoch-microsecond domain (epoch_us both sides).
  *  - DuckDB SUM/aggregates over BIGINT widen to HUGEINT — every summed
  *    BIGINT oracle column is cast back to BIGINT.
  *  - percentile values cross the gate as floor()ed BIGINTs: both engines
  *    interpolate identically (lo + (hi-lo)·frac over the same sorted
  *    doubles), and flooring removes any last-ulp exposure.
  */
object QueriesExt {

  private val SnapThreshold = 150.0 // sparse snapshot source (~5% of events)
  private val AlertThreshold = 300.0 // rare alerts (~0.2% of events)
  private val AsOfTolUs = 6L * 3600 * 1000000 // 6 h
  private val SessionGapUs = 6L * 3600 * 1000000 // 6 h

  // Shared streaming-gate scaffold: copy the events parquet into a fresh
  // source dir, run `build(stream)` (ts already ns->us converted) through
  // a checkpointed AvailableNow parquet sink, and return a reader of the
  // sink. Source and checkpoint dirs are deleted once the query
  // terminates; the sink dir must outlive the call (the returned
  // DataFrame reads it lazily).
  private def runEventStream(
      s: org.apache.spark.sql.SparkSession, dir: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val src = Files.createTempDirectory("graft_stream_src_")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val out = Files.createTempDirectory("graft_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck_")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(src.toString).schema
    val in = s.readStream.schema(schema).parquet(src.toString)
      .withColumn("ts", Tables.eventTs(schema))
    // state partitions sized to gate state, not scan parallelism — see
    // StreamingIncremental.withStatePartitions
    graft.streaming.StreamingIncremental.withStatePartitions(s) {
      val q = build(in).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rm(p: java.nio.file.Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
    rm(src); rm(ckpt)
    s.read.parquet(out)
  }

  // Shared DuckDB CTE chain: minhash near-dup pairs -> undirected edges
  // -> recursive transitive-closure labels (used by dedup_components and
  // dedup_pipeline; prefix with WITH RECURSIVE). The candidate pipeline
  // itself has ONE definition, shared with the dedup_minhash_lsh oracle.
  private def ccCtes: String = s"""${QueriesLlm.minhashCandCtes()},
        p AS (
          SELECT ia id_a, ib id_b
          FROM cand JOIN hs x ON cand.ia = x.doc_id JOIN hs y ON cand.ib = y.doc_id
          WHERE CAST(len(list_intersect(x.h, y.h)) AS DOUBLE) /
                  len(list_distinct(x.h || y.h)) >= 0.8),
        e AS (SELECT id_a u, id_b v FROM p UNION SELECT id_b, id_a FROM p),
        cc(node, label) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, cc.label FROM e JOIN cc ON cc.node = e.v)"""

  val all: Seq[QueryDef] = Seq(

    // ---- as-of join: enrich every event with the latest hourly snapshot
    // (same event_type, snap_ts <= ts, within 6 h) — union+window shape,
    // one shuffle, no per-row subquery. Snapshots are sparse (value-
    // filtered), so matches genuinely reach back and ~40% of events are
    // outside tolerance: both paths exercised.
    QueryDef("asof_enrich",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val snaps = ev.filter(col("value") >= SnapThreshold)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("snap_ts"))
          .agg(count(lit(1)).as("n_snap"))
        AsOfJoin.asOf(
            ev.select("event_id", "event_type", "ts"), snaps,
            key = "event_type", leftTime = "ts", rightTime = "snap_ts",
            payload = Seq("snap_ts", "n_snap"), toleranceUs = Some(AsOfTolUs))
          .select(col("event_id"),
            unix_micros(col("snap_ts")).as("snap_us"),
            col("n_snap"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH e AS (SELECT event_id, event_type, ts FROM events),
        s AS (SELECT event_type, date_trunc('hour', ts) AS snap_ts,
                     CAST(COUNT(*) AS BIGINT) AS n_snap
              FROM events WHERE value >= $SnapThreshold GROUP BY 1, 2)
        SELECT e.event_id,
               CASE WHEN epoch_us(e.ts) - epoch_us(s.snap_ts) <= $AsOfTolUs
                    THEN epoch_us(s.snap_ts) END AS snap_us,
               CASE WHEN epoch_us(e.ts) - epoch_us(s.snap_ts) <= $AsOfTolUs
                    THEN s.n_snap END AS n_snap
        FROM e ASOF LEFT JOIN s
          ON e.event_type = s.event_type AND e.ts >= s.snap_ts
        ORDER BY event_id""")),

    // ---- range join: count the alert windows [alert_ts, alert_ts + 2h)
    // covering each event of the same type — bucketed equi-join + residual,
    // never a per-key cross product.
    QueryDef("range_join_alerts",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val alerts = ev.filter(col("value") >= AlertThreshold)
          .select(col("event_type"),
            col("ts").as("alert_start"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("alert_end"))
        val pairs = RangeJoin.pointInInterval(
          ev.select(col("event_id"), col("event_type"), col("ts")), alerts,
          key = "event_type", pTime = "ts",
          iStart = "alert_start", iEnd = "alert_end",
          bucketSeconds = 3600)
        ev.select("event_id")
          .join(pairs.groupBy("event_id").agg(count(lit(1)).as("n_alerts")),
            Seq("event_id"), "left")
          .select(col("event_id"), coalesce(col("n_alerts"), lit(0L)).as("n_alerts"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH a AS (SELECT event_type, epoch_us(ts) AS astart,
                          epoch_us(ts) + 7200000000 AS aend
                   FROM events WHERE value >= $AlertThreshold)
        SELECT e.event_id, CAST(COUNT(a.astart) AS BIGINT) AS n_alerts
        FROM events e LEFT JOIN a
          ON e.event_type = a.event_type
         AND epoch_us(e.ts) >= a.astart AND epoch_us(e.ts) < a.aend
        GROUP BY e.event_id
        ORDER BY e.event_id""")),

    // ---- interval-overlap join: alert windows [ts, ts+2h) vs incident
    // windows [ts, ts+12h) of the same type — each overlapping pair
    // emitted exactly once (min-shared-bucket trick, no dedup stage).
    QueryDef("interval_overlap",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val alerts = ev.filter(col("value") >= AlertThreshold)
          .select(col("event_type"), col("event_id").as("a_id"),
            col("ts").as("a_start"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("a_end"))
        val incidents = ev.filter(col("value") >= 150 && col("value") < AlertThreshold)
          .select(col("event_type"), col("event_id").as("b_id"),
            col("ts").as("b_start"),
            (col("ts") + expr("INTERVAL 12 HOURS")).as("b_end"))
        RangeJoin.intervalOverlap(alerts, incidents,
            key = "event_type", aStart = "a_start", aEnd = "a_end",
            bStart = "b_start", bEnd = "b_end", bucketSeconds = 3600)
          .select("a_id", "b_id")
          .orderBy("a_id", "b_id")
      },
      Some(s"""
        WITH a AS (SELECT event_type, event_id a_id, epoch_us(ts) s,
                          epoch_us(ts) + 7200000000 e
                   FROM events WHERE value >= $AlertThreshold),
        b AS (SELECT event_type, event_id b_id, epoch_us(ts) s,
                     epoch_us(ts) + 43200000000 e
              FROM events WHERE value >= 150 AND value < $AlertThreshold)
        SELECT a_id, b_id
        FROM a JOIN b ON a.event_type = b.event_type
                     AND a.s < b.e AND b.s < a.e
        ORDER BY a_id, b_id""")),

    // ---- dedup cluster resolution: connected components over the
    // minhash near-dup pairs (min-label propagation + path halving vs
    // DuckDB recursive transitive closure) — pairs -> clusters, the step
    // before "keep one canonical doc per cluster". Minhash clusters at
    // jaccard >= 0.8 are near-cliques, so propagation converges in 2-3
    // rounds.
    QueryDef("dedup_components",
      (s, dir) => {
        val pairs = Dedup.minhashNearDupPairs(
          Tables.read(s, dir, "documents"), "text", "doc_id",
          jaccardThreshold = 0.8)
        ConnectedComponents.run(pairs, "id_a", "id_b")
          .orderBy("node")
      },
      Some(s"""
        WITH RECURSIVE $ccCtes
        SELECT node, MIN(label) AS label
        FROM cc GROUP BY node
        ORDER BY node""")),

    // ---- incremental near-dup: a "new batch" (docs >= 250 plus planted
    // clones of corpus docs) against the existing corpus (docs < 250) —
    // new-vs-corpus and new-vs-new pairs only, never corpus-vs-corpus:
    // per-run cost scales with the batch, not the history.
    QueryDef("dedup_incremental",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val fresh = docs.filter(col("doc_id") >= 250)
          .unionByName(docs
            .filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
            .withColumn("doc_id", col("doc_id") + 200000L))
        Dedup.minhashNearDupPairsIncremental(fresh, corpus, "text", "doc_id",
            jaccardThreshold = 0.8)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 200000, text FROM documents
          WHERE doc_id % 10 = 0 AND doc_id < 250),
        ${QueriesLlm.minhashCandCtes("all_docs")},
        ver AS (
          SELECT ia, ib,
                 CAST(len(list_intersect(x.h, y.h)) AS DOUBLE) /
                   len(list_distinct(x.h || y.h)) jac
          FROM cand JOIN hs x ON cand.ia = x.doc_id JOIN hs y ON cand.ib = y.doc_id)
        SELECT ia AS id_a, ib AS id_b, jac AS jaccard
        FROM ver
        WHERE jac >= 0.8 AND (ia >= 250 OR ib >= 250)
        ORDER BY id_a, id_b""")),

    // ---- the end-to-end dedup pipeline in one call: minhash pairs ->
    // components -> canonical assignment for EVERY doc (its cluster min,
    // itself when unclustered) — what a migrating user actually runs.
    QueryDef("dedup_pipeline",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
          jaccardThreshold = 0.8)
        val labels = ConnectedComponents.run(pairs, "id_a", "id_b")
          .withColumnRenamed("node", "doc_id")
        docs.select(col("doc_id"))
          .join(labels, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("label"), col("doc_id")).as("canonical_id"))
          .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE $ccCtes,
        lab AS (SELECT node, MIN(label) AS label FROM cc GROUP BY node)
        SELECT d.doc_id,
               COALESCE(lab.label, d.doc_id) AS canonical_id,
               d.doc_id = COALESCE(lab.label, d.doc_id) AS is_canonical
        FROM documents d LEFT JOIN lab ON d.doc_id = lab.node
        ORDER BY d.doc_id""")),

    // ---- keep-best-quality canonical selection --------------------------
    // Production dedup keeps the BEST copy, not the lowest id: near-dup
    // clusters (minhash -> connected components) crossed with the quality
    // score; survivor = argmax quality, ties to the lower doc_id.
    QueryDef("keep_best_quality",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.read(s, dir, "documents")
        val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
          jaccardThreshold = 0.8)
        val labels = ConnectedComponents.run(pairs, "id_a", "id_b")
          .withColumnRenamed("node", "doc_id")
        val clustered = docs.select(col("doc_id"))
          .join(labels, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("label"), col("doc_id")).as("cluster_id"))
        val q = TextStats.qualityMetrics(docs, "text", "doc_id")
          .select(col("doc_id"), col("quality_score"))
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("quality_score").desc, col("doc_id"))
        clustered.join(q, "doc_id")
          .withColumn("rk", row_number().over(w))
          .select(col("doc_id"), col("cluster_id"), col("quality_score"),
            (col("rk") === 1).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE $ccCtes,
        lab AS (SELECT node, MIN(label) AS label FROM cc GROUP BY node),
        cl AS (SELECT d.doc_id, COALESCE(lab.label, d.doc_id) AS cluster_id
               FROM documents d LEFT JOIN lab ON d.doc_id = lab.node),
        d2 AS (SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> len(x) > 0) toks,
                 CAST(len(text) AS DOUBLE) n_chars,
                 CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) n_punct
               FROM documents),
        q AS (SELECT doc_id,
                0.4 * (least(n_chars, 500.0) / 500.0)
                + 0.3 * (CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, x -> list_contains(
                      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(toks)
                    ELSE 0.0 END)
                + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
                  AS quality_score
              FROM d2),
        r AS (SELECT cl.doc_id, cluster_id, quality_score,
                row_number() OVER (PARTITION BY cluster_id
                  ORDER BY quality_score DESC, cl.doc_id) rk
              FROM cl JOIN q ON cl.doc_id = q.doc_id)
        SELECT doc_id, cluster_id, quality_score, rk = 1 AS keep
        FROM r
        ORDER BY doc_id""")),

    // ---- grid resample with forward fill: hourly per event_type, value
    // ffilled from the latest observation within 3 h (else a gap).
    QueryDef("resample_hourly",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        // AsOfJoin contract: unique (key, ts) — keep the max-event_id row
        val w = Window.partitionBy("event_type", "ts")
          .orderBy(col("event_id").desc)
        val obs = ev.select(col("event_type"), col("ts"), col("value"), col("event_id"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "event_id")
        Resample.ffill(obs, "event_type", "ts", Seq("ts", "value"),
            stepSeconds = 3600, toleranceUs = Some(3L * 3600 * 1000000))
          .select(col("event_type"),
            unix_micros(col("grid_ts")).as("grid_us"),
            unix_micros(col("ts")).as("obs_us"),
            col("value"))
          .orderBy("event_type", "grid_us")
      },
      Some("""
        WITH e AS (SELECT event_type, epoch_us(ts) tus, value,
                          row_number() OVER (PARTITION BY event_type, epoch_us(ts)
                                             ORDER BY event_id DESC) rn
                   FROM events),
        o AS (SELECT event_type, tus, value FROM e WHERE rn = 1),
        b AS (SELECT event_type,
                     (MIN(tus) // 3600000000) * 3600000000 lo,
                     (MAX(tus) // 3600000000) * 3600000000 hi
              FROM o GROUP BY event_type),
        g AS (SELECT event_type, CAST(r.t AS BIGINT) gus
              FROM b, unnest(range(lo, hi + 1, 3600000000)) r(t)),
        j AS (SELECT g.event_type, g.gus, o.tus, o.value
              FROM g ASOF LEFT JOIN o
                ON g.event_type = o.event_type AND g.gus >= o.tus)
        SELECT event_type, gus AS grid_us,
               CASE WHEN gus - tus <= 10800000000 THEN tus END AS obs_us,
               CASE WHEN gus - tus <= 10800000000 THEN value END AS value
        FROM j
        ORDER BY event_type, grid_us""")),

    // ---- CUBE: all grouping-set combinations (g1_rollup's big sibling) -
    QueryDef("g2_cube",
      (s, dir) =>
        Tables.read(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- gap sessionization: 6-hour inactivity gap per user ------------
    QueryDef("sessionize_events",
      (s, dir) =>
        Sessionize.sessions(
            Tables.events(s, dir).select("user_id", "ts"),
            key = "user_id", ts = "ts", gapUs = SessionGapUs)
          .orderBy("user_id", "session_idx"),
      Some(s"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        g AS (SELECT user_id, tus,
                     CASE WHEN lag(tus) OVER w IS NULL
                            OR tus - lag(tus) OVER w > $SessionGapUs
                          THEN 1 ELSE 0 END AS isnew
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        s AS (SELECT user_id, tus,
                     SUM(isnew) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM g)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               COUNT(*) AS n_events, MIN(tus) AS start_us, MAX(tus) AS end_us
        FROM s GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx""")),

    // ---- HLL distinct with accuracy audit: the gate pins hll_ok=true,
    // i.e. the sketch estimate lands within 5% of exact (both computed
    // Spark-side; exact cross-checked against DuckDB).
    // Heavy hitters over the token stream: exact top-20 cross-engine,
    // Count-Min estimate audited against its structural bounds (never
    // under, over by at most eps*N) — cms_ok pinned true in the oracle.
    QueryDef("heavy_hitters",
      (s, dir) => {
        val toks = Tables.read(s, dir, "documents")
          .select(explode(graft.llm.Dedup.tokens(col("text"))).as("token"))
        graft.operators.ApproxAgg.heavyHittersAudit(toks, "token", k = 20)
          .orderBy(col("n_exact").desc, col("value"))
      },
      Some("""
        WITH t AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
                     x -> len(x) > 0)) token
                   FROM documents),
        c AS (SELECT token AS value, CAST(COUNT(*) AS BIGINT) n_exact
              FROM t GROUP BY 1)
        SELECT value, n_exact, TRUE AS cms_ok
        FROM c ORDER BY n_exact DESC, value LIMIT 20""")),

    QueryDef("approx_distinct_users",
      (s, dir) =>
        ApproxAgg.distinctAudit(Tables.events(s, dir),
            groups = Seq("event_type"), valueCol = "user_id")
          .select(col("event_type"), col("n_exact"), col("hll_ok"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, true AS hll_ok
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- quantile sketch with accuracy audit: exact percentiles cross
    // the gate floored; sketch accuracy pinned via ok flags.
    QueryDef("approx_quantiles_value",
      (s, dir) =>
        ApproxAgg.quantileAudit(Tables.events(s, dir),
            groups = Seq("event_type"), valueCol = "value",
            ps = Seq(0.5, 0.95))
          .select(col("event_type"),
            floor(col("exact_p50")).cast("long").as("p50_floor"),
            floor(col("exact_p95")).cast("long").as("p95_floor"),
            col("ok_p50"), col("ok_p95"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type,
               CAST(floor(quantile_cont(value, 0.5)) AS BIGINT) AS p50_floor,
               CAST(floor(quantile_cont(value, 0.95)) AS BIGINT) AS p95_floor,
               true AS ok_p50, true AS ok_p95
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- deterministic stratified sample: downsample the dominant 'en'
    // stratum to 10%, keep 50% elsewhere — hash-of-id, so the same rows
    // survive on any engine, any partitioning, any rerun.
    QueryDef("stratified_sample",
      (s, dir) =>
        Sampling.stratifiedHashSample(Tables.read(s, dir, "documents"),
            idCol = "doc_id", stratumCol = "lang",
            ratesPct = Map("en" -> 10), defaultPct = 50)
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id, lang
        FROM documents
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100
              < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        ORDER BY doc_id""")),

    // ---- C4-style segment dedup: drop every globally-repeated 10-word
    // chunk, keep first occurrence (min doc_id, seg_idx), reassemble.
    QueryDef("segment_dedup",
      (s, dir) => {
        val prepped = Tables.read(s, dir, "documents")
          .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        Curation.segmentDedup(prepped, "toks", "doc_id",
            t => Curation.wordChunks(t, 10), joinWith = " ")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        seg AS (SELECT doc_id,
                  list_transform(range(0, CAST(ceil(len(w)/10.0) AS INT)),
                    i -> array_to_string(
                      w[(CAST(i AS INT)*10+1):least((CAST(i AS INT)+1)*10, len(w))], ' ')) segs
                FROM d),
        e AS (SELECT doc_id, CAST(r.i AS INT) seg_idx, segs[CAST(r.i AS INT)] seg
              FROM seg, unnest(range(1, len(segs)+1)) r(i)),
        m AS (SELECT doc_id, seg_idx, seg,
                     row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) rn
              FROM e),
        agg AS (
          SELECT doc_id,
                 COUNT(*) AS n_seg,
                 CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '')
                   AS text_clean
          FROM m GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(agg.n_seg, 0) AS n_seg,
               COALESCE(agg.n_kept, 0) AS n_kept,
               COALESCE(agg.text_clean, '') AS text_clean
        FROM d LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id""")),

    // ---- bloom-prefiltered decontamination: SAME oracle as the exact
    // operator below — the broadcast-bloom prune must be semantically
    // invisible (false positives re-verified, no false negatives); only
    // the plan shape changes (map-side prune before any shuffle).
    QueryDef("decontaminate_bloom",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        Curation.decontaminateBloom(docs,
            docs.filter(pmod(col("doc_id"), lit(20L)) === 0),
            "text", "doc_id", shingleN = 3, minHits = 5L)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        sh AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2])) s
               FROM d),
        hs AS (SELECT doc_id,
                 list_distinct(list_transform(s, x -> CAST('0x'||substr(md5(x),1,8) AS BIGINT))) h
               FROM sh),
        e AS (SELECT doc_id, unnest(h) AS h FROM hs),
        bl AS (SELECT DISTINCT h FROM e WHERE doc_id % 20 = 0),
        hits AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) n
                 FROM e JOIN bl USING (h) GROUP BY e.doc_id)
        SELECT d.doc_id,
               COALESCE(hits.n, 0) AS n_contaminated,
               COALESCE(hits.n, 0) >= 5 AS flagged
        FROM d LEFT JOIN hits USING (doc_id)
        ORDER BY doc_id""")),

    // ---- benchmark decontamination: corpus docs sharing >= 5 distinct
    // 3-gram shingles with the simulated benchmark set (doc_id % 20 = 0).
    QueryDef("decontaminate",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        Curation.decontaminate(docs,
            docs.filter(pmod(col("doc_id"), lit(20L)) === 0),
            "text", "doc_id", shingleN = 3, minHits = 5L)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        sh AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2])) s
               FROM d),
        hs AS (SELECT doc_id,
                 list_distinct(list_transform(s, x -> CAST('0x'||substr(md5(x),1,8) AS BIGINT))) h
               FROM sh),
        e AS (SELECT doc_id, unnest(h) AS h FROM hs),
        bl AS (SELECT DISTINCT h FROM e WHERE doc_id % 20 = 0),
        hits AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) n
                 FROM e JOIN bl USING (h) GROUP BY e.doc_id)
        SELECT d.doc_id,
               COALESCE(hits.n, 0) AS n_contaminated,
               COALESCE(hits.n, 0) >= 5 AS flagged
        FROM d LEFT JOIN hits USING (doc_id)
        ORDER BY doc_id""")),

    // ---- PII scrub: plant synthetic email/phone/IP per doc, count and
    // redact — byte-identical RE2-safe regexes on both engines.
    QueryDef("pii_redact",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1 555-000-"), col("doc_id").cast("string"),
            lit(" ip 10.0.0."), pmod(col("doc_id"), lit(255L)).cast("string"))
            .as("text"))
        Curation.piiStats(docs, "text", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                     '@example.com or +1 555-000-' || CAST(doc_id AS VARCHAR) ||
                     ' ip 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) AS t0
                   FROM documents),
        s1 AS (SELECT doc_id, t0,
                      CAST(len(regexp_extract_all(t0, '${Curation.PiiEmailRe}')) AS BIGINT) n_email,
                      regexp_replace(t0, '${Curation.PiiEmailRe}', '<PII>', 'g') t1
               FROM d),
        s2 AS (SELECT doc_id, n_email,
                      CAST(len(regexp_extract_all(t1, '${Curation.PiiIpv4Re}')) AS BIGINT) n_ipv4,
                      regexp_replace(t1, '${Curation.PiiIpv4Re}', '<PII>', 'g') t2
               FROM s1)
        SELECT doc_id, n_email, n_ipv4,
               CAST(len(regexp_extract_all(t2, '${Curation.PiiPhoneRe}')) AS BIGINT) n_phone,
               regexp_replace(t2, '${Curation.PiiPhoneRe}', '<PII>', 'g') AS redacted
        FROM s2
        ORDER BY doc_id""")),

    // ---- Gopher repetition signals: integer counts cross the gate ------
    QueryDef("repetition_metrics",
      (s, dir) =>
        Curation.repetitionMetrics(Tables.read(s, dir, "documents"),
            "text", "doc_id")
          .orderBy("doc_id"),
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        base AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_words,
                        CAST(len(list_distinct(w)) AS BIGINT) n_distinct_words
                 FROM d),
        bg AS (SELECT doc_id,
                      w[CAST(r.i AS INT)] || ' ' || w[CAST(r.i AS INT)+1] AS b
               FROM d, unnest(range(1, len(w))) r(i)),
        cnt AS (SELECT doc_id, b, COUNT(*) c FROM bg GROUP BY 1, 2),
        top AS (SELECT doc_id, MAX(c) t FROM cnt GROUP BY 1)
        SELECT base.doc_id, n_words, n_distinct_words,
               CAST(COALESCE(t, 0) AS BIGINT) AS top_bigram_n
        FROM base LEFT JOIN top USING (doc_id)
        ORDER BY doc_id""")),

    // ---- Gopher composite quality filter: five named rules + keep ------
    // Thresholds chosen so every rule fires both ways on the harness
    // corpus (keep is true for ~10% of sf0.01 documents).
    QueryDef("quality_filter",
      (s, dir) =>
        Curation.gopherQualityFilter(Tables.read(s, dir, "documents"),
            "text", "doc_id",
            Curation.QualityThresholds(
              minWords = 30L, maxWords = 100000L,
              minMeanWordLen = 3.0, maxMeanWordLen = 5.0,
              minStopHits = 3L, maxDupWordFrac = 0.5,
              maxTopBigramFrac = 0.1))
          .orderBy("doc_id"),
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        base AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_words,
                        CAST(len(list_distinct(w)) AS BIGINT) n_distinct,
                        CAST(COALESCE(len(list_aggregate(w, 'string_agg', '')), 0) AS BIGINT) tok_chars,
                        CAST(len(list_filter(w, x -> list_contains(
                          ['the','a','of','and','to','in','is'], x))) AS BIGINT) stop_hits
                 FROM d),
        bg AS (SELECT doc_id,
                      w[CAST(r.i AS INT)] || ' ' || w[CAST(r.i AS INT)+1] AS b
               FROM d, unnest(range(1, len(w))) r(i)),
        top AS (SELECT doc_id, MAX(c) t
                FROM (SELECT doc_id, b, COUNT(*) c FROM bg GROUP BY 1, 2) GROUP BY 1),
        m AS (SELECT base.doc_id, n_words,
                CASE WHEN n_words > 0 THEN CAST(tok_chars AS DOUBLE) / n_words ELSE 0.0 END mean_word_len,
                stop_hits,
                CASE WHEN n_words > 0 THEN (CAST(n_words AS DOUBLE) - n_distinct) / n_words ELSE 0.0 END dup_word_frac,
                CAST(COALESCE(t, 0) AS DOUBLE) / greatest(n_words - 1, 1) top_bigram_frac
              FROM base LEFT JOIN top USING (doc_id))
        SELECT doc_id, n_words, mean_word_len, stop_hits, dup_word_frac, top_bigram_frac,
               (n_words >= 30 AND n_words <= 100000) AS r_words,
               (mean_word_len >= 3.0 AND mean_word_len <= 5.0) AS r_word_len,
               (stop_hits >= 3) AS r_stopwords,
               (dup_word_frac <= 0.5) AS r_dup_words,
               (top_bigram_frac <= 0.1) AS r_top_bigram,
               (n_words >= 30 AND n_words <= 100000
                 AND mean_word_len >= 3.0 AND mean_word_len <= 5.0
                 AND stop_hits >= 3 AND dup_word_frac <= 0.5
                 AND top_bigram_frac <= 0.1) AS keep
        FROM m
        ORDER BY doc_id""")),

    // ---- URL canonicalization + crawl dedup -----------------------------
    // Messy URLs are synthesized deterministically from doc_id (mixed
    // case, www., default ports, tracking params, unordered query,
    // trailing slash, fragments); both engines canonicalize and group.
    QueryDef("url_dedup",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val m = col("doc_id")
        val host = (m % 5).cast("string")
        val art = (m % 25).cast("string")
        val base = when(m % 4 === 0, concat(lit("HTTP://WWW.Site"), host, lit(".COM:80")))
          .when(m % 4 === 1, concat(lit("http://site"), host, lit(".com")))
          .when(m % 4 === 2, concat(lit("https://Site"), host, lit(".com:443")))
          .otherwise(concat(lit("https://site"), host, lit(".com")))
        val url = concat(base, lit("/Articles/"), art,
          when(m % 3 === 0, lit("/")).otherwise(lit("")),
          when(m % 3 === 0, concat(lit("?utm_source=feed&id="), art, lit("&ref=tw")))
            .when(m % 3 === 1, concat(lit("?id="), art))
            .otherwise(concat(lit("?id="), art, lit("&utm_campaign=x"))),
          when(m % 2 === 0, lit("#Section-2")).otherwise(lit("")))
        Curation.urlDedup(docs.select(m, url.as("url")), "url", "doc_id")
          .select(col("canonical_url"), col("doc_id"), col("n_copies"))
          .orderBy("canonical_url")
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            (CASE doc_id % 4
               WHEN 0 THEN 'HTTP://WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.COM:80'
               WHEN 1 THEN 'http://site' || CAST(doc_id % 5 AS VARCHAR) || '.com'
               WHEN 2 THEN 'https://Site' || CAST(doc_id % 5 AS VARCHAR) || '.com:443'
               ELSE 'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.com' END)
            || '/Articles/' || CAST(doc_id % 25 AS VARCHAR)
            || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
            || (CASE doc_id % 3
                  WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR) || '&ref=tw'
                  WHEN 1 THEN '?id=' || CAST(doc_id % 25 AS VARCHAR)
                  ELSE '?id=' || CAST(doc_id % 25 AS VARCHAR) || '&utm_campaign=x' END)
            || (CASE WHEN doc_id % 2 = 0 THEN '#Section-2' ELSE '' END) AS url
          FROM documents),
        c1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*', '') u0 FROM u),
        c2 AS (SELECT doc_id,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*')),
                   '^([a-z+.-]+://)www\.', '\1'), ':(80|443)$', '') head,
                 regexp_replace(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', '') rest
               FROM c1),
        c3 AS (SELECT doc_id, head,
                 regexp_replace(regexp_replace(rest, '\?.*', ''), '/+$', '') pth,
                 CASE WHEN strpos(rest, '?') > 0
                      THEN regexp_replace(rest, '^[^?]*\?', '') ELSE '' END q
               FROM c2),
        c4 AS (SELECT doc_id, head, pth,
                 array_to_string(list_sort(list_filter(string_split(q, '&'),
                   p -> len(p) > 0 AND NOT regexp_matches(p,
                     '^(utm_[a-zA-Z0-9_]+|fbclid|gclid|ref)='))), '&') sq
               FROM c3),
        c5 AS (SELECT doc_id,
                 head || pth || (CASE WHEN len(sq) > 0 THEN '?' || sq ELSE '' END) canonical_url
               FROM c4)
        SELECT canonical_url, MIN(doc_id) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM c5 GROUP BY 1
        ORDER BY canonical_url""")),

    // ---- exact duplicated-span detection (ExactSubstr, Spark-shaped) ---
    // Gram-level corpus-wide occurrence counts, merged to maximal spans
    // per document; the oracle groups by the gram STRING (the Spark side
    // groups by its md5 — same partition, collision-free at 128 bits).
    QueryDef("dup_spans",
      (s, dir) =>
        Curation.duplicatedSpans(Tables.read(s, dir, "documents"),
            "text", "doc_id", minLen = 5)
          .orderBy("doc_id"),
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        n AS (SELECT doc_id, CAST(len(w) AS BIGINT) n_tokens FROM d),
        g AS (SELECT doc_id, CAST(r.i AS INT) pos,
                     array_to_string(list_slice(w, CAST(r.i AS INT), CAST(r.i AS INT) + 4), ' ') gram
              FROM d, unnest(range(1, len(w) - 3)) r(i)),
        dup AS (SELECT gram FROM (SELECT gram, COUNT(*) c FROM g GROUP BY 1) WHERE c > 1),
        f AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
        isl AS (SELECT doc_id, pos,
                  CASE WHEN pos > COALESCE(MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2147483647) + 5
                       THEN 1 ELSE 0 END new_span
                FROM f),
        sp AS (SELECT doc_id, pos, SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) span_id
               FROM isl),
        cov AS (SELECT doc_id, span_id, MAX(pos) + 4 - MIN(pos) + 1 covered
                FROM sp GROUP BY 1, 2),
        agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_dup_spans,
                       CAST(SUM(covered) AS BIGINT) dup_tokens
                FROM cov GROUP BY 1)
        SELECT n.doc_id, n_tokens,
               COALESCE(n_dup_spans, 0) AS n_dup_spans,
               COALESCE(dup_tokens, 0) AS dup_tokens
        FROM n LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id""")),

    // ---- passage excision: remove leaked spans, keep the document ------
    // Blocklist = the first 10 tokens of every doc_id % 100 == 7 (a
    // synthetic eval set drawn from the corpus, so excisions are
    // guaranteed); both engines flag 5-gram hits, merge spans, and
    // reassemble the survivors.
    QueryDef("excise_passages",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val bl = docs.filter(col("doc_id") % 100 === 7)
          .select(col("doc_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 10), " ").as("text"))
        Curation.excisePassages(docs, bl, "text", "doc_id", shingleN = 5)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        blsrc AS (SELECT list_slice(w, 1, 10) bw FROM d WHERE doc_id % 100 = 7),
        bl AS (SELECT DISTINCT array_to_string(
                 list_slice(bw, CAST(r.i AS INT), CAST(r.i AS INT) + 4), ' ') gram
               FROM blsrc, unnest(range(1, len(bw) - 3)) r(i)),
        g AS (SELECT doc_id, CAST(r.i AS INT) pos,
                     array_to_string(list_slice(w, CAST(r.i AS INT), CAST(r.i AS INT) + 4), ' ') gram
              FROM d, unnest(range(1, len(w) - 3)) r(i)),
        f AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM bl)),
        isl AS (SELECT doc_id, pos,
                  CASE WHEN pos > COALESCE(MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2147483647) + 5
                       THEN 1 ELSE 0 END new_span
                FROM f),
        sp AS (SELECT doc_id, pos, SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) span_id
               FROM isl),
        spans AS (SELECT doc_id, span_id, MIN(pos) s, MAX(pos) + 4 e
                  FROM sp GROUP BY 1, 2),
        cov AS (SELECT doc_id, CAST(r.i AS INT) cpos
                FROM spans, unnest(range(s, e + 1)) r(i)),
        tok AS (SELECT doc_id, CAST(r.i AS INT) i, w[CAST(r.i AS INT)] tok
                FROM d, unnest(range(1, len(w) + 1)) r(i)),
        kept AS (SELECT t.doc_id, t.i, t.tok
                 FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.cpos
                 WHERE c.cpos IS NULL),
        agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) text_clean
                FROM kept GROUP BY 1),
        nrem AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_removed FROM cov GROUP BY 1)
        SELECT d.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
               COALESCE(n_removed, 0) AS n_removed,
               COALESCE(text_clean, '') AS text_clean
        FROM d LEFT JOIN agg USING (doc_id) LEFT JOIN nrem USING (doc_id)
        ORDER BY doc_id""")),

    // ---- overlapping context windows: 32-token windows, stride 16 ------
    QueryDef("sliding_windows",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.wsTokenCount(col("text")).cast("long").as("n_tokens"))
        Packing.slidingWindows(docs, "doc_id", "n_tokens", size = 32L, stride = 16L)
          .orderBy("doc_id", "win_idx")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                       x -> len(x) > 0)) AS BIGINT) n
                   FROM documents),
        k AS (SELECT doc_id, n,
                     CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 16 - 1) // 16 END AS last
              FROM d)
        SELECT doc_id, CAST(r.i AS BIGINT) AS win_idx,
               CAST(r.i AS BIGINT) * 16 AS start_tok,
               least(CAST(r.i AS BIGINT) * 16 + 32, n) AS end_tok
        FROM k, unnest(range(0, last + 1)) r(i)
        ORDER BY doc_id, win_idx""")),

    // ---- deterministic sequence packing: 512-token bins, 8 hash shards -
    QueryDef("pack_sequences",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.wsTokenCount(col("text")).cast("long").as("n_tokens"))
        Packing.packBins(docs, "doc_id", "n_tokens",
            maxTokens = 512L, nShards = 8)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                       x -> len(x) > 0)) AS BIGINT) n_tokens,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 8 shard
                   FROM documents),
        c AS (SELECT doc_id, n_tokens, shard,
                     CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) cum
              FROM d)
        SELECT doc_id, CAST(shard AS BIGINT) AS shard,
               cum // 512 AS bin, cum % 512 AS off_in_bin, n_tokens
        FROM c
        ORDER BY doc_id""")),

    // ---- streaming sessionization through the gate: the REAL streaming
    // query (file source → flatMapGroupsWithState(EventTimeTimeout) →
    // parquet sink). Emitted = sessions the final watermark (max event
    // time, ms-truncated) has closed; the newest session per user stays
    // open in state — the oracle applies the same predicate to the batch
    // sessionization.
    QueryDef("stream_sessionize",
      (s, dir) => {
        import s.implicits._
        runEventStream(s, dir) { in =>
          graft.streaming.StreamingIncremental.streamingSessionize(
            in.select("user_id", "ts")
              .withWatermark("ts", "0 seconds")
              .as[graft.streaming.StreamingIncremental.SessIn],
            gapUs = SessionGapUs).toDF()
        }
          .select("user_id", "start_us", "end_us", "n_events")
          .orderBy("user_id", "start_us")
      },
      Some(s"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        g AS (SELECT user_id, tus,
                     CASE WHEN lag(tus) OVER w IS NULL
                            OR tus - lag(tus) OVER w > $SessionGapUs
                          THEN 1 ELSE 0 END AS isnew
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        s AS (SELECT user_id, tus,
                     SUM(isnew) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM g),
        agg AS (SELECT user_id, session_idx, COUNT(*) AS n_events,
                       MIN(tus) AS start_us, MAX(tus) AS end_us
                FROM s GROUP BY user_id, session_idx),
        wm AS (SELECT (MAX(tus) // 1000) * 1000 AS w FROM e)
        SELECT user_id, start_us, end_us, n_events
        FROM agg, wm
        WHERE end_us + $SessionGapUs <= w
        ORDER BY user_id, start_us""")),

    // ---- time-RANGE window frame: 6h trailing count/sum per event (the
    // frame class w1/w2 don't cover — RANGE over event time, not ROWS).
    QueryDef("w3_moving_window",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy("event_type").orderBy(col("tus"))
          .rangeBetween(-AsOfTolUs, 0) // 6 h trailing, inclusive
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"), col("value"))
          .select(col("event_id"), col("event_type"),
            count(lit(1)).over(w).as("n_6h"),
            Queries.scaledLong(
              sum(col("value").cast(DecimalType(30, 10))).over(w)).as("sum_6h"))
          .orderBy("event_id")
      },
      Some(s"""
        WITH e AS (SELECT event_id, event_type, epoch_us(ts) tus, value FROM events)
        SELECT event_id, event_type,
               COUNT(*) OVER w AS n_6h,
               CAST(CAST(round(SUM(CAST(value AS DECIMAL(30,10))) OVER w, 4)
                    AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_6h
        FROM e
        WINDOW w AS (PARTITION BY event_type ORDER BY tus
                     RANGE BETWEEN $AsOfTolUs PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ---- streaming watermarked tumbling-window counts through the gate:
    // append mode emits a window once the watermark passes its end, so
    // the oracle is the batch tumbling aggregation restricted to windows
    // closed by the final watermark (max event time, ms-truncated).
    QueryDef("stream_windowed_counts",
      (s, dir) =>
        runEventStream(s, dir) { in =>
          graft.streaming.StreamingIncremental
            .windowedCounts(in.select("event_type", "ts", "value"),
              "ts", "event_type", windowLen = "1 hour", watermark = "0 seconds")
            .select(unix_micros(col("window_start")).as("win_us"),
              col("event_type"), col("n"))
        }.orderBy("event_type", "win_us"),
      Some("""
        WITH e AS (SELECT event_type, epoch_us(ts) tus FROM events),
        w AS (SELECT event_type, (tus // 3600000000) * 3600000000 AS win_us,
                     COUNT(*) AS n
              FROM e GROUP BY event_type, win_us),
        wm AS (SELECT (MAX(tus) // 1000) * 1000 AS m FROM e)
        SELECT win_us, event_type, n
        FROM w, wm
        WHERE win_us + 3600000000 <= m
        ORDER BY event_type, win_us""")),

    // ---- multimodal audio-analog features: exact integer energy and
    // zero-crossing count over the stub PCM view of the payload.
    QueryDef("mm_audio_features",
      (s, dir) => {
        implicit val sp = s
        graft.llm.Multimodal.audioFeatures(
            graft.llm.Multimodal.mediaTable(Tables.read(s, dir, "documents")))
          .toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH b AS (
          SELECT doc_id,
                 list_transform(range(1, strlen(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1)) - 128) s
          FROM documents)
        SELECT doc_id,
               CAST(len(s) AS BIGINT) AS n_samples,
               CAST(COALESCE(list_sum(list_transform(s, x -> x * x)), 0) AS BIGINT) AS sum_sq,
               CAST(len(list_filter(range(1, len(s)),
                 i -> (s[CAST(i AS INT)] < 0) != (s[CAST(i AS INT) + 1] < 0))) AS BIGINT)
                 AS zero_crossings
        FROM b
        ORDER BY doc_id""")),

    // ---- full-outer join with unmatched rows on BOTH sides -------------
    QueryDef("j2_full_outer",
      (s, dir) => {
        val cust = Tables.read(s, dir, "customer")
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"))
        val ords = Tables.read(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_custkey").isNotNull.as("has_cust"),
            col("o_custkey").isNotNull.as("has_orders"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("custkey")
      },
      Some("""
        WITH c AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY o_custkey)
        SELECT COALESCE(c_custkey, o_custkey) AS custkey,
               c_custkey IS NOT NULL AS has_cust,
               o_custkey IS NOT NULL AS has_orders,
               COALESCE(n_orders, 0) AS n_orders
        FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        ORDER BY custkey""")),

    // ---- deterministic k-means: trained coarse quantizer over the
    // embeddings (stride init, 5 fixed Lloyd iterations, centroid
    // rounding — fully reproducible). Gate pins the cluster sizes with
    // the derived corpus_rows guard (same pattern as the ANN recall
    // oracles).
    QueryDef("kmeans_clusters",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val nCorpus = emb.count()
        val cents = graft.llm.KMeans.fit(emb, "embedding", "vec_id",
          k = 8, iters = 5, corpusRows = Some(nCorpus))
        graft.llm.KMeans.assign(emb, "embedding", cents)
          .groupBy("cid").agg(count(lit(1)).as("n_members"))
          .select(col("cid").cast("long").as("cid"), col("n_members"),
            lit(nCorpus).as("corpus_rows"))
          .orderBy("cid")
      },
      Some {
        val sizes = Seq(57L, 63L, 62L, 54L, 69L, 65L, 57L, 73L)
        val values = sizes.zipWithIndex.map { case (n, c) =>
          s"(CAST($c AS BIGINT), CAST($n AS BIGINT), CAST(500 AS BIGINT))"
        }.mkString(", ")
        s"""
        SELECT * FROM (VALUES $values) v(cid, n_members, corpus_rows)
        ORDER BY cid"""
      }),

    // ---- Z-order clustering key: bit-interleaved (doc_id, n_chars) —
    // identical integer arithmetic on both engines.
    QueryDef("zorder_key",
      (s, dir) =>
        Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            graft.operators.ZOrder.zValue(col("doc_id"), col("n_chars")).as("z"))
          .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id,
               ${graft.operators.ZOrder.zValueSql("doc_id", "n_chars")} AS z
        FROM documents
        ORDER BY doc_id""")),

    // ---- quarantine split: per-row rule violations over events ---------
    QueryDef("quarantine_events",
      (s, dir) => {
        val tagged = graft.operators.Quarantine.tag(Tables.events(s, dir), Seq(
          "nonneg_value" -> (col("value") >= 0),
          "known_user" -> (col("user_id") < 100),
          "has_k" -> get_json_object(col("props"), "$.k").isNotNull))
        tagged.select(col("event_id"),
            size(col("violations")).cast("long").as("n_violations"),
            concat_ws(",", col("violations")).as("violated"))
          .orderBy("event_id")
      },
      Some("""
        WITH t AS (SELECT event_id,
                     CASE WHEN (value >= 0) IS TRUE THEN NULL ELSE 'nonneg_value' END v1,
                     CASE WHEN (user_id < 100) IS TRUE THEN NULL ELSE 'known_user' END v2,
                     CASE WHEN (json_extract(props, '$.k') IS NOT NULL) IS TRUE
                          THEN NULL ELSE 'has_k' END v3
                   FROM events)
        SELECT event_id,
               CAST(CAST(v1 IS NOT NULL AS INT) + CAST(v2 IS NOT NULL AS INT)
                    + CAST(v3 IS NOT NULL AS INT) AS BIGINT) AS n_violations,
               COALESCE(concat_ws(',', v1, v2, v3), '') AS violated
        FROM t
        ORDER BY event_id""")),

    // ---- vocabulary head: top-100 tokens, count-desc / token-asc -------
    QueryDef("vocab_topk",
      (s, dir) =>
        TextStats.topTokens(Tables.read(s, dir, "documents"), "text", 100),
      Some("""
        WITH t AS (
          SELECT unnest(list_filter(string_split(lower(text), ' '),
                                    x -> len(x) > 0)) AS token
          FROM documents)
        SELECT token, COUNT(*) AS n
        FROM t GROUP BY token
        ORDER BY n DESC, token
        LIMIT 100"""))
  )
}
