package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 gate queries: forward / nearest as-of directions (the
  * backward path has been gated since `asof_enrich`; these pin the other
  * two directions' semantics — frame orientation, per-direction
  * tolerance, exact ties breaking backward — against a window-free
  * DuckDB formulation). */
object QueriesR10 {

  // same snapshot source and tolerance as asof_enrich (QueriesExt):
  // sparse value-filtered snapshots so matches genuinely reach across
  // hours and a real fraction of events fall outside tolerance
  private val SnapThreshold = 150.0
  private val AsOfTolUs = 6L * 3600 * 1000000 // 6 h

  /** Unique 40-word text for the cross-batch containment plant — shares
    * no vocabulary with the corpus or the footer. */
  private val XText = (1 to 40).map(i => s"zzq${i}w").mkString(" ")

  // One frozen DSIR model per sf dir, fit + persisted + read back once —
  // the bpe-gate memoization precedent (deterministic artifact; the
  // roundtrip through parquet stays inside the memoized build, scoring
  // runs per call).
  private val dsirModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.llm.Dsir.Model]()
  private def frozenModel(s: SparkSession, dir: String): graft.llm.Dsir.Model =
    dsirModelCache.computeIfAbsent(dir, _ => {
      import graft.llm.Dsir
      val docs = Tables.read(s, dir, "documents")
      val model = Dsir.fit(docs,
        docs.filter(pmod(col("doc_id"), lit(20L)) === 1),
        "text", nBuckets = 4096)
      val mPath = java.nio.file.Files
        .createTempDirectory("graft_dsir_model_").toString
      Dsir.writeModel(s, model, mPath)
      Dsir.readModel(s, mPath)
    })

  private def snapsOf(ev: org.apache.spark.sql.DataFrame) =
    ev.filter(col("value") >= SnapThreshold)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("snap_ts"))
      .agg(count(lit(1)).as("n_snap"))

  private val OracleCtes = s"""
        WITH e AS (SELECT event_id, event_type, ts FROM events),
        s AS (SELECT event_type, date_trunc('hour', ts) AS snap_ts,
                     CAST(COUNT(*) AS BIGINT) AS n_snap
              FROM events WHERE value >= $SnapThreshold GROUP BY 1, 2)"""

  val all: Seq[QueryDef] = Seq(

    // ---- as-of FORWARD: earliest snapshot at or after each event -------
    // Mirror image of asof_enrich: hourly snapshots land at or AFTER the
    // event (snap_ts >= ts, within 6 h). date_trunc floors, so most
    // matches are genuinely forward-looking and the >= tie shows up on
    // exact-hour events.
    QueryDef("asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.operators.AsOfJoin.asOf(
            ev.select("event_id", "event_type", "ts"), snapsOf(ev),
            key = "event_type", leftTime = "ts", rightTime = "snap_ts",
            payload = Seq("snap_ts", "n_snap"), toleranceUs = Some(AsOfTolUs),
            direction = "forward")
          .select(col("event_id"),
            unix_micros(col("snap_ts")).as("snap_us"),
            col("n_snap"))
          .orderBy("event_id")
      },
      Some(OracleCtes + s""",
        m AS (SELECT e.event_id, e.event_type,
                     min(CASE WHEN s.snap_ts >= e.ts
                               AND epoch_us(s.snap_ts) - epoch_us(e.ts)
                                     <= $AsOfTolUs
                              THEN s.snap_ts END) AS snap_ts
              FROM e LEFT JOIN s ON e.event_type = s.event_type
              GROUP BY 1, 2)
        SELECT m.event_id, epoch_us(m.snap_ts) AS snap_us, s.n_snap
        FROM m LEFT JOIN s
          ON m.event_type = s.event_type AND m.snap_ts = s.snap_ts
        ORDER BY event_id""")),

    // ---- as-of NEAREST: closer of the two directions, ties backward ----
    // Each event takes whichever in-tolerance snapshot is temporally
    // closer; equal distances keep the backward match (the one already
    // knowable at event time). The oracle computes both one-sided bests
    // window-free and applies the same tie rule.
    QueryDef("asof_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.operators.AsOfJoin.asOf(
            ev.select("event_id", "event_type", "ts"), snapsOf(ev),
            key = "event_type", leftTime = "ts", rightTime = "snap_ts",
            payload = Seq("snap_ts", "n_snap"), toleranceUs = Some(AsOfTolUs),
            direction = "nearest")
          .select(col("event_id"),
            unix_micros(col("snap_ts")).as("snap_us"),
            col("n_snap"))
          .orderBy("event_id")
      },
      Some(OracleCtes + s""",
        bf AS (SELECT e.event_id, e.event_type, e.ts,
                      max(CASE WHEN s.snap_ts <= e.ts
                                AND epoch_us(e.ts) - epoch_us(s.snap_ts)
                                      <= $AsOfTolUs
                               THEN s.snap_ts END) AS bt,
                      min(CASE WHEN s.snap_ts >= e.ts
                                AND epoch_us(s.snap_ts) - epoch_us(e.ts)
                                      <= $AsOfTolUs
                               THEN s.snap_ts END) AS ft
               FROM e LEFT JOIN s ON e.event_type = s.event_type
               GROUP BY 1, 2, 3),
        pick AS (SELECT event_id, event_type,
                        CASE WHEN bt IS NOT NULL AND (ft IS NULL OR
                                  epoch_us(ts) - epoch_us(bt)
                                    <= epoch_us(ft) - epoch_us(ts))
                             THEN bt ELSE ft END AS snap_ts
                 FROM bf)
        SELECT p.event_id, epoch_us(p.snap_ts) AS snap_us, s.n_snap
        FROM pick p LEFT JOIN s
          ON p.event_type = s.event_type AND p.snap_ts = s.snap_ts
        ORDER BY event_id""")),

    // ---- DSIR against a FROZEN model (fit once, score daily) -----------
    // The production posture: models fit on the full corpus + target
    // slice, persisted, read back, and a later batch (doc_id % 4 == 2)
    // scored against the frozen artifact — the fitting corpora are never
    // re-read at serve time. Values are bit-identical to dsir_score's on
    // the same docs (the arithmetic depends only on the model), which is
    // exactly what the restricted oracle recomputes.
    QueryDef("dsir_frozen",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        graft.llm.Dsir.scoreWith(frozenModel(s, dir),
            docs.filter(pmod(col("doc_id"), lit(4L)) === 2),
            "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        g AS (SELECT doc_id, unnest(w ||
                CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                  ELSE CAST([] AS VARCHAR[]) END) AS g
              FROM d),
        hb AS (SELECT doc_id,
                 CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 4096 AS bucket
               FROM g),
        rawc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) c FROM hb GROUP BY 1),
        tgtc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) c FROM hb
                 WHERE doc_id % 20 = 1 GROUP BY 1),
        tot AS (SELECT CAST((SELECT COALESCE(SUM(c), 0) FROM rawc) AS BIGINT) tr,
                       CAST((SELECT COALESCE(SUM(c), 0) FROM tgtc) AS BIGINT) tt),
        sc AS (SELECT CAST(least(1000000000,
                       2305843009213693952 // (greatest(tr, tt) + 4096))
                     AS BIGINT) s, tr, tt FROM tot),
        pd AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) c_doc
               FROM hb WHERE doc_id % 4 = 2 GROUP BY 1, 2),
        sb AS (SELECT pd.doc_id, pd.c_doc,
                 CAST((len(bin(sc.s // greatest(
                         ((COALESCE(rawc.c, 0) + 1) * sc.s) // (sc.tr + 4096), 1))) - 1)
                    - (len(bin(sc.s // greatest(
                         ((COALESCE(tgtc.c, 0) + 1) * sc.s) // (sc.tt + 4096), 1))) - 1)
                 AS BIGINT) dbits
               FROM pd CROSS JOIN sc
               LEFT JOIN rawc ON pd.bucket = rawc.bucket
               LEFT JOIN tgtc ON pd.bucket = tgtc.bucket),
        agg AS (SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) n_grams,
                  CAST(SUM(c_doc * dbits) AS BIGINT) dsir_bits
                FROM sb GROUP BY 1)
        SELECT ids.doc_id,
               COALESCE(agg.n_grams, 0) AS n_grams,
               COALESCE(agg.dsir_bits, 0) AS dsir_bits
        FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 4 = 2) ids
        LEFT JOIN agg USING (doc_id)
        ORDER BY ids.doc_id""")),

    // ---- incremental containment served from the materialized index ----
    // Same plant as dedup_containment (8 "expanded" originals + footer),
    // split into the daily shape: the CORPUS is indexed once
    // (ContainIndex.write — shingled once, frozen rarest-first
    // prefixes), then the planted batch is served against the index.
    // The qualifying pairs are original→expanded with the ORIGINAL (an
    // index doc) as the contained A side — exercising exactly the
    // stored-prefix direction a batch-only prefix join would miss. The
    // oracle is dedup_containment's, restricted to batch-touching pairs.
    QueryDef("dedup_containment_indexed",
      (s, dir) => {
        // corpus < 250: the dedup_incremental_indexed sizing precedent —
        // the gate certifies serving semantics; ContainIndexProbe covers
        // the cost-vs-index-size claim
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text").filter(col("doc_id") < 250)
        val batch = docs.filter(col("doc_id") < 8)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(QueriesR9.Footer)).as("text"))
        val path = java.nio.file.Files
          .createTempDirectory("graft_cidx_").toString
        graft.llm.ContainIndex.write(docs, "text", "doc_id", path,
          threshold = 0.9, nBuckets = 16)
        graft.llm.ContainIndex.containmentPairsIncremental(
            s, path, batch, "text", "doc_id", threshold = 0.9)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 250
          UNION ALL
          SELECT doc_id + 300000, text || '${QueriesR9.Footer}' FROM documents
          WHERE doc_id < 8),
        d AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
              FROM aug),
        sh AS (SELECT doc_id,
                 list_transform(range(1, len(w) - 1),
                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1]
                        || ' ' || w[CAST(i AS INT)+2]) s
               FROM d),
        hs AS (SELECT doc_id,
                 list_distinct(list_transform(s,
                   x -> CAST('0x'||substr(md5(x),1,8) AS BIGINT))) h
               FROM sh)
        SELECT a.doc_id id_a, b.doc_id id_b,
               CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) / len(a.h)
                 AS containment
        FROM hs a JOIN hs b ON a.doc_id != b.doc_id
        WHERE len(a.h) > 0 AND len(b.h) > 0
          AND CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) / len(a.h) >= 0.9
          AND (a.doc_id >= 300000 OR b.doc_id >= 300000)
        ORDER BY id_a, id_b""")),

    // ---- streaming containment dedup (serve-then-append loop) ----------
    // The dedup_containment_indexed fixture driven as TWO micro-batches,
    // plus a planted CROSS-BATCH pair: doc 300100 (unique text X) in
    // batch 1, doc 300101 (X + footer) in batch 2 — found by batch 2
    // against the index that already holds batch 1's frozen prefix.
    // Union of per-batch pair sets == one-shot serving; checkpointed
    // re-run is a no-op (idempotent per-batch pair slots).
    QueryDef("stream_containment",
      (s, dir) => {
        import java.nio.file.Files
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text").filter(col("doc_id") < 250)
        val expanded = docs.filter(col("doc_id") < 8)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(QueriesR9.Footer)).as("text"))
        val srcDir = Files.createTempDirectory("graft_scd_src_").toString
        expanded.filter(col("doc_id") < 300004L)
          .unionByName(s.createDataFrame(Seq((300100L, XText)))
            .toDF("doc_id", "text"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        expanded.filter(col("doc_id") >= 300004L)
          .unionByName(s.createDataFrame(Seq((300101L, XText + QueriesR9.Footer)))
            .toDF("doc_id", "text"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val idxPath = Files.createTempDirectory("graft_scd_idx_").toString
        val pairsPath = Files.createTempDirectory("graft_scd_pairs_").toString
        val ckpt = Files.createTempDirectory("graft_scd_ck_").toString
        graft.llm.ContainIndex.write(docs, "text", "doc_id", idxPath,
          threshold = 0.9, nBuckets = 16)
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingContainmentDedup(
            s, srcDir, schema, idxPath, pairsPath, ckpt, "text", "doc_id",
            threshold = 0.9, maxFilesPerTrigger = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, no new pairs
        s.read.parquet(pairsPath)
          .select("id_a", "id_b", "containment")
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 250
          UNION ALL
          SELECT doc_id + 300000, text || '${QueriesR9.Footer}' FROM documents
          WHERE doc_id < 8
          UNION ALL SELECT 300100, '$XText'
          UNION ALL SELECT 300101, '$XText${QueriesR9.Footer}'),
        d AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
              FROM aug),
        sh AS (SELECT doc_id,
                 list_transform(range(1, len(w) - 1),
                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1]
                        || ' ' || w[CAST(i AS INT)+2]) s
               FROM d),
        hs AS (SELECT doc_id,
                 list_distinct(list_transform(s,
                   x -> CAST('0x'||substr(md5(x),1,8) AS BIGINT))) h
               FROM sh)
        SELECT a.doc_id id_a, b.doc_id id_b,
               CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) / len(a.h)
                 AS containment
        FROM hs a JOIN hs b ON a.doc_id != b.doc_id
        WHERE len(a.h) > 0 AND len(b.h) > 0
          AND CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) / len(a.h) >= 0.9
          AND (a.doc_id >= 300000 OR b.doc_id >= 300000)
        ORDER BY id_a, id_b""")),

    // ---- decontamination from a PERSISTED blocklist artifact -----------
    // Same fixture and oracle as decontaminate/decontaminate_bloom: the
    // artifact path (blocklist shingled once, bloom sketch + gram table
    // persisted, corpus scrubbed with zero blocklist work at serve) must
    // be bit-identical to the recompute paths.
    QueryDef("decontaminate_artifact",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft_blocklist_").toString
        graft.llm.Curation.writeBlocklist(
          docs.filter(pmod(col("doc_id"), lit(20L)) === 0),
          "text", "doc_id", path, shingleN = 3)
        graft.llm.Curation.decontaminateBloomFrom(
            s, path, docs, "text", "doc_id", minHits = 5L)
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
        ORDER BY d.doc_id""")),

    // ---- exact corpus quantiles over the score histogram ---------------
    // Exact per-mille quantiles of the whitespace-token-count
    // distribution WITHOUT a global sort: one map-combinable histogram
    // pass + a bounded-rows cumulative window. The approx_ok column
    // audits Spark's percentile_approx sketch (the one-pass production
    // path) against each exact rank — the oracle pins it TRUE, so a
    // sketch drifting out of its documented n/accuracy rank guarantee
    // fails the gate.
    QueryDef("score_quantiles",
      (s, dir) => {
        val scored = Tables.read(s, dir, "documents")
          .select(graft.llm.TextStats.wsTokenCount(col("text"))
            .cast("long").as("toks"))
        graft.llm.Selection.exactQuantiles(
            scored, "toks", Seq(100, 250, 500, 750, 900, 990))
          .orderBy("p_mille")
      },
      Some(s"""
        WITH sc AS (SELECT CAST(len(list_filter(string_split(lower(text), ' '),
                      x -> len(x) > 0)) AS BIGINT) s
                    FROM documents),
        h AS (SELECT s, CAST(COUNT(*) AS BIGINT) c FROM sc GROUP BY 1),
        cum AS (SELECT s, CAST(SUM(c) OVER (ORDER BY s) AS BIGINT) cc FROM h),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM sc),
        ps(p_mille) AS (VALUES (100), (250), (500), (750), (900), (990))
        SELECT p_mille,
               CAST((p_mille * n.n + 999) // 1000 AS BIGINT) AS target_rank,
               (SELECT MIN(s) FROM cum WHERE cc * 1000 >= p_mille * n.n)
                 AS q_value,
               true AS approx_ok
        FROM ps, n
        ORDER BY p_mille""")),

    // ---- top-fraction keep threshold (ties inclusive) ------------------
    // "Keep the top 25% by score" as a histogram threshold: t = the
    // highest score value whose >=-count still reaches ceil(0.25·n).
    // The kept set is per-source-aggregated so the gate pins both the
    // threshold arithmetic and the tie-inclusive keep semantics.
    QueryDef("quantile_threshold",
      (s, dir) => {
        val scored = Tables.read(s, dir, "documents")
          .withColumn("toks",
            graft.llm.TextStats.wsTokenCount(col("text")).cast("long"))
        graft.llm.Selection.keepTopFraction(scored, "toks", 250)
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            min(col("toks")).as("min_toks"),
            sum(col("toks")).as("sum_toks"))
          .orderBy("source")
      },
      Some("""
        WITH sc AS (SELECT source,
                      CAST(len(list_filter(string_split(lower(text), ' '),
                        x -> len(x) > 0)) AS BIGINT) toks
                    FROM documents),
        h AS (SELECT toks s, CAST(COUNT(*) AS BIGINT) c FROM sc GROUP BY 1),
        ccd AS (SELECT s, CAST(SUM(c) OVER (ORDER BY s DESC) AS BIGINT) ccd
                FROM h),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM sc),
        t AS (SELECT MAX(s) t FROM ccd, n WHERE ccd * 4 >= n.n)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) n_kept,
               CAST(MIN(toks) AS BIGINT) min_toks,
               CAST(SUM(toks) AS BIGINT) sum_toks
        FROM sc, t
        WHERE toks >= t.t
        GROUP BY source
        ORDER BY source""")),

    // ---- CCNet head/middle/tail buckets, per language ------------------
    // Per-GROUP terciles (Wenzek et al. 2020): each language's own score
    // distribution defines its head/middle/tail — a global cut would let
    // the high-resource language define "good" for every other one. The
    // gate aggregates bucket populations per (lang, bucket).
    QueryDef("quality_buckets",
      (s, dir) => {
        val scored = Tables.read(s, dir, "documents")
          .withColumn("toks",
            graft.llm.TextStats.wsTokenCount(col("text")).cast("long"))
        graft.llm.Selection.groupQuantileBuckets(
            scored, "lang", "toks", Seq(333, 667))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
          .orderBy("lang", "bucket")
      },
      Some("""
        WITH sc AS (SELECT lang, doc_id,
                      CAST(len(list_filter(string_split(lower(text), ' '),
                        x -> len(x) > 0)) AS BIGINT) toks
                    FROM documents),
        h AS (SELECT lang, toks s, CAST(COUNT(*) AS BIGINT) c
              FROM sc GROUP BY 1, 2),
        cum AS (SELECT lang, s,
                  CAST(SUM(c) OVER (PARTITION BY lang ORDER BY s) AS BIGINT) cc,
                  CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) n_g
                FROM h),
        thr AS (SELECT lang, p, MIN(s) q
                FROM cum, (VALUES (333), (667)) ps(p)
                WHERE cc * 1000 >= p * n_g
                GROUP BY 1, 2),
        b AS (SELECT sc.lang, sc.doc_id, sc.toks,
                (SELECT COUNT(*) FROM thr
                 WHERE thr.lang = sc.lang AND sc.toks > thr.q) AS bucket
              FROM sc)
        SELECT lang, CAST(bucket AS INT) bucket,
               CAST(COUNT(*) AS BIGINT) n_docs,
               CAST(SUM(toks) AS BIGINT) n_tokens
        FROM b
        GROUP BY 1, 2
        ORDER BY lang, bucket""")),

    // ---- dense global ordinal without a global sort --------------------
    // The two-pass zipWithIndex shape in the DataFrame world: per-shard
    // dense positions (deterministicShuffle) + nShards broadcast prefix
    // offsets. The oracle's single row_number() over the TOTAL order
    // (shard, key, id) must match exactly — global density, not just
    // per-shard density.
    QueryDef("shuffle_global",
      (s, dir) =>
        graft.llm.Sampling.globalOrdinal(
            Tables.read(s, dir, "documents").select("doc_id"),
            "doc_id", seed = 11L, nShards = 8)
          .orderBy("global_pos"),
      Some("""
        WITH k AS (
          SELECT doc_id, md5('11:' || CAST(doc_id AS VARCHAR)) AS key
          FROM documents),
        s AS (
          SELECT doc_id, key,
                 CAST('0x' || substr(key, 1, 4) AS BIGINT) % 8 AS shard
          FROM k)
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1
                 AS pos,
               row_number() OVER (ORDER BY shard, key, doc_id) - 1
                 AS global_pos
        FROM s
        ORDER BY global_pos""")),

    // ---- token-bounded JSONL shard export ------------------------------
    // The dataloader handoff: packBins assignment -> partitionBy(shard,
    // bin) JSONL tree -> manifest aggregated from a READ-BACK of the
    // written files (what a dataloader sees, not what the writer
    // intended). The oracle replays the pack arithmetic relationally —
    // the write+read roundtrip must be invisible in the manifest.
    QueryDef("export_shards",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            graft.llm.TextStats.wsTokenCount(col("text"))
              .cast("long").as("n_toks"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_shards_").toString
        graft.llm.Packing.exportShards(docs, "doc_id", "text", "n_toks",
            maxTokens = 2048L, nShards = 4, path = tmp)
          .orderBy("shard", "bin")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                       x -> len(x) > 0)) AS BIGINT) n_tokens,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                       AS BIGINT) % 4 AS shard
                   FROM documents),
        c AS (SELECT doc_id, n_tokens, shard,
                CAST(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) cum
              FROM d)
        SELECT shard, cum // 2048 AS bin,
               CAST(COUNT(*) AS BIGINT) n_docs,
               CAST(SUM(n_tokens) AS BIGINT) n_tokens,
               CAST(MIN(doc_id) AS BIGINT) min_id,
               CAST(MAX(doc_id) AS BIGINT) max_id
        FROM c
        GROUP BY 1, 2
        ORDER BY shard, bin"""))
  )
}
