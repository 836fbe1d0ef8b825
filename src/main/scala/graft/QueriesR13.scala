package graft

import org.apache.spark.sql.functions._

/** Round-13 wave: crash-partial slots excluded from folds (replay
  * safety under compact-at-restart), the bounded fold manifest,
  * TopKStore's opt-in Misra-Gries pruning fold, and HistStore's exact
  * coarsen-rebin migration. */
object QueriesR13 {

  val all: Seq[QueryDef] = Seq(

    // ---- opt-in heavy-hitter pruning fold --------------------------------
    // Three instances per part (seed + two appends split by doc_id%3)
    // merged by pruneCompact into ONE top-m instance per part with
    // deterministically WIDENED bounds: merged cnt = summed kept
    // counts (lb-valid), per-row slack = C - covered (true <= cnt +
    // slack), merged cut = max(C, max excluded cnt+slack). The oracle
    // replays every clause — instance summaries, the merge, and the
    // post-prune serve algebra — in exact integer SQL, so the served
    // (lb, ub) pair is pinned bit-for-bit, not merely bracketed.
    QueryDef("topk_prune",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.TopKStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_topkpr_gate_").toString
        TopKStore.write(docs.filter(col("doc_id") % 3 === 0),
          Seq.empty, "lang", "source", p, m = 3)
        TopKStore.appendBatch(docs.filter(col("doc_id") % 3 === 1),
          Seq.empty, "lang", "source", p, batchId = 0L)
        TopKStore.appendBatch(docs.filter(col("doc_id") % 3 === 2),
          Seq.empty, "lang", "source", p, batchId = 1L)
        TopKStore.pruneCompact(s, p)
        // the fold shrank every part to one merged instance of <= m rows
        val perPart = s.read.parquet(s"$p/topk")
          .groupBy("part").count().agg(max("count")).head().getLong(0)
        require(perPart <= 3L,
          s"pruneCompact must cap rows per part at m, saw $perPart")
        TopKStore.topK(s, p, Seq.empty, k = 8)
          .orderBy(col("lb").desc, col("value").asc)
      },
      Some("""
        WITH raw AS (
          SELECT source AS part, CAST(doc_id % 3 AS VARCHAR) AS inst,
                 lang AS value, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY 1, 2, 3),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY part, inst
            ORDER BY cnt DESC, value ASC) AS rn FROM raw),
        cuts AS (
          SELECT part, inst,
                 CAST(MAX(CASE WHEN rn = 4 THEN cnt ELSE 0 END) AS BIGINT)
                   AS cut
          FROM ranked GROUP BY 1, 2),
        kept AS (
          SELECT r.part, r.inst, r.value, r.cnt, c.cut
          FROM ranked r JOIN cuts c USING (part, inst) WHERE r.rn <= 3),
        totals AS (
          SELECT part, CAST(SUM(cut) AS BIGINT) AS c_total
          FROM (SELECT DISTINCT part, inst, cut FROM kept) GROUP BY 1),
        merged AS (
          SELECT part, value, CAST(SUM(cnt) AS BIGINT) AS cnt,
                 CAST(SUM(cut) AS BIGINT) AS covered
          FROM kept GROUP BY 1, 2),
        est AS (
          SELECT m.part, m.value, m.cnt,
                 CAST(t.c_total - m.covered AS BIGINT) AS slack
          FROM merged m JOIN totals t USING (part)),
        prank AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY part
            ORDER BY cnt DESC, value ASC) AS rn FROM est),
        pcut AS (
          SELECT p.part,
                 CAST(GREATEST(t.c_total, COALESCE(
                   MAX(CASE WHEN p.rn > 3 THEN p.cnt + p.slack END), 0))
                   AS BIGINT) AS cut
          FROM prank p JOIN totals t USING (part)
          GROUP BY p.part, t.c_total),
        pkept AS (SELECT part, value, cnt, slack FROM prank WHERE rn <= 3),
        tot AS (SELECT CAST(SUM(cut) AS BIGINT) AS total_cut FROM pcut),
        pv AS (
          SELECT k.value, CAST(SUM(k.cnt) AS BIGINT) AS lb,
                 CAST(SUM(k.slack) AS BIGINT) AS slk,
                 CAST(SUM(c.cut) AS BIGINT) AS covered
          FROM pkept k JOIN pcut c USING (part) GROUP BY 1)
        SELECT value, lb,
               CAST(lb + slk + total_cut - covered AS BIGINT) AS ub,
               (slk + total_cut - covered) = 0 AS exact
        FROM pv, tot
        ORDER BY lb DESC, value ASC LIMIT 8""")),

    // ---- exact coarsen-rebin migration -----------------------------------
    // A 20-bin store rebinned to 4 bins must serve counts bit-identical
    // to binning the raw rows at 4 bins directly — the rebin is EXACT
    // because every old bin maps wholly into one new bin. The gate also
    // pins the atomic layout swap (meta read back at 4 bins) and the
    // fold manifest (the append's id recorded by the rebin's compact).
    QueryDef("hist_rebin",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.HistStore
        import graft.llm.RunSlots
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        val p = Files.createTempDirectory("graft_histrb_gate_").toString
        HistStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "n_chars", "source", p, 0L, 1000L, 20)
        HistStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "n_chars", "source", p, batchId = 0L)
        HistStore.rebin(s, p, newNBins = 4)
        require(HistStore.readMeta(s, p) == ((0L, 1000L, 4)),
          "rebin must install the coarse layout atomically with the data")
        require(RunSlots.foldedRuns(s, s"$p/hist").contains("b0"),
          "rebin must fold pending slots and record them")
        HistStore.counts(s, p, Seq("lang")).orderBy("lang", "bin")
      },
      Some("""
        SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT lang, CASE WHEN n_chars < 0 THEN 0
                            WHEN n_chars >= 1000 THEN 5
                            ELSE n_chars * 4 // 1000 + 1 END AS bin
          FROM documents)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- sparse unbounded-range quantile store ---------------------------
    // The open-range sibling of HistStore: one count per OCCUPIED
    // bucket floor(v/width) — signed values welcome (the gate feeds
    // n_chars−500 so negative buckets are on the oracle-checked path;
    // floor division is written with positive-operand `div` only, the
    // form Spark and DuckDB agree on). Seed + a run-slotted append,
    // then a part-window serve of exact merged counts.
    QueryDef("quantile_store",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        val docs = Tables.read(s, dir, "documents")
          .withColumn("centered", col("n_chars") - lit(500L))
        val p = Files.createTempDirectory("graft_quant_gate_").toString
        QuantileStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "centered", "source", p, width = 50L)
        QuantileStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "centered", "source", p, batchId = 0L)
        val window = (0 to 14).map(i => s"src$i")
        QuantileStore.counts(s, p, Seq("lang"), Some(window))
          .orderBy("lang", "bucket")
      },
      Some("""
        SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT lang,
                 CASE WHEN n_chars - 500 >= 0 THEN (n_chars - 500) // 50
                      ELSE -((-(n_chars - 500) + 49) // 50) END AS bucket
          FROM documents
          WHERE CAST(substr(source, 4) AS INT) <= 14)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- quantiles with always-finite bounds -----------------------------
    // Median and p90 per language from the summary (never the raw
    // rows): the HistStore rank rule, but every bucket reports real
    // value bounds [b*w, (b+1)*w) — no saturating under/overflow bins,
    // the point of the open-range store. Exact integers end to end.
    QueryDef("quantile_serve",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        val docs = Tables.read(s, dir, "documents")
          .withColumn("centered", col("n_chars") - lit(500L))
        val p = Files.createTempDirectory("graft_quantsv_gate_").toString
        QuantileStore.write(docs, Seq("lang"), "centered", "source", p,
          width = 50L)
        Seq((1L, 2L), (9L, 10L)).map { case (qn, qd) =>
          QuantileStore.quantile(s, p, Seq("lang"), qn, qd)
            .withColumn("q_num", lit(qn)).withColumn("q_den", lit(qd))
        }.reduce(_ unionByName _)
          .select("lang", "q_num", "q_den", "q_bucket", "q_lo", "q_hi",
            "n_total")
          .orderBy("lang", "q_num")
      },
      Some("""
        WITH b AS (
          SELECT lang,
                 CASE WHEN n_chars - 500 >= 0 THEN (n_chars - 500) // 50
                      ELSE -((-(n_chars - 500) + 49) // 50) END AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY 1, 2),
        c AS (
          SELECT lang, bucket, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket)
                   AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n_total
          FROM b),
        q AS (SELECT CAST(1 AS BIGINT) AS q_num, CAST(2 AS BIGINT) AS q_den
              UNION ALL
              SELECT CAST(9 AS BIGINT), CAST(10 AS BIGINT))
        SELECT lang, q_num, q_den, CAST(bucket AS BIGINT) AS q_bucket,
               CAST(bucket * 50 AS BIGINT) AS q_lo,
               CAST((bucket + 1) * 50 AS BIGINT) AS q_hi,
               n_total
        FROM c JOIN q ON TRUE
        WHERE cum >= GREATEST(1, (n_total * q_num) // q_den)
          AND cum - cnt < GREATEST(1, (n_total * q_num) // q_den)
        ORDER BY lang, q_num""")),

    // ---- exact boundary-aligned CDF point --------------------------------
    // countBelow(0): how many docs sit below the centering point, per
    // language — exact because the threshold lies on a bucket boundary
    // (enforced; an interior threshold is refused with the remedy).
    QueryDef("quantile_below",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        val docs = Tables.read(s, dir, "documents")
          .withColumn("centered", col("n_chars") - lit(500L))
        val p = Files.createTempDirectory("graft_quantcb_gate_").toString
        QuantileStore.write(docs, Seq("lang"), "centered", "source", p,
          width = 50L)
        QuantileStore.countBelow(s, p, Seq("lang"), threshold = 0L)
          .orderBy("lang")
      },
      Some("""
        SELECT lang, CAST(SUM(CASE WHEN n_chars - 500 < 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_below
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- exact widen migration -------------------------------------------
    // A width-10 store coarsened to width 50 must serve counts
    // bit-identical to bucketing the raw rows at width 50 directly —
    // every old bucket lies wholly inside one new bucket (floor
    // division on SIGNED buckets, same positive-operand form). Pins
    // the atomic width+data swap and the fold manifest.
    QueryDef("quantile_coarsen",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        import graft.llm.RunSlots
        val docs = Tables.read(s, dir, "documents")
          .withColumn("centered", col("n_chars") - lit(500L))
        val p = Files.createTempDirectory("graft_quantco_gate_").toString
        QuantileStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "centered", "source", p, width = 10L)
        QuantileStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "centered", "source", p, batchId = 0L)
        QuantileStore.coarsen(s, p, newWidth = 50L)
        require(QuantileStore.readWidth(s, p) == 50L,
          "coarsen must install the new width atomically with the data")
        require(RunSlots.foldedRuns(s, s"$p/quant").contains("b0"),
          "coarsen must fold pending slots and record them")
        QuantileStore.counts(s, p, Seq("lang")).orderBy("lang", "bucket")
      },
      Some("""
        SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT lang,
                 CASE WHEN n_chars - 500 >= 0 THEN (n_chars - 500) // 50
                      ELSE -((-(n_chars - 500) + 49) // 50) END AS bucket
          FROM documents)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- streaming quantile maintenance ----------------------------------
    // Two micro-batches of fresh sources fold into the store under run
    // slots; autoCompactSlots=1 folds b0 mid-stream and records it in
    // the manifest; the checkpointed re-run is a no-op. Served
    // full-window counts must equal one-pass counts over everything.
    QueryDef("stream_quantile",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        import graft.llm.RunSlots
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            (col("n_chars") - lit(500L)).as("centered"))
        val p = Files.createTempDirectory("graft_quantst_gate_").toString
        QuantileStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "centered", "source", p, width = 50L)
        val srcDir = Files.createTempDirectory("graft_quantst_src_").toString
        docs.filter(expr("CAST(substr(source, 4) AS INT) BETWEEN 10 AND 14"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(expr("CAST(substr(source, 4) AS INT) >= 15"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val ckpt = Files.createTempDirectory("graft_quantst_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingQuantileMaintenance(
            s, srcDir, schema, p, ckpt, Seq("lang"), "centered", "source",
            maxFilesPerTrigger = Some(1),
            autoCompactSlots = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, store untouched
        require(RunSlots.foldedRuns(s, s"$p/quant").contains("b0"),
          "auto-compact must fold and record the first batch")
        QuantileStore.counts(s, p, Seq("lang")).orderBy("lang", "bucket")
      },
      Some("""
        SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT lang,
                 CASE WHEN n_chars - 500 >= 0 THEN (n_chars - 500) // 50
                      ELSE -((-(n_chars - 500) + 49) // 50) END AS bucket
          FROM documents)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- count-min sketch store: point frequencies for any key -----------
    // The tail-query sibling of TopKStore: d×w additive cells per
    // partition answer "how often did THIS key appear over the window"
    // for ANY key — estimate >= true always. Hash rows are fixed
    // md5("i:key") low bits, so the DuckDB oracle rebuilds the ENTIRE
    // sketch and the served estimates bit-for-bit: seed + run-slotted
    // append, window serve, probes include a never-seen key (its
    // estimate is whatever its min cell collided to — replayed exactly
    // by the oracle). w=16 is deliberately small so collisions are ON
    // the checked path.
    QueryDef("cms_store",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.CmsStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_cms_gate_").toString
        CmsStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          "lang", "source", p, depth = 4, width = 16)
        CmsStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          "lang", "source", p, batchId = 0L)
        val window = (0 to 14).map(i => s"src$i")
        val probes = docs.select(col("lang").as("k")).distinct()
          .unionByName(s.range(1).select(lit("zz").as("k")))
        CmsStore.estimate(s, p, probes, "k", Some(window)).orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL
                   SELECT 2 UNION ALL SELECT 3),
        cells AS (
          SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   lang), 1, 15) AS BIGINT) % 16 AS j,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) <= 14
          GROUP BY 1, 2),
        probes AS (SELECT DISTINCT lang AS key FROM documents
                   UNION SELECT 'zz'),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 16 AS j
          FROM probes CROSS JOIN d)
        SELECT key, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est
        FROM pj LEFT JOIN cells USING (r, j)
        GROUP BY 1 ORDER BY 1""")),

    // ---- streaming count-min maintenance ----------------------------------
    // Two micro-batches fold into the sketch under run slots (cells are
    // additive — a replay would element-wise double them);
    // autoCompactSlots=1 folds b0 mid-stream into the constant-size
    // d×w base and records it; the checkpointed re-run is a no-op.
    // Full-window estimates must equal the oracle's one-pass sketch.
    QueryDef("stream_cms",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.CmsStore
        import graft.llm.RunSlots
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "lang", "source")
        val p = Files.createTempDirectory("graft_cmsst_gate_").toString
        CmsStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          "lang", "source", p, depth = 4, width = 16)
        val srcDir = Files.createTempDirectory("graft_cmsst_src_").toString
        docs.filter(expr("CAST(substr(source, 4) AS INT) BETWEEN 10 AND 14"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(expr("CAST(substr(source, 4) AS INT) >= 15"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val ckpt = Files.createTempDirectory("graft_cmsst_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingCmsMaintenance(
            s, srcDir, schema, p, ckpt, "lang", "source",
            maxFilesPerTrigger = Some(1),
            autoCompactSlots = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, store untouched
        require(RunSlots.foldedRuns(s, s"$p/cms").contains("b0"),
          "auto-compact must fold and record the first batch")
        CmsStore.estimate(s, p,
          docs.select(col("lang").as("k")).distinct(), "k").orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL
                   SELECT 2 UNION ALL SELECT 3),
        cells AS (
          SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   lang), 1, 15) AS BIGINT) % 16 AS j,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents CROSS JOIN d
          GROUP BY 1, 2),
        probes AS (SELECT DISTINCT lang AS key FROM documents),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 16 AS j
          FROM probes CROSS JOIN d)
        SELECT key, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est
        FROM pj LEFT JOIN cells USING (r, j)
        GROUP BY 1 ORDER BY 1""")),

    // ---- drift served FROM the store --------------------------------------
    // Window-vs-window distribution drift computed over the MERGED BIN
    // SUMMARIES (never the raw rows): the DataQuality.distributionDrift
    // integer per-mille χ² statistic, per group, between two part
    // windows of one HistStore — two PartitionFilter'd summary reads
    // instead of two corpus rescans. Exact integers end to end.
    QueryDef("hist_drift",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.HistStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_histdr_gate_").toString
        HistStore.write(docs, Seq("lang"), "n_chars", "source", p,
          lo = 0L, hi = 1000L, nBins = 20)
        val ref = (0 to 9).map(i => s"src$i")
        val cur = (10 to 19).map(i => s"src$i")
        HistStore.drift(s, p, Seq("lang"), ref, cur).orderBy("lang")
      },
      Some("""
        WITH binned AS (
          SELECT lang, CAST(substr(source, 4) AS INT) AS srcn,
                 CASE WHEN n_chars < 0 THEN 0
                      WHEN n_chars >= 1000 THEN 21
                      ELSE n_chars * 20 // 1000 + 1 END AS bin
          FROM documents),
        rb AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_ref
               FROM binned WHERE srcn <= 9 GROUP BY 1, 2),
        cb AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_cur
               FROM binned WHERE srcn BETWEEN 10 AND 19 GROUP BY 1, 2),
        j AS (
          SELECT COALESCE(rb.lang, cb.lang) AS lang,
                 COALESCE(rb.bin, cb.bin) AS bin,
                 COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
          FROM rb FULL OUTER JOIN cb
            ON rb.lang = cb.lang AND rb.bin = cb.bin),
        t AS (
          SELECT *, SUM(n_ref) OVER (PARTITION BY lang) AS tr,
                    SUM(n_cur) OVER (PARTITION BY lang) AS tc
          FROM j),
        p AS (
          SELECT lang, tr, tc,
                 n_ref * 1000 // tr AS pm_ref, n_cur * 1000 // tc AS pm_cur
          FROM t WHERE tr > 0 AND tc > 0)
        SELECT lang,
               CAST(SUM(CASE WHEN pm_ref + pm_cur > 0
                 THEN (pm_ref - pm_cur) * (pm_ref - pm_cur) * 1000
                      // (pm_ref + pm_cur) ELSE 0 END) AS BIGINT)
                 AS drift_pm,
               CAST(MAX(tr) AS BIGINT) AS n_ref,
               CAST(MAX(tc) AS BIGINT) AS n_cur
        FROM p GROUP BY 1 ORDER BY 1""")),

    // ---- count-min inner product --------------------------------------------
    // The second classic CMS query: the dot product of two windows'
    // key-frequency vectors estimated from two <= d*w cell relations —
    // "how similar is this window's traffic to that one's" with the
    // corpus never rescanned. est >= true dot product always (asserted
    // inline vs the exact join); the oracle replays the deterministic
    // sketch estimate bit-for-bit.
    QueryDef("cms_inner",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.CmsStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_cmsip_gate_").toString
        CmsStore.write(docs, "lang", "source", p, depth = 4, width = 16)
        val wa = (0 to 9).map(i => s"src$i")
        val wb = (10 to 19).map(i => s"src$i")
        val out = CmsStore.innerProduct(s, p, wa, wb)
        // one-sided contract vs the exact dot product of lang counts
        val ca = docs.filter(expr("CAST(substr(source, 4) AS INT) <= 9"))
          .groupBy("lang").count().withColumnRenamed("count", "ca")
        val cb = docs.filter(
            expr("CAST(substr(source, 4) AS INT) BETWEEN 10 AND 19"))
          .groupBy("lang").count().withColumnRenamed("count", "cb")
        val truth = ca.join(cb, "lang")
          .agg(sum(col("ca") * col("cb"))).head().getLong(0)
        val est = out.head().getLong(0)
        require(est >= truth, s"cms inner product $est < true $truth")
        out
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL
                   SELECT 2 UNION ALL SELECT 3),
        ca AS (
          SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   lang), 1, 15) AS BIGINT) % 16 AS j,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) <= 9 GROUP BY 1, 2),
        cb AS (
          SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   lang), 1, 15) AS BIGINT) % 16 AS j,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) BETWEEN 10 AND 19
          GROUP BY 1, 2),
        s AS (
          SELECT ca.r, CAST(SUM(ca.c * cb.c) AS BIGINT) AS ip
          FROM ca JOIN cb ON ca.r = cb.r AND ca.j = cb.j GROUP BY 1)
        SELECT CAST(MIN(COALESCE(ip, 0)) AS BIGINT) AS inner_product
        FROM d LEFT JOIN s ON d.r = s.r""")),

    // ---- relative-error (log2) quantile mode -------------------------------
    // The unknown-domain form: buckets are exact log2 indexes
    // (length(bin(v)) — identical integers in Spark and DuckDB), so the
    // summary is <= 65 rows per part-group no matter the value domain
    // and a quantile resolves to [2^(b-1), 2^b) — value known within
    // 2x. Seed + run-slotted append, median and p90 per language with
    // bounds mapped back to value space.
    QueryDef("quantile_log2",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_quantlg_gate_").toString
        QuantileStore.writeLog2(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "n_chars", "source", p)
        QuantileStore.appendBatchLog2(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "n_chars", "source", p, batchId = 0L)
        Seq((1L, 2L), (9L, 10L)).map { case (qn, qd) =>
          QuantileStore.quantileLog2(s, p, Seq("lang"), qn, qd)
            .withColumn("q_num", lit(qn)).withColumn("q_den", lit(qd))
        }.reduce(_ unionByName _)
          .select("lang", "q_num", "q_den", "q_bucket", "q_lo", "q_hi",
            "n_total")
          .orderBy("lang", "q_num")
      },
      Some("""
        WITH b AS (
          SELECT lang,
                 CASE WHEN n_chars = 0 THEN 0
                      ELSE length(bin(CAST(n_chars AS BIGINT))) END AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY 1, 2),
        c AS (
          SELECT lang, bucket, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket)
                   AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n_total
          FROM b),
        q AS (SELECT CAST(1 AS BIGINT) AS q_num, CAST(2 AS BIGINT) AS q_den
              UNION ALL
              SELECT CAST(9 AS BIGINT), CAST(10 AS BIGINT))
        SELECT lang, q_num, q_den, CAST(bucket AS BIGINT) AS q_bucket,
               CAST(CASE WHEN bucket = 0 THEN 0
                         WHEN bucket BETWEEN 1 AND 63
                           THEN CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)
                    END AS BIGINT) AS q_lo,
               CAST(CASE WHEN bucket = 0 THEN 1
                         WHEN bucket = -1 THEN 0
                         WHEN bucket BETWEEN 1 AND 62
                           THEN CAST(1 AS BIGINT) << CAST(bucket AS INT)
                    END AS BIGINT) AS q_hi,
               n_total
        FROM c JOIN q ON TRUE
        WHERE cum >= GREATEST(1, (n_total * q_num) // q_den)
          AND cum - cnt < GREATEST(1, (n_total * q_num) // q_den)
        ORDER BY lang, q_num""")),

    // ---- bloom membership store -------------------------------------------
    // The membership member of the maintained-store family: sparse
    // occupied positions per partition; window serve answers "was this
    // key seen" with NO false negatives (asserted inline) and a bounded
    // false-positive rate. Same fixed md5 hash idiom as CmsStore, so
    // the DuckDB oracle replays every verdict — INCLUDING the false
    // positives — bit-for-bit. Probes: every 23rd doc_id (present) and
    // a 'zz'-prefixed twin of each (absent).
    QueryDef("bloom_store",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_bloom_gate_").toString
        BloomStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          "doc_id", "source", p, depth = 3, width = 4096)
        BloomStore.append(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          "doc_id", "source", p)
        val window = (0 to 14).map(i => s"src$i")
        val present = docs.filter(col("doc_id") % 23 === 0 &&
          expr("CAST(substr(source, 4) AS INT) <= 14"))
        val probes = present.select(col("doc_id").cast("string").as("k"))
          .unionByName(present.select(
            concat(lit("zz"), col("doc_id").cast("string")).as("k")))
        val out = BloomStore.mightContain(s, p, probes, "k", Some(window))
        // contract check: set union can never lose a present key
        val fn = out.join(
          present.select(col("doc_id").cast("string").as("key")), "key")
          .filter(!col("might_contain")).count()
        require(fn == 0, s"bloom false negatives: $fn")
        out.orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        pos AS (
          SELECT DISTINCT r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 4096 AS j
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) <= 14),
        pr AS (
          SELECT CAST(doc_id AS VARCHAR) AS key FROM documents
          WHERE doc_id % 23 = 0 AND CAST(substr(source, 4) AS INT) <= 14
          UNION ALL
          SELECT 'zz' || CAST(doc_id AS VARCHAR) FROM documents
          WHERE doc_id % 23 = 0 AND CAST(substr(source, 4) AS INT) <= 14),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 4096 AS j
          FROM (SELECT DISTINCT key FROM pr) CROSS JOIN d)
        SELECT key, COUNT(pos.j) = 3 AS might_contain
        FROM pj LEFT JOIN pos ON pj.r = pos.r AND pj.j = pos.j
        GROUP BY 1 ORDER BY 1""")),

    // ---- bloom crawl-frontier filter ----------------------------------------
    // The frontier use case: of an incoming batch, keep only the keys
    // DEFINITELY not seen in the window (one-sided: nothing already
    // present ever passes; a false positive is wrongly held back — the
    // price of bounded state vs the exact stateful dedup operators).
    // The oracle replays the filter: a batch doc survives iff its 3
    // positions are not all covered by the seed window's positions.
    QueryDef("bloom_new_keys",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_bloomnk_gate_").toString
        BloomStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          "doc_id", "source", p, depth = 3, width = 4096)
        val batch = docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10"))
        BloomStore.filterNew(s, p, batch, "doc_id")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        seen AS (
          SELECT DISTINCT r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 4096 AS j
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) < 10),
        bp AS (
          SELECT doc_id, r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 4096 AS j
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) >= 10)
        SELECT bp.doc_id FROM bp
        LEFT JOIN seen ON bp.r = seen.r AND bp.j = seen.j
        GROUP BY bp.doc_id HAVING COUNT(seen.j) < 3
        ORDER BY bp.doc_id""")),

    // ---- streaming log2 quantile maintenance --------------------------------
    // The relative-error mode composed with the streaming loop: the
    // generic quantile maintenance appends pre-bucketed values (prepare
    // maps the raw column through log2Bucket), so the same run-slot +
    // fold-manifest machinery carries the 65-row-per-group summary;
    // served median must equal the one-pass oracle's.
    QueryDef("stream_quantile_log2",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.QuantileStore
        import graft.llm.RunSlots
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        val p = Files.createTempDirectory("graft_quantlgst_gate_").toString
        QuantileStore.writeLog2(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "n_chars", "source", p)
        val srcDir = Files.createTempDirectory("graft_quantlgst_src_").toString
        docs.filter(expr("CAST(substr(source, 4) AS INT) BETWEEN 10 AND 14"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(expr("CAST(substr(source, 4) AS INT) >= 15"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val ckpt = Files.createTempDirectory("graft_quantlgst_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingQuantileMaintenance(
            s, srcDir, schema, p, ckpt, Seq("lang"), "__log2b", "source",
            maxFilesPerTrigger = Some(1),
            prepare = b => b.withColumn("__log2b",
              QuantileStore.log2Bucket(col("n_chars").cast("long"))),
            autoCompactSlots = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, store untouched
        require(RunSlots.foldedRuns(s, s"$p/quant").contains("b0"),
          "auto-compact must fold and record the first batch")
        QuantileStore.quantileLog2(s, p, Seq("lang"), 1L, 2L)
          .select("lang", "q_bucket", "q_lo", "q_hi", "n_total")
          .orderBy("lang")
      },
      Some("""
        WITH b AS (
          SELECT lang,
                 CASE WHEN n_chars = 0 THEN 0
                      ELSE length(bin(CAST(n_chars AS BIGINT))) END AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY 1, 2),
        c AS (
          SELECT lang, bucket, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket)
                   AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n_total
          FROM b)
        SELECT lang, CAST(bucket AS BIGINT) AS q_bucket,
               CAST(CASE WHEN bucket = 0 THEN 0
                         WHEN bucket BETWEEN 1 AND 63
                           THEN CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)
                    END AS BIGINT) AS q_lo,
               CAST(CASE WHEN bucket = 0 THEN 1
                         WHEN bucket = -1 THEN 0
                         WHEN bucket BETWEEN 1 AND 62
                           THEN CAST(1 AS BIGINT) << CAST(bucket AS INT)
                    END AS BIGINT) AS q_hi,
               n_total
        FROM c
        WHERE cum >= GREATEST(1, n_total // 2)
          AND cum - cnt < GREATEST(1, n_total // 2)
        ORDER BY lang""")),

    // ---- n-gram novelty vs a bloom-held reference corpus -------------------
    // The curation signal: per batch doc, how many of its distinct
    // word 3-grams are DEFINITELY absent from the reference window —
    // high n_new/n_grams = genuinely new text, near-zero = boilerplate
    // or contamination. The reference gram set lives in bounded filter
    // state (at 100 TB the gram table IS the corpus); one-sided, so a
    // false positive UNDERCOUNTS novelty. The oracle replays grams,
    // positions, and verdicts end to end.
    QueryDef("ngram_novelty",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.Dedup
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_nov_gate_").toString
        val ref = docs.filter(expr("CAST(substr(source, 4) AS INT) < 10"))
        val refGrams = ref
          .select(Dedup.tokens(col("text")).as("__toks"))
          .select(explode(Dedup.wordGrams(col("__toks"), 3)).as("gram"))
          .withColumn("p", lit("ref"))
        BloomStore.write(refGrams, "gram", "p", p,
          depth = 3, width = 1 << 16)
        val batch = docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10"))
        Dedup.ngramNovelty(s, batch, "text", "doc_id", p)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""
        WITH dd AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        w AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> len(x) > 0)
                  AS w,
                CAST(substr(source, 4) AS INT) AS srcn
              FROM documents),
        g AS (SELECT doc_id, srcn,
                list_distinct(list_transform(range(1, len(w) - 1),
                  i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] ||
                       ' ' || w[CAST(i AS INT)+2])) AS s
              FROM w),
        refpos AS (
          SELECT DISTINCT r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || x),
                   1, 15) AS BIGINT) % 65536 AS j
          FROM (SELECT unnest(s) AS x FROM g WHERE srcn < 10)
          CROSS JOIN dd),
        bg AS (SELECT doc_id, unnest(s) AS gram FROM g WHERE srcn >= 10),
        bpos AS (
          SELECT doc_id, gram, r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   gram), 1, 15) AS BIGINT) % 65536 AS j
          FROM bg CROSS JOIN dd),
        verdict AS (
          SELECT doc_id, gram, COUNT(refpos.j) = 3 AS mc
          FROM bpos LEFT JOIN refpos
            ON bpos.r = refpos.r AND bpos.j = refpos.j
          GROUP BY 1, 2),
        agg AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN NOT mc THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
                 CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM verdict GROUP BY 1)
        SELECT b.doc_id,
               COALESCE(n_new, 0) AS n_new,
               COALESCE(n_grams, 0) AS n_grams
        FROM (SELECT doc_id FROM documents
              WHERE CAST(substr(source, 4) AS INT) >= 10) b
        LEFT JOIN agg USING (doc_id)
        ORDER BY b.doc_id""")),

    // ---- bloom fill report ----------------------------------------------------
    // The operability serve the no-migration geometry contract
    // requires: occupied cells per hash row over a window, exact
    // integer fill per-mille — the "rebuild at larger w?" signal,
    // since positions cannot re-hash. Oracle recounts distinct
    // positions per row.
    QueryDef("bloom_fill",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_bloomfl_gate_").toString
        BloomStore.write(docs, "doc_id", "source", p,
          depth = 3, width = 512)
        val window = (0 to 9).map(i => s"src$i")
        BloomStore.fill(s, p, Some(window)).orderBy("r")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        occ AS (
          SELECT r, CAST(COUNT(DISTINCT
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 512)
                 AS BIGINT) AS occupied
          FROM documents CROSS JOIN d
          WHERE CAST(substr(source, 4) AS INT) <= 9
          GROUP BY 1)
        SELECT d.r, COALESCE(occupied, 0) AS occupied,
               CAST(512 AS BIGINT) AS width,
               COALESCE(occupied, 0) * 1000 // 512 AS fill_pm
        FROM d LEFT JOIN occ ON d.r = occ.r
        ORDER BY d.r""")),

    // ---- count-min inserted mass -----------------------------------------------
    // N in the sketch's e*N/w bound, served from the cells: every
    // insert adds 1 to every hash row, so each row's sum IS the
    // window's insert count — asserted to agree across rows before
    // reporting.
    QueryDef("cms_mass",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.CmsStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_cmsms_gate_").toString
        CmsStore.write(docs, "lang", "source", p, depth = 4, width = 16)
        val window = (0 to 9).map(i => s"src$i")
        CmsStore.mass(s, p, Some(window))
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total
        FROM documents WHERE CAST(substr(source, 4) AS INT) <= 9""")),

    // ---- sliding-window retrieval chunking -----------------------------------
    // The RAG-ingest step: token windows of 32 with 8 shared between
    // neighbors, so no boundary fact is lost to both chunks. Docs with
    // <= 32 tokens yield exactly one chunk; zero-token docs yield
    // nothing. Chunk text replayed via md5 to keep the gate compact;
    // the oracle rebuilds every window with the same integer
    // arithmetic.
    QueryDef("chunk_retrieval",
      (s, dir) => {
        import graft.llm.Curation
        val docs = Tables.read(s, dir, "documents")
        Curation.chunkForRetrieval(docs, "text", "doc_id",
            size = 32, overlap = 8)
          .select(col("id").as("doc_id"), col("chunk_id"),
            md5(col("chunk_text")).as("chunk_md5"), col("n_tokens"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""
        WITH w AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                       x -> len(x) > 0) AS w
                   FROM documents),
        n AS (SELECT doc_id, w, len(w) AS n FROM w),
        c AS (SELECT doc_id, w, n,
                CASE WHEN n = 0 THEN 0 WHEN n <= 32 THEN 1
                     ELSE (n - 32 + 23) // 24 + 1 END AS nch
              FROM n),
        e AS (SELECT doc_id, w, n, unnest(range(0, nch)) AS cid
              FROM c WHERE nch > 0),
        ch AS (SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
                 list_transform(
                   range(cid * 24 + 1, LEAST(cid * 24 + 32, n) + 1),
                   k -> w[CAST(k AS INT)]) AS toks
               FROM e)
        SELECT doc_id, chunk_id,
               md5(array_to_string(toks, ' ')) AS chunk_md5,
               CAST(len(toks) AS BIGINT) AS n_tokens
        FROM ch ORDER BY doc_id, chunk_id""")),

    // ---- model calibration (reliability table) ------------------------------
    // The eval step between the held-out audit and deployment: per
    // score decile, observed positive rate vs mean predicted score —
    // calibrated where they agree. Scores come from the deterministic
    // fixed-weight scorer (6-decimal contract), labels from a
    // deterministic rule; everything downstream is exact integer
    // per-mille (floor, never CAST/round — the engines disagree on
    // those for doubles).
    QueryDef("quality_calibration",
      (s, dir) => {
        import graft.llm.{QualityTrain, TextStats}
        val docs = Tables.read(s, dir, "documents")
        // /8 (not the score gate's /64): spread the sigmoid across
        // many deciles so the table demonstrates calibration, not two
        // occupied bins; still exact-in-binary multiples of 1/8
        val wts = (0 until 64).map(i => ((i * 37) % 64 - 32) / 8.0)
        val scored = TextStats
          .modelQualityScore(docs, "text", "doc_id", wts, bias = 0.25)
          .join(docs.select(col("doc_id"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y")), "doc_id")
        QualityTrain.calibration(scored, "q_score", "y", nBins = 10)
          .orderBy("bin")
      },
      Some("""
        WITH d AS (SELECT doc_id, lang,
                     list_filter(string_split(lower(text), ' '),
                       x -> len(x) > 0) t
                   FROM documents),
        f AS (SELECT doc_id, lang,
                CASE WHEN len(t) = 0 THEN 0.0
                     ELSE list_aggregate(list_transform(t, tok ->
                            (CAST(((CAST('0x'||substr(md5(tok),1,8) AS BIGINT)
                              % 64) * 37) % 64 AS DOUBLE) - 32) / 8.0),
                            'sum') / len(t)
                END mean
              FROM d),
        sc AS (SELECT doc_id,
                 round(1.0/(1.0 + exp(-(0.25 + mean))), 6) AS q,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
               FROM f),
        b AS (SELECT LEAST(CAST(FLOOR(q * 10) AS BIGINT), 9) AS bin, y,
                     CAST(FLOOR(q * 1000) AS BIGINT) AS pm
              FROM sc)
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(y) * 1000 // COUNT(*) AS BIGINT) AS rate_pm,
               CAST(SUM(pm) // COUNT(*) AS BIGINT) AS pred_pm
        FROM b GROUP BY 1 ORDER BY 1""")),

    // ---- retention: drop parts across slots ---------------------------------
    // The lifecycle half every windowed store needs: part leaves
    // removed whole from the folded slots (prefix-atomic, idempotent —
    // a crash mid-drop re-runs to completion; the fold manifest is
    // untouched, so dropped rows cannot resurrect a batch). The drop
    // runs AFTER a compact: a target part under a live batch slot is
    // refused (a replay would rewrite the slot and re-land the dropped
    // rows — ADVICE r13; StoreRetentionSpec pins the refusal). Served
    // counts after the drop must equal a build that never saw the
    // dropped sources, and a post-drop replay of the folded batch must
    // stay a no-op.
    QueryDef("store_retention",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.{QuantileStore, StoreRetention}
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_ret_gate_").toString
        QuantileStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          Seq("lang"), "n_chars", "source", p, width = 50L)
        QuantileStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "n_chars", "source", p, batchId = 0L)
        QuantileStore.compact(s, p) // fold b0 — live-slot drops refuse
        val dropped = StoreRetention.dropParts(s, s"$p/quant",
          (0 to 4).map(i => s"src$i"))
        require(dropped > 0, "retention must have found parts to drop")
        // the dropped batch cannot resurrect: b0 is in the fold manifest
        QuantileStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "n_chars", "source", p, batchId = 0L)
        QuantileStore.counts(s, p, Seq("lang")).orderBy("lang", "bucket")
      },
      Some("""
        SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT lang, n_chars // 50 AS bucket
          FROM documents
          WHERE CAST(substr(source, 4) AS INT) >= 5)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- streaming bloom maintenance ---------------------------------------
    // Two micro-batches of fresh sources append their positions; set
    // union is replay-idempotent, so this loop needs NO run slots and
    // no fold manifest (the SketchStore guarantee class — cheapest
    // exactly-once in the family); autoCompactFiles=1 forces a
    // DISTINCT-fold compact mid-stream; the checkpointed re-run is a
    // no-op. Full-window verdicts must equal the oracle's one-pass
    // filter.
    QueryDef("stream_bloom",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "source")
        val p = Files.createTempDirectory("graft_bloomst_gate_").toString
        BloomStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          "doc_id", "source", p, depth = 3, width = 4096)
        val srcDir = Files.createTempDirectory("graft_bloomst_src_").toString
        docs.filter(expr("CAST(substr(source, 4) AS INT) BETWEEN 10 AND 14"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(expr("CAST(substr(source, 4) AS INT) >= 15"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val ckpt = Files.createTempDirectory("graft_bloomst_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingBloomMaintenance(
            s, srcDir, schema, p, ckpt, "doc_id", "source",
            maxFilesPerTrigger = Some(1),
            autoCompactFiles = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, store untouched
        val probes = docs.filter(col("doc_id") % 23 === 0)
          .select(col("doc_id").cast("string").as("k"))
          .unionByName(docs.filter(col("doc_id") % 23 === 0).select(
            concat(lit("zz"), col("doc_id").cast("string")).as("k")))
        BloomStore.mightContain(s, p, probes, "k").orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        pos AS (
          SELECT DISTINCT r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 4096 AS j
          FROM documents CROSS JOIN d),
        pr AS (
          SELECT CAST(doc_id AS VARCHAR) AS key FROM documents
          WHERE doc_id % 23 = 0
          UNION ALL
          SELECT 'zz' || CAST(doc_id AS VARCHAR) FROM documents
          WHERE doc_id % 23 = 0),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 4096 AS j
          FROM (SELECT DISTINCT key FROM pr) CROSS JOIN d)
        SELECT key, COUNT(pos.j) = 3 AS might_contain
        FROM pj LEFT JOIN pos ON pj.r = pos.r AND pj.j = pos.j
        GROUP BY 1 ORDER BY 1"""))
  )
}
