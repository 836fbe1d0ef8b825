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
        TopKStore.append(docs.filter(col("doc_id") % 3 === 1),
          Seq.empty, "lang", "source", p, runId = "b0")
        TopKStore.append(docs.filter(col("doc_id") % 3 === 2),
          Seq.empty, "lang", "source", p, runId = "b1")
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
        HistStore.append(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          Seq("lang"), "n_chars", "source", p, runId = Some("b0"))
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
        GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
