package graft

import org.apache.spark.sql.functions._

/** Round-8 gate queries: the dbt-core capabilities a user of the
  * reference library runs beyond its macros — schema tests
  * (`dq_report`), snapshots (`scd2_snapshot`) — plus table profiling
  * and the remaining interchange formats. */
object QueriesR8 {

  // recall@10 pins at the driver's fixed verify scale (sf0.01) — measured
  // once from the deterministic quantizer (stride init, fixed iters,
  // rounded centroids) and exact rounded-cosine ranking
  private val AnnRerankSf001: Seq[(Long, Long, Long)] = Seq(
    (0L, 3L, 9L), (1L, 1L, 3L), (2L, 0L, 1L), (3L, 1L, 2L), (4L, 1L, 1L),
    (5L, 0L, 2L), (6L, 0L, 2L), (7L, 1L, 2L), (8L, 0L, 2L), (9L, 1L, 2L))
  private def AnnRerankSf001Oracle: String = {
    val values = AnnRerankSf001.map { case (q, a, r) =>
      s"(CAST($q AS BIGINT), CAST($a AS BIGINT), CAST($r AS BIGINT), CAST(500 AS BIGINT))"
    }.mkString(", ")
    s"""
        SELECT * FROM (VALUES $values) v(query_id, n_hits_adc, n_hits_rerank, corpus_rows)
        ORDER BY query_id"""
  }

  val all: Seq[QueryDef] = Seq(

    // ---- dbt schema tests (reference dbt_project.yml:17 test-paths) ------
    // Five checks across three tables; the fixture plants REAL violations
    // (unique on a line-level key; accepted_values missing a flag value;
    // relationships against a half parent) so nonzero paths are certified,
    // not just the all-green diagonal.
    QueryDef("dq_report",
      (s, dir) => {
        import graft.operators.DataQuality._
        val orders = Tables.read(s, dir, "orders")
        val lineitem = Tables.read(s, dir, "lineitem")
        val halfCustomer = Tables.read(s, dir, "customer")
          .filter(col("c_custkey") % 2 === 0)
        report(Seq(
          notNull(orders, "o_custkey"),
          unique(orders, "o_orderkey"),
          unique(lineitem, "l_orderkey"),
          acceptedValues(lineitem, "l_returnflag", Seq("A", "N")),
          relationships(orders, "o_custkey", halfCustomer, "c_custkey")))
      },
      Some("""
        SELECT 'accepted_values:l_returnflag' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS violations
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')
        UNION ALL
        SELECT 'not_null:o_custkey', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_custkey IS NULL
        UNION ALL
        SELECT 'relationships:o_custkey->c_custkey', CAST(COUNT(*) AS BIGINT)
        FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey % 2 = 0)
        UNION ALL
        SELECT 'unique:l_orderkey', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT l_orderkey FROM lineitem
              GROUP BY 1 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'unique:o_orderkey', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT o_orderkey FROM orders
              GROUP BY 1 HAVING COUNT(*) > 1)
        ORDER BY check_name""")),

    // ---- table profiling -------------------------------------------------
    // Exact variant certified cross-engine on mixed types (BIGINT, INT,
    // VARCHAR, TIMESTAMP); the HLL single-pass variant is probed in
    // R8Spec (accuracy + no-Expand plan pin).
    QueryDef("profile_table",
      (s, dir) => graft.operators.Profile.profile(
        Tables.read(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")),
      Some("""
        SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_orderkey) AS n_nulls,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
               CAST(MAX(l_orderkey) AS VARCHAR) AS max_value
        FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
               CAST(COUNT(DISTINCT l_linenumber) AS BIGINT),
               CAST(MIN(l_linenumber) AS VARCHAR),
               CAST(MAX(l_linenumber) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
               CAST(MIN(l_returnflag) AS VARCHAR),
               CAST(MAX(l_returnflag) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
               CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
               CAST(MIN(l_shipdate) AS VARCHAR),
               CAST(MAX(l_shipdate) AS VARCHAR)
        FROM lineitem
        ORDER BY col_name""")),

    // ---- dbt snapshots: SCD2 check-strategy fold -------------------------
    // Two deterministic source states derived from orders: run 2 changes
    // priority for keys %7=0, hard-deletes keys %11=0, and inserts fresh
    // keys (+1e8) for %13=0 — so every arm of the state machine (close on
    // change, close on delete, carry unchanged, open changed, open new)
    // lands rows the oracle reconstructs independently.
    QueryDef("scd2_snapshot",
      (s, dir) => {
        import graft.materialize.Scd2
        val orders = Tables.read(s, dir, "orders")
        val s1 = orders.select(col("o_orderkey"), col("o_orderpriority"))
        val s2 = orders.filter(col("o_orderkey") % 11 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0,
              concat(col("o_orderpriority"), lit("-v2")))
              .otherwise(col("o_orderpriority")).as("o_orderpriority"))
          .unionByName(orders.filter(col("o_orderkey") % 13 === 0)
            .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
              col("o_orderpriority")))
        val t1 = lit("2026-01-01 00:00:00")
        val t2 = lit("2026-02-01 00:00:00")
        Scd2.snapshot(Scd2.init(s1, t1), s2,
            Seq("o_orderkey"), Seq("o_orderpriority"), t2, hardDeletes = true)
          .orderBy("o_orderkey", "valid_from")
      },
      Some("""
        WITH t AS (SELECT TIMESTAMP '2026-01-01 00:00:00' t1,
                          TIMESTAMP '2026-02-01 00:00:00' t2),
        v1_closed AS (          -- changed or deleted: close at t2
          SELECT o_orderkey, o_orderpriority,
                 (SELECT t1 FROM t) AS valid_from, (SELECT t2 FROM t) AS valid_to
          FROM orders
          WHERE o_orderkey % 11 = 0
             OR (o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0)),
        v1_current AS (         -- unchanged: carried as current
          SELECT o_orderkey, o_orderpriority,
                 (SELECT t1 FROM t), NULL::TIMESTAMP
          FROM orders
          WHERE o_orderkey % 11 <> 0 AND o_orderkey % 7 <> 0),
        v2_current AS (         -- changed keys reopen with the new value
          SELECT o_orderkey, o_orderpriority || '-v2',
                 (SELECT t2 FROM t), NULL::TIMESTAMP
          FROM orders
          WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0),
        fresh AS (              -- brand-new keys open at t2
          SELECT o_orderkey + 100000000, o_orderpriority,
                 (SELECT t2 FROM t), NULL::TIMESTAMP
          FROM orders WHERE o_orderkey % 13 = 0)
        SELECT * FROM v1_closed
        UNION ALL SELECT * FROM v1_current
        UNION ALL SELECT * FROM v2_current
        UNION ALL SELECT * FROM fresh
        ORDER BY o_orderkey, valid_from""")),

    // ---- Avro interchange: write + schema-pinned read --------------------
    // Same value-exact roundtrip contract as orc_source/csv_source. The
    // runtime bundles the Avro format classes but not its DataSource
    // registration, so the format is addressed by class name — semantics
    // are identical to `format("avro")` on a registered deployment.
    QueryDef("avro_source",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val tmp = java.nio.file.Files.createTempDirectory("graft_avro_").toString
        val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
        docs.coalesce(2).write.mode("overwrite").format(fmt).save(tmp)
        s.read.schema(docs.schema).format(fmt).load(tmp)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents ORDER BY doc_id""")),

    // ---- XML interchange: write + schema-pinned read ---------------------
    // The row-oriented interchange the long tail of enterprise feeds
    // still speaks. Roundtrip must preserve markup-significant text
    // (angle brackets, ampersands, newlines) through entity escaping —
    // the documents fixture's text column exercises exactly that.
    QueryDef("xml_source",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val tmp = java.nio.file.Files.createTempDirectory("graft_xml_").toString
        docs.coalesce(2).write.mode("overwrite")
          .format("xml").option("rowTag", "doc").save(tmp)
        s.read.schema(docs.schema).format("xml").option("rowTag", "doc")
          .load(tmp)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents ORDER BY doc_id""")),

    // ---- binaryFile ingest: the multimodal front door --------------------
    // A file-per-document tree read back through Spark's distributed
    // binaryFile source; each blob keyed by the id in its file name,
    // certified by byte length and content digest against the table the
    // files came from (md5 over UTF-8 bytes on both engines).
    QueryDef("binaryfile_source",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .filter(col("doc_id") < 100).select("doc_id", "text")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_bincorpus_").toString
        graft.sources.BinaryCorpus.writeTextFiles(docs, "doc_id", "text", tmp)
        graft.sources.BinaryCorpus.readBinaryDir(s, tmp)
          .select("doc_id", "n_bytes", "content_md5")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents WHERE doc_id < 100
        ORDER BY doc_id""")),

    // ---- ANN: two-stage IVFPQ serve + exact rerank -----------------------
    // Stage 1: codes-only ADC candidates (k·refine per query, cell-pruned
    // scan, vectors never read). Stage 2: fetch ONLY those candidate ids'
    // original vectors (broadcast hash probe — the corpus is not shuffled)
    // and re-rank by exact cosine. The gate emits recall@10 vs brute for
    // BOTH stages so the refinement win is itself certified: rerank fixes
    // every ADC ordering error inside the candidate pool, so
    // n_hits_rerank >= n_hits_adc row by row, with the pinned sf0.01
    // values showing strict improvement.
    QueryDef("ann_topk_rerank",
      (s, dir) => {
        import graft.llm.{IvfPq, Similarity}
        val emb = Tables.read(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        val nCorpus = emb.count()
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_rerank_idx_").toString
        IvfPq.write(emb, "embedding", "vec_id", idxPath,
          nCells = 16, m = 8, k = 16, iters = 3, corpusRows = Some(nCorpus))
        val adc = IvfPq.topK(s, idxPath, queries, "embedding", "vec_id",
          k = 10, nProbe = 4)
        val rr = IvfPq.topKRerank(s, idxPath, queries, emb,
          "embedding", "vec_id", k = 10, nProbe = 4, refine = 4)
        val brute = Similarity
          .bruteForceTopK(emb, queries, "embedding", "vec_id", k = 10)
          .select("query_id", "neighbor_id")
        def hits(res: org.apache.spark.sql.DataFrame, as: String) =
          res.select("query_id", "neighbor_id")
            .join(brute, Seq("query_id", "neighbor_id"), "left_semi")
            .groupBy("query_id").agg(count(lit(1)).as(as))
        // outer-join from the query-id spine so a zero-recall query still
        // emits its row (a dropped row would silently pass a weaker gate)
        queries.select(col("vec_id").as("query_id"))
          .join(hits(adc, "n_hits_adc"), Seq("query_id"), "left")
          .join(hits(rr, "n_hits_rerank"), Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_hits_adc"), lit(0L)).as("n_hits_adc"),
            coalesce(col("n_hits_rerank"), lit(0L)).as("n_hits_rerank"),
            lit(nCorpus).as("corpus_rows"))
          .orderBy("query_id")
      },
      Some(AnnRerankSf001Oracle)),

    // ---- hybrid retrieval: BM25 + dense cosine, reciprocal-rank fused ----
    // Queries are docs 0-9, which exist in BOTH modalities (first-5-token
    // text for the lexical side, the matching vec_id embedding for the
    // dense side). Each side's top-10 is fused by integer RRF. The oracle
    // is fully relational: the PROVEN bm25_topk CTE chain + the PROVEN
    // brute-cosine chain + the fusion arithmetic, so the gate certifies
    // the composition end to end with no pinned constants.
    QueryDef("hybrid_topk",
      (s, dir) => {
        import graft.llm.{Retrieval, Similarity}
        val docs = Tables.read(s, dir, "documents")
        val emb = Tables.read(s, dir, "embeddings")
        val qLex = docs.filter(col("doc_id") < 10)
          .select(col("doc_id"),
            array_join(slice(graft.llm.Dedup.tokens(col("text")), 1, 5), " ")
              .as("qtext"))
        val lex = Retrieval.bm25TopK(docs, "text", "doc_id",
          qLex, "qtext", "doc_id", k = 10)
        val sem = Similarity
          .bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
            "embedding", "vec_id", k = 10)
          .withColumnRenamed("neighbor_id", "doc_id")
        Retrieval.rrfFuse(Seq(lex, sem), k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        n AS (SELECT COUNT(*) nd, greatest(1, 1073741824 // COUNT(*)) scale
              FROM documents),
        t AS (SELECT CAST(SUM(len(w)) AS BIGINT) tt FROM d),
        a AS (SELECT (1000 * (SELECT tt FROM t)) // (SELECT nd FROM n) AS adm),
        lp AS (SELECT doc_id,
                 (1000000 * CAST(len(w) AS BIGINT)) // (SELECT adm FROM a) AS lpm
               FROM d),
        p AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) tf
              FROM (SELECT doc_id, unnest(w) term FROM d) GROUP BY 1, 2),
        idf AS (SELECT term,
                  CAST(((SELECT nd FROM n) * (SELECT scale FROM n)) // COUNT(*) AS BIGINT) idf
                FROM p GROUP BY term),
        q AS (SELECT doc_id q_id, unnest(list_distinct(list_slice(w, 1, 5))) term
              FROM d WHERE doc_id < 10),
        sc AS (SELECT q_id, p.doc_id,
                 CAST(SUM(least(
                   (idf * 22000 * least(tf, 10000))
                     // (10000 * least(tf, 10000) + 3000 + 9 * lpm),
                   17592186044416)) AS BIGINT) score
               FROM q JOIN p USING (term) JOIN idf USING (term)
               JOIN lp ON p.doc_id = lp.doc_id
               GROUP BY 1, 2),
        lexr AS (SELECT q_id AS query_id, doc_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY score DESC, doc_id) rnk
                 FROM sc),
        eq AS (SELECT * FROM embeddings WHERE vec_id < 10),
        cs AS (SELECT eq.vec_id query_id, e.vec_id doc_id,
                 list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) c
               FROM eq JOIN embeddings e ON eq.vec_id <> e.vec_id),
        semr AS (SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY round(c, 6) DESC, doc_id) rnk
                 FROM cs),
        fused AS (SELECT query_id, doc_id,
                    CAST(SUM(1000000000000 // (60 + rnk)) AS BIGINT) score
                  FROM (SELECT query_id, doc_id, rnk FROM lexr WHERE rnk <= 10
                        UNION ALL
                        SELECT query_id, doc_id, rnk FROM semr WHERE rnk <= 10)
                  GROUP BY 1, 2),
        fr AS (SELECT query_id, doc_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id) rnk
               FROM fused)
        SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score
        FROM fr WHERE rnk <= 10
        ORDER BY query_id, rank""")),

    // ---- line-level repetition stats (Gopher Table A1, line half) --------
    // The corpus text is single-line, so the gate BUILDS a lined fixture
    // deterministically from each doc's own tokens (8-token lines), with
    // planted shapes keyed on doc_id: %5 bullets line 1, %7 appends a
    // duplicate of line 1, %11 appends line 1 + "..." — every counter has
    // nonzero rows. The identical construction runs relationally in the
    // oracle (DuckDB lambda indexes are 1-based vs Spark's 0-based).
    QueryDef("repetition_lines",
      (s, dir) => {
        import graft.llm.{Curation, Dedup}
        val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 2000)
        val toks = Dedup.tokens(col("text"))
        val base = when(size(toks) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), floor((size(toks) - lit(1)) / lit(8)).cast("int")),
            i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")))
        val b1 = when(pmod(col("doc_id"), lit(5L)) === 0 && size(base) > 0,
          transform(base, (l, i) =>
            when(i === 0, concat(lit("- "), l)).otherwise(l))).otherwise(base)
        val b2 = when(pmod(col("doc_id"), lit(7L)) === 0 && size(b1) > 0,
          concat(b1, array(element_at(b1, 1)))).otherwise(b1)
        val b3 = when(pmod(col("doc_id"), lit(11L)) === 0 && size(b2) > 0,
          concat(b2, array(concat(element_at(b2, 1), lit("..."))))).otherwise(b2)
        val lined = docs.select(col("doc_id"), array_join(b3, "\n").as("text"))
        Curation.lineStats(lined, "text", "doc_id").orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents WHERE doc_id < 2000),
        l0 AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(range(0, (len(w) - 1) // 8 + 1),
                        i -> array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' '))
                 END lines FROM d),
        l1 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 AND len(lines) > 0
                 THEN list_transform(lines,
                        (l, i) -> CASE WHEN i = 1 THEN '- ' || l ELSE l END)
                 ELSE lines END lines FROM l0),
        l2 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 AND len(lines) > 0
                 THEN list_append(lines, lines[1]) ELSE lines END lines FROM l1),
        l3 AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 AND len(lines) > 0
                 THEN list_append(lines, lines[1] || '...') ELSE lines END lines
               FROM l2),
        t AS (SELECT doc_id,
                string_split(array_to_string(lines, chr(10)), chr(10)) ls
              FROM l3)
        SELECT doc_id,
          CAST(len(ls) AS BIGINT) AS n_lines,
          CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines,
          CAST(list_sum(list_transform(ls, x -> len(x))) AS BIGINT) AS n_chars,
          CAST(list_sum(list_transform(ls, x -> len(x)))
               - list_sum(list_transform(list_distinct(ls), x -> len(x)))
               AS BIGINT) AS n_dup_chars,
          CAST(len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*•]')))
               AS BIGINT) AS n_bullet_lines,
          CAST(len(list_filter(ls, x -> regexp_matches(x, '(\.\.\.|…)\s*$')))
               AS BIGINT) AS n_ellipsis_lines
        FROM t ORDER BY doc_id""")),

    // ---- CCNet paragraph dedup: normalized keys, original text kept ------
    // Paragraphs (16-token chunks joined by blank lines) dedup on a
    // NORMALIZED key (lowercase, strip non-alphanumerics) while the kept
    // text preserves original formatting — so the planted near-copy
    // (doc_id % 9: paragraph 1 UPPERCASED + ' !!') collapses onto its
    // original even though the raw strings differ, which raw segment_dedup
    // would keep. First occurrence = (min doc_id, min position), global
    // across the corpus.
    QueryDef("paragraph_dedup",
      (s, dir) => {
        import graft.llm.{Curation, Dedup}
        val docs = Tables.read(s, dir, "documents")
        val toks = Dedup.tokens(col("text"))
        val paras = when(size(toks) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), floor((size(toks) - lit(1)) / lit(16)).cast("int")),
            i => array_join(slice(toks, i * 16 + 1, lit(16)), " ")))
        val planted = when(pmod(col("doc_id"), lit(9L)) === 0 && size(paras) > 0,
          concat(paras, array(concat(upper(element_at(paras, 1)), lit(" !!")))))
          .otherwise(paras)
        val prepped = docs.select(col("doc_id"),
          array_join(planted, "\n\n").as("ptext"))
        Curation.segmentDedupBy(prepped, "ptext", "doc_id",
            t => filter(split(t, "\n\n"), p => length(p) > 0),
            seg => regexp_replace(lower(seg), "[^a-z0-9]", ""),
            joinWith = "\n\n")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        p0 AS (SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(range(0, (len(w) - 1) // 16 + 1),
                        i -> array_to_string(list_slice(w, i * 16 + 1, i * 16 + 16), ' '))
                 END paras FROM d),
        p1 AS (SELECT doc_id, CASE WHEN doc_id % 9 = 0 AND len(paras) > 0
                 THEN list_append(paras, upper(paras[1]) || ' !!')
                 ELSE paras END paras FROM p0),
        t AS (SELECT doc_id,
                list_filter(
                  string_split(array_to_string(paras, chr(10) || chr(10)),
                               chr(10) || chr(10)),
                  s -> len(s) > 0) segs
              FROM p1),
        e AS (SELECT doc_id, CAST(r.i AS INT) seg_idx, segs[CAST(r.i AS INT)] seg
              FROM t, unnest(range(1, len(segs) + 1)) r(i)),
        m AS (SELECT doc_id, seg_idx, seg,
                row_number() OVER (
                  PARTITION BY regexp_replace(lower(seg), '[^a-z0-9]', '', 'g')
                  ORDER BY doc_id, seg_idx) rn
              FROM e),
        agg AS (SELECT doc_id,
                  COUNT(*) AS n_seg,
                  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                  COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END,
                             chr(10) || chr(10) ORDER BY seg_idx), '') AS text_clean
                FROM m GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(agg.n_seg, 0) AS n_seg,
               COALESCE(agg.n_kept, 0) AS n_kept,
               COALESCE(agg.text_clean, '') AS text_clean
        FROM d LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id""")),

    // ---- streaming incremental dedup against the materialized index ------
    // The daily loop as an actual Structured Streaming query: fresh docs
    // arrive as files, each micro-batch is served against the persisted
    // MinHash index then appended into it (serve-then-append), so batch 2
    // finds its pairs against corpus AND batch 1. Same fixture and SAME
    // oracle as dedup_incremental / dedup_incremental_indexed: the union
    // of per-batch pair sets must equal the one-shot serve exactly —
    // batching changes when a pair is discovered, never the result.
    QueryDef("stream_dedup_indexed",
      (s, dir) => {
        import java.nio.file.Files
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val idxPath = Files.createTempDirectory("graft_smh_idx_").toString
        graft.llm.MinHashIndex.write(corpus, "text", "doc_id", idxPath,
          nBuckets = 16)
        val srcDir = Files.createTempDirectory("graft_smh_src_").toString
        // batch 1: the plain fresh docs; batch 2: the planted clones,
        // whose originals live in the INDEXED corpus (cross-batch serve)
        docs.filter(col("doc_id") >= 250).select("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(srcDir)
        docs.filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val pairsPath = Files.createTempDirectory("graft_smh_pairs_").toString
        val ckpt = Files.createTempDirectory("graft_smh_ck_").toString
        val schema = s.read.parquet(srcDir).schema
        graft.streaming.StreamingIncremental.withStatePartitions(s) {
          val q = graft.streaming.StreamingIncremental.streamingIndexedDedup(
            s, srcDir, schema, idxPath, pairsPath, ckpt, "text", "doc_id",
            jaccardThreshold = 0.8, nBuckets = 16, maxFilesPerTrigger = Some(1))
          q.awaitTermination()
        }
        s.read.parquet(pairsPath)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
      },
      Some(QueriesR7.IncrementalDedupOracle)),

    // ---- DSIR importance weighting (data selection) ----------------------
    // Raw corpus = all documents; target = every 20th (doc_id % 20 = 1,
    // the simulated trusted slice). Hashed unigram+bigram buckets, two
    // add-one multinomials under ONE shared fixed-point scale, per-doc
    // score = sum of whole-bit surprisal differences (positive = more
    // target-like). Exact integers end to end — the oracle rebuilds the
    // entire derivation relationally (md5 bucket hash, shared scale,
    // bin-length floor-log2).
    QueryDef("dsir_score",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        graft.llm.Dsir.score(docs,
            docs.filter(pmod(col("doc_id"), lit(20L)) === 1),
            "text", "doc_id", nBuckets = 4096)
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
               FROM hb GROUP BY 1, 2),
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
        FROM (SELECT DISTINCT doc_id FROM documents) ids
        LEFT JOIN agg USING (doc_id)
        ORDER BY ids.doc_id""")),

    // ---- Unicode + whitespace normalization (first cleaning pass) --------
    // The corpus text is ASCII, so the gate plants every shape the pass
    // exists for, keyed on doc_id: decomposed e+U+0301 (NFC composes),
    // a C0 control char, a U+FFFD transcode scar, decomposed A+U+030A,
    // and double-spacing. Both engines build the identical fixture; the
    // JDK normalizer and DuckDB's utf8proc implement the same Unicode
    // canonical composition, which is what the gate certifies.
    QueryDef("text_normalize",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val planted = docs.select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(3L)) === 0, lit(" cafe\u0301"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(4L)) === 0, lit("\u0007ding"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(5L)) === 0, lit(" bad\uFFFDbyte"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(6L)) === 0, lit(" A\u030Angstrom"))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(7L)) === 0, lit("  double  spaced "))
              .otherwise(lit(""))).as("text"))
        graft.llm.Curation.normalizeText(planted, "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""
        WITH planted AS (
          SELECT doc_id, text ||
            CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) ELSE '' END ||
            CASE WHEN doc_id % 4 = 0 THEN chr(7) || 'ding' ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN ' bad' || chr(65533) || 'byte' ELSE '' END ||
            CASE WHEN doc_id % 6 = 0 THEN ' A' || chr(778) || 'ngstrom' ELSE '' END ||
            CASE WHEN doc_id % 7 = 0 THEN '  double  spaced ' ELSE '' END AS text
          FROM documents),
        n AS (SELECT doc_id, text AS orig, nfc_normalize(text) AS nfc
              FROM planted),
        c AS (SELECT doc_id, orig, nfc,
                regexp_replace(nfc, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')
                  AS no_ctrl
              FROM n),
        f AS (SELECT doc_id, orig, nfc, no_ctrl,
                trim(regexp_replace(no_ctrl, '[ \t]+', ' ', 'g')) AS text_clean
              FROM c)
        SELECT doc_id, text_clean,
          CAST(len(nfc) - len(no_ctrl) AS BIGINT) AS n_ctrl,
          CAST(len(nfc) - len(replace(nfc, chr(65533), '')) AS BIGINT) AS n_repl,
          CAST(len(orig) - len(nfc) AS BIGINT) AS n_composed,
          CASE WHEN text_clean = orig THEN CAST(0 AS BIGINT)
               ELSE CAST(1 AS BIGINT) END AS changed
        FROM f ORDER BY doc_id"""))
  )
}
