package graft

import org.apache.spark.sql.functions._

/** Round-7 gate queries: the warehouse-materialized curation pipeline —
  * the resume-able staging variant of `curation_e2e` — certified by the
  * same independent DuckDB derivation of the curated survivor set. */
object QueriesR7 {

  /** Shared BM25 oracle: exact-integer scoring (see Retrieval.bm25TopK's
    * numeric-design scaladoc), used by both the direct `bm25_topk` gate
    * and the served-from-index `bm25_index_topk` gate — the index MUST
    * reproduce the direct path bit-for-bit. */
  private val Bm25OracleSql = """
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
              FROM d WHERE doc_id % 100 = 3),
        sc AS (SELECT q_id, p.doc_id,
                 CAST(SUM(least(
                   (idf * 22000 * least(tf, 10000))
                     // (10000 * least(tf, 10000) + 3000 + 9 * lpm),
                   17592186044416)) AS BIGINT) score
               FROM q JOIN p USING (term) JOIN idf USING (term)
               JOIN lp ON p.doc_id = lp.doc_id
               GROUP BY 1, 2),
        r AS (SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) rnk
              FROM sc)
        SELECT q_id AS query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score
        FROM r WHERE rnk <= 10
        ORDER BY query_id, rank"""


  /** Shared by dedup_incremental_indexed (r7) and stream_dedup_indexed
    * (r8): near-dup pairs over corpus (<250) + fresh (>=250 and planted
    * clones), keeping only pairs that TOUCH the fresh set — the
    * incremental serve's contract regardless of how the fresh set is
    * batched. */
  private[graft] val IncrementalDedupOracle: String = s"""
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
        ORDER BY id_a, id_b"""

  val all: Seq[QueryDef] = Seq(

    // ---- materialized multi-stage curation pipeline ----------------------
    // Same composition as curation_e2e (LM filter -> exact dedup -> split
    // -> report) but staged through Warehouse TABLES between stages (the
    // production resume-able shape; R7Spec proves crash-retry semantics).
    // The oracle chains the SAME survivor CTEs as curation_e2e — one
    // definition of the curated set certifying both the checkpointed and
    // the materialized staging. total_chars is strlen(text): the pipeline
    // is generic over (id, text) and derives lengths itself rather than
    // trusting a precomputed n_chars column.
    QueryDef("pipeline_materialized",
      (s, dir) => {
        import graft.llm.CurationPipeline
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        val wh = new graft.warehouse.Warehouse(
          java.nio.file.Files.createTempDirectory("graft_gate_wh_").toString, s)
        CurationPipeline.run(wh, docs,
          docs.filter(col("doc_id") % 2 === 0), "text", "doc_id",
          CurationPipeline.Stages("proj", "curation"))
      },
      Some(s"""
        WITH ${QueriesR6.CurationSurvivorCtes},
        assigned AS (
          SELECT doc_id, length(text) AS n_chars,
                 CASE WHEN b < 10 THEN 'test'
                      WHEN b < 20 THEN 'val'
                      ELSE 'train' END AS split
          FROM (
            SELECT doc_id, text,
                   CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 4)
                     AS BIGINT) % 100 AS b
            FROM documents
            WHERE doc_id IN (SELECT doc_id FROM surv)))
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM assigned GROUP BY 1
        ORDER BY split""")),

    // ---- BM25 top-k retrieval -------------------------------------------
    // Same query fixture as tfidf_topk (5-token queries from every 100th
    // doc); scores are exact BIGINTs on both engines: log-free fixed-point
    // idf (N·scale div df, scale -> 2^30), per-mille document-length
    // normalization via the Long-safe two-step form (adm = 1000·T div N,
    // lpm = 10^6·dl div adm — see Retrieval.bm25AvgDocLenMilli's overflow
    // analysis), and the k1=1.2/b=0.75 rational
    // form 22000·tf div (10000·tf + 3000 + 9·lpm) — integer div LAST, so
    // partial-agg merge order cannot move a single bit.
    QueryDef("bm25_topk",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val queries = docs.filter(col("doc_id") % 100 === 3)
          .select(col("doc_id"),
            array_join(slice(graft.llm.Dedup.tokens(col("text")), 1, 5), " ")
              .as("qtext"))
        graft.llm.Retrieval.bm25TopK(docs, "text", "doc_id",
            queries, "qtext", "doc_id", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(Bm25OracleSql)),

    // ---- BM25 served from the materialized bucket-partitioned index ------
    // Same oracle as bm25_topk: the index path must be bit-identical to
    // the direct path. The index is built with a WRITE of half the corpus
    // plus an APPEND of the other half — so the gate also certifies that
    // appended postings and the stats delta row compose correctly.
    QueryDef("bm25_index_topk",
      (s, dir) => {
        import graft.llm.Retrieval
        val docs = Tables.read(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft_lexidx_").toString
        Retrieval.writeIndex(docs.filter(col("doc_id") % 2 === 0),
          "text", "doc_id", path)
        Retrieval.appendIndex(docs.filter(col("doc_id") % 2 === 1),
          "text", "doc_id", path)
        val queries = docs.filter(col("doc_id") % 100 === 3)
          .select(col("doc_id"),
            array_join(slice(graft.llm.Dedup.tokens(col("text")), 1, 5), " ")
              .as("qtext"))
        Retrieval.bm25TopKFromIndex(s, path, queries, "qtext", "doc_id", k = 10)
          .orderBy("query_id", "rank")
      },
      Some(Bm25OracleSql)),

    // ---- incremental near-dup served from the materialized index ---------
    // Same fixture and SAME oracle as dedup_incremental: corpus docs
    // (< 250) are INDEXED once (MinHashIndex.write), then the batch
    // (>= 250 plus planted clones) is served against the index — the
    // production daily shape where the corpus is never re-shingled. The
    // served pairs must reproduce the recompute-everything path exactly.
    QueryDef("dedup_incremental_indexed",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val fresh = docs.filter(col("doc_id") >= 250)
          .unionByName(docs
            .filter(pmod(col("doc_id"), lit(10L)) === 0 && col("doc_id") < 250)
            .withColumn("doc_id", col("doc_id") + 200000L))
        val path = java.nio.file.Files
          .createTempDirectory("graft_mhidx_").toString
        // 16 buckets: sized to the gate corpus (buckets track corpus
        // size; R7Spec pins the pruning machinery at nBuckets=4)
        graft.llm.MinHashIndex.write(corpus, "text", "doc_id", path,
          nBuckets = 16)
        graft.llm.MinHashIndex
          .nearDupPairsIncremental(s, path, fresh, "text", "doc_id",
            jaccardThreshold = 0.8, nBuckets = 16)
          .orderBy("id_a", "id_b")
      },
      Some(IncrementalDedupOracle))
  )

}
