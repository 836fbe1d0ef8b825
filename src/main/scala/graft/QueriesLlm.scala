package graft

import org.apache.spark.sql.functions._

import graft.llm._

/** Training-data pipeline queries (dedup / similarity / text analysis /
  * multimodal) with DuckDB oracles. Where the algorithm is approximate by
  * construction (LSH variants), the oracle either reproduces the exact
  * same pipeline (minhash — shared constants below) or the query is
  * rows-only (ann_topk_lsh) with recall measured in SimilaritySpec.
  */
object QueriesLlm {

  // Expected recall@10 hit counts (query_id -> |approx∩brute|) at sf0.01,
  // measured once — deterministic: seeded hyperplanes / stride centroids,
  // rounded-cosine ranking with id tie-breaks on both paths.
  private val AnnLshRecallSf001: Seq[(Long, Long)] =
    Seq(0L -> 4L, 1L -> 3L, 2L -> 4L, 3L -> 5L, 4L -> 3L,
        5L -> 4L, 6L -> 6L, 7L -> 3L, 8L -> 4L, 9L -> 3L)
  private val AnnIvfRecallSf001: Seq[(Long, Long)] =
    Seq(0L -> 10L, 1L -> 6L, 2L -> 5L, 3L -> 4L, 4L -> 3L,
        5L -> 4L, 6L -> 4L, 7L -> 4L, 8L -> 3L, 9L -> 5L)

  // One merge table per sf dir, trained once and shared by bpe_merges /
  // bpe_segment — the real pipeline shape (a tokenizer is a trained
  // ARTIFACT applied many times, not retrained per query). Deterministic,
  // so memoization cannot change results.
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, String, String, Long)]]()
  private[graft] def bpeMerges(s: org.apache.spark.sql.SparkSession, dir: String) =
    bpeCache.computeIfAbsent(dir, _ =>
      Bpe.train(Tables.read(s, dir, "documents").filter(col("doc_id") < 50),
        "text", numMerges = 20))

  /** The bpe_segment oracle (pinned vs tools/bpe_reference.py) — shared
    * with the artifact-roundtrip gate, which must be indistinguishable. */
  private[graft] val BpeSegmentOracle: String = """
        SELECT * FROM (VALUES
          ('a', 'a'),
          ('agg', 'a|g|g'),
          ('batch', 'b|at|c|h'),
          ('big', 'b|i|g'),
          ('column', 'c|o|l|u|m|n'),
          ('customer', 'c|u|st|o|mer'),
          ('data', 'd|at|a'),
          ('fast', 'f|a|st'),
          ('filter', 'f|i|l|t|er'),
          ('group', 'group'),
          ('hash', 'h|a|s|h'),
          ('join', 'j|o|in'),
          ('key', 'k|e|y'),
          ('line', 'line'),
          ('merge', 'mer|g|e'),
          ('order', 'or|d|er'),
          ('part', 'par|t'),
          ('query', 'q|u|er|y'),
          ('row', 'r|ow'),
          ('scan', 's|c|an'),
          ('slow', 's|l|ow'),
          ('small', 'small'),
          ('sort', 's|or|t'),
          ('spark', 's|par|k'),
          ('stream', 'st|r|e|a|m'),
          ('table', 't|a|b|l|e'),
          ('the', 't|h|e'),
          ('value', 'v|al|u|e'),
          ('vector', 'v|e|c|t|or'),
          ('window', 'w|in|d|ow')
        ) v(token, pieces)
        ORDER BY token"""

  // The oracle pins corpus_rows as a literal while the Spark side derives
  // it from the data: if the driver's verify scale / seed / embeddings
  // table ever changes, the gate fails on a self-explanatory corpus_rows
  // mismatch instead of opaque recall-count diffs.
  private val EmbeddingsRowsSf001 = 500L

  private def annRecallValues(expected: Seq[(Long, Long)]): String = {
    val values = expected.map { case (q, n) =>
      s"(CAST($q AS BIGINT), CAST($n AS BIGINT), CAST($EmbeddingsRowsSf001 AS BIGINT))"
    }.mkString(", ")
    s"""
        SELECT * FROM (VALUES $values) v(query_id, n_hits, corpus_rows)
        ORDER BY query_id"""
  }

  // shared minhash constants rendered into the DuckDB oracle
  private[graft] def minhashSigSql: String =
    Dedup.MinhashA.zip(Dedup.MinhashB).map { case (a, b) =>
      s"list_min(list_transform(h, x -> ($a*x + $b) % ${Dedup.MinhashP}))"
    }.mkString("[", ", ", "]")

  // The full minhash candidate pipeline as a DuckDB CTE chain (tokenize →
  // shingle → hash → signature → bands → candidate pairs). ONE definition
  // serves every oracle that mirrors Dedup.minhashNearDupPairs
  // (dedup_minhash_lsh here; dedup_components / dedup_pipeline in
  // QueriesExt) — a Spark-side pipeline change only has one SQL twin to
  // update.
  private[graft] def minhashCandCtes(src: String = "documents"): String = s"""d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM $src),
        sh AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2])) s
               FROM d),
        hs AS (SELECT doc_id,
                 list_distinct(list_transform(s, x -> CAST('0x'||substr(md5(x),1,8) AS BIGINT))) h
               FROM sh),
        sig AS (SELECT doc_id, h, $minhashSigSql m FROM hs),
        bands AS (
          SELECT doc_id, 0 AS band, concat_ws(':', m[1], m[2], m[3], m[4]) AS key FROM sig
          UNION ALL
          SELECT doc_id, 1, concat_ws(':', m[5], m[6], m[7], m[8]) FROM sig),
        cand AS (
          SELECT DISTINCT a.doc_id ia, b.doc_id ib
          FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
            AND a.doc_id < b.doc_id)"""

  val all: Seq[QueryDef] = Seq(

    // ---- exact dedup (hash-groupBy) ------------------------------------
    QueryDef("dedup_exact",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val planted = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
        Dedup.exact(docs.unionByName(planted), "text", "doc_id")
          .select(col("doc_id"), col("n_copies"))
          .orderBy("doc_id")
      },
      Some("""
        WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0)
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM all_docs GROUP BY md5(text)
        ORDER BY doc_id""")),

    // ---- MinHash + banded LSH near-dup (same-pipeline oracle) ----------
    QueryDef("dedup_minhash_lsh",
      (s, dir) =>
        Dedup.minhashNearDupPairs(Tables.read(s, dir, "documents"),
            "text", "doc_id", jaccardThreshold = 0.8)
          .orderBy("id_a", "id_b"),
      Some(s"""
        WITH ${minhashCandCtes()},
        ver AS (
          SELECT ia, ib,
                 CAST(len(list_intersect(x.h, y.h)) AS DOUBLE) /
                   len(list_distinct(x.h || y.h)) jac
          FROM cand JOIN hs x ON cand.ia = x.doc_id JOIN hs y ON cand.ib = y.doc_id)
        SELECT ia AS id_a, ib AS id_b, jac AS jaccard
        FROM ver WHERE jac >= 0.8 ORDER BY id_a, id_b""")),

    // ---- SimHash near-dup (pigeonhole-exact; independent oracle) -------
    QueryDef("dedup_simhash",
      (s, dir) =>
        Dedup.simhashNearDupPairs(Tables.read(s, dir, "documents"),
            "text", "doc_id", maxHamming = 5)
          .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
          .orderBy("id_a", "id_b"),
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) toks
                   FROM documents),
        tok AS (SELECT doc_id, CAST('0x'||substr(md5(x.t),1,15) AS BIGINT) h
                FROM d, unnest(d.toks) x(t)),
        bits AS (SELECT doc_id, r.i,
                   SUM(2*((h >> CAST(r.i AS INT)) & 1) - 1) sgn
                 FROM tok, (SELECT unnest(range(0,60)) i) r GROUP BY doc_id, r.i),
        sim AS (SELECT doc_id,
                  SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                           ELSE CAST(0 AS BIGINT) END) sig
                FROM bits GROUP BY doc_id)
        SELECT a.doc_id id_a, b.doc_id id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 5
        ORDER BY id_a, id_b""")),

    // ---- exact n-gram Jaccard (inverted index vs O(n²) oracle) ---------
    QueryDef("dedup_ngram_jaccard",
      (s, dir) =>
        Dedup.ngramJaccardPairs(Tables.read(s, dir, "documents"),
            "text", "doc_id", threshold = 0.8)
          .orderBy("id_a", "id_b"),
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
               FROM sh)
        SELECT a.doc_id id_a, b.doc_id id_b,
               CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) /
                 len(list_distinct(a.h || b.h)) AS jaccard
        FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.h, b.h)) AS DOUBLE) /
                len(list_distinct(a.h || b.h)) >= 0.8
        ORDER BY id_a, id_b""")),

    // ---- embedding cosine near-dup (exact baseline) --------------------
    // The brute-force pair operator is the documented O(n²) VERIFICATION
    // baseline (Dedup.scala scaladoc); this gate quarantines it to a
    // bounded n<=1000 subset so the cartesian is never benchmarked at
    // scale — dedup_embedding_lsh is the production path (VERDICT r5).
    QueryDef("dedup_embedding_cosine",
      (s, dir) =>
        Dedup.embeddingNearDupPairs(
            Tables.read(s, dir, "embeddings").filter(col("vec_id") < 1000),
            "embedding", "vec_id", threshold = 0.45)
          .orderBy("id_a", "id_b"),
      Some("""
        SELECT a.vec_id id_a, b.vec_id id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 1000 AND b.vec_id < 1000
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
        ORDER BY id_a, id_b""")),

    // ---- embedding near-dup, LSH scale path ----------------------------
    // Gated at the operator's OPERATING POINT — the near-dup regime
    // (cos >= 0.9) — on planted twins (vec_id < 10 rescaled by 1.001: a
    // positive scalar multiple, cosine ≈ 1), with NO all-pairs operator
    // anywhere in the executed plan (pinned in PlanSpec). Deterministic:
    // seeded hyperplanes, fixed plant. Expected pairs = the 10 planted
    // twins; the corpus_rows guard fails self-explanatorily if the
    // driver's verify scale ever changes.
    QueryDef("dedup_embedding_lsh",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val planted = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
        val corpus = emb.select("vec_id", "embedding").unionByName(planted)
        Dedup.embeddingNearDupPairsLsh(corpus, "embedding", "vec_id", 0.9)
          .withColumn("corpus_rows", lit(corpus.count()))
          .orderBy("id_a", "id_b")
      },
      Some {
        val rows = (0L until 10L).map(q =>
          s"(CAST($q AS BIGINT), CAST(${q + 100000L} AS BIGINT), " +
            s"CAST(${EmbeddingsRowsSf001 + 10} AS BIGINT))").mkString(", ")
        s"""
        SELECT * FROM (VALUES $rows) v(id_a, id_b, corpus_rows)
        ORDER BY id_a, id_b"""
      }),

    // ---- ANN: brute-force cosine top-k ---------------------------------
    QueryDef("ann_topk_brute",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
            "embedding", "vec_id", k = 10)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH q AS (SELECT * FROM embeddings WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id query_id, e.vec_id neighbor_id,
                 list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) c
          FROM q JOIN embeddings e ON q.vec_id <> e.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY round(c, 6) DESC, neighbor_id) rank
          FROM scored)
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank""")),

    // ---- ANN: hyperplane-LSH bucketed top-k (scale path) ---------------
    // Approximate by construction but fully DETERMINISTIC (seeded planes,
    // rounded-cosine rank with id tie-break), so the gate checks recall@10
    // against the exact brute-force answer: n_hits = |lsh∩brute| per query.
    // Expected counts pinned at the driver's fixed verify scale (sf0.01);
    // threshold-free recall is also asserted in LlmSpec.
    QueryDef("ann_topk_lsh",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        val lsh = Similarity.lshTopK(emb, queries, "embedding", "vec_id", k = 10)
        val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 10)
        lsh.select("query_id", "neighbor_id")
          .join(brute.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
          .withColumn("corpus_rows", lit(emb.count()))
          .orderBy("query_id")
      },
      Some(annRecallValues(AnnLshRecallSf001))),

    // ---- ANN: IVF coarse-quantizer top-k (second scale path) -----------
    // Same deterministic recall@10 gate as ann_topk_lsh (stride centroids
    // are seeded/deterministic).
    QueryDef("ann_topk_ivf",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        val nCorpus = emb.count()
        val ivf = Similarity.ivfTopK(emb, queries, "embedding", "vec_id", k = 10,
          corpusRows = Some(nCorpus))
        val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 10)
        ivf.select("query_id", "neighbor_id")
          .join(brute.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("query_id")
      },
      Some(annRecallValues(AnnIvfRecallSf001))),

    // ---- ANN: cell-partitioned IVF index with pruned reads --------------
    // Same quantizer, assignment, and rank contract as ann_topk_ivf, but
    // served from a materialized index partitioned BY CELL: the reader
    // scans only the probed cell directories (PartitionFilters on cid —
    // pinned in PlanSpec). Results are identical to ivfTopK, so the gate
    // pins the same recall@10 counts.
    QueryDef("ann_topk_ivf_pruned",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        val nCorpus = emb.count()
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_ivf_idx_").toString
        IvfIndex.write(emb, "embedding", "vec_id", idxPath,
          corpusRows = Some(nCorpus))
        val ivf = IvfIndex.topK(s, idxPath, queries, "embedding", "vec_id", k = 10)
        val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 10)
        ivf.select("query_id", "neighbor_id")
          .join(brute.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("query_id")
      },
      Some(annRecallValues(AnnIvfRecallSf001))),

    // ---- ANN: product-quantization ADC top-k (memory-bound serving) -----
    // Codes-only scoring: the corpus vectors are never read at query time
    // (m byte-codes + recon norm per doc — a 32x shrink at dim=64/m=8).
    // Gated at PQ's operating point like dedup_embedding_lsh: planted
    // cos≈1 twins must be retrieved at rank 1 (a twin quantizes to the
    // query's own codes, so its ADC score is the max reachable). Fully
    // deterministic: stride init, fixed iters, rounded centroids.
    QueryDef("ann_topk_pq",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val planted = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
        val corpus = emb.select("vec_id", "embedding").unionByName(planted)
        val nCorpus = corpus.count()
        val books = Pq.fit(corpus, "embedding", "vec_id", m = 8, k = 8,
          iters = 3, corpusRows = Some(nCorpus))
        val queries = emb.filter(col("vec_id") < 10)
        Pq.topK(Pq.encode(corpus, "embedding", "vec_id", books), books,
            queries, "embedding", "vec_id", k = 10)
          .filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("query_id")
      },
      Some {
        val rows = (0L until 10L).map(q =>
          s"(CAST($q AS BIGINT), CAST(${q + 100000L} AS BIGINT), " +
            s"CAST(${EmbeddingsRowsSf001 + 10} AS BIGINT))").mkString(", ")
        s"""
        SELECT * FROM (VALUES $rows) v(query_id, neighbor_id, corpus_rows)
        ORDER BY query_id"""
      }),

    // ---- ANN: IVF+PQ index (cell-pruned scan of codes, ADC scoring) -----
    // The canonical planet-scale shape: inverted lists ON DISK (partition
    // pruning, IvfIndex) + residual PQ codes IN the lists (32x memory
    // shrink, Pq). Same planted-twin pin as ann_topk_pq: the twin shares
    // its query's cell and residual codes, so ADC ranks it first.
    QueryDef("ann_topk_ivfpq",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val planted = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
        val corpus = emb.select("vec_id", "embedding").unionByName(planted)
        val nCorpus = corpus.count()
        val idxPath = java.nio.file.Files
          .createTempDirectory("graft_ivfpq_idx_").toString
        IvfPq.write(corpus, "embedding", "vec_id", idxPath,
          nCells = 16, m = 8, k = 16, iters = 3, corpusRows = Some(nCorpus))
        val queries = emb.filter(col("vec_id") < 10)
        IvfPq.topK(s, idxPath, queries, "embedding", "vec_id", k = 10, nProbe = 4)
          .filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("query_id")
      },
      Some {
        val rows = (0L until 10L).map(q =>
          s"(CAST($q AS BIGINT), CAST(${q + 100000L} AS BIGINT), " +
            s"CAST(${EmbeddingsRowsSf001 + 10} AS BIGINT))").mkString(", ")
        s"""
        SELECT * FROM (VALUES $rows) v(query_id, neighbor_id, corpus_rows)
        ORDER BY query_id"""
      }),

    // ---- sparse lexical retrieval: fixed-point TF-IDF top-k -------------
    // Query docs = every doc_id % 100 == 3, query text = its first five
    // tokens. IDF is integer fixed-point, so scores are exact BIGINTs and
    // both engines agree bit-for-bit (a float log-IDF sum would not).
    QueryDef("tfidf_topk",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val queries = docs.filter(col("doc_id") % 100 === 3)
          .select(col("doc_id"),
            array_join(slice(graft.llm.Dedup.tokens(col("text")), 1, 5), " ")
              .as("qtext"))
        Retrieval.tfidfTopK(docs, "text", "doc_id",
            queries, "qtext", "doc_id", k = 10)
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
                   FROM documents),
        n AS (SELECT COUNT(*) nd, greatest(1, 1099511627776 // COUNT(*)) scale
              FROM documents),
        p AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) tf
              FROM (SELECT doc_id, unnest(w) term FROM d) GROUP BY 1, 2),
        idf AS (SELECT term,
                  CAST(((SELECT nd FROM n) * (SELECT scale FROM n)) // COUNT(*) AS BIGINT) idf
                FROM p GROUP BY term),
        q AS (SELECT doc_id q_id, unnest(list_distinct(list_slice(w, 1, 5))) term
              FROM d WHERE doc_id % 100 = 3),
        sc AS (SELECT q_id, p.doc_id,
                 CAST(SUM(least(least(tf, 100000) * idf, 17592186044416)) AS BIGINT) score
               FROM q JOIN p USING (term) JOIN idf USING (term) GROUP BY 1, 2),
        r AS (SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) rnk
              FROM sc)
        SELECT q_id AS query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score
        FROM r WHERE rnk <= 10
        ORDER BY query_id, rank""")),

    // ---- BPE tokenizer training -----------------------------------------
    // Trained on a bounded deterministic slice (doc_id < 50, 20 merges).
    // The oracle pins the merge table derived by tools/bpe_reference.py —
    // an INDEPENDENT Python implementation of Sennrich BPE (argmax per
    // round, freq-DESC/left/right tie-break, greedy non-overlapping
    // rewrite) — with a dict_words guard so a corpus change fails
    // self-explanatorily, same pattern as the ANN recall gates.
    QueryDef("bpe_merges",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.read(s, dir, "documents").filter(col("doc_id") < 50)
        val dictWords = docs
          .select(explode(Dedup.tokens(col("text"))).as("w"))
          .agg(countDistinct(col("w"))).head().getLong(0)
        bpeMerges(s, dir).toDF("rank", "left", "right", "freq")
          .withColumn("dict_words", lit(dictWords))
          .orderBy("rank")
      },
      Some("""
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), 'e', 'r', CAST(439 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(2 AS BIGINT), 's', 't', CAST(284 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(3 AS BIGINT), 'i', 'n', CAST(282 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(4 AS BIGINT), 'o', 'w', CAST(282 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(5 AS BIGINT), 'o', 'r', CAST(248 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(6 AS BIGINT), 'a', 'l', CAST(202 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(7 AS BIGINT), 'm', 'er', CAST(187 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(8 AS BIGINT), 'a', 't', CAST(167 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(9 AS BIGINT), 'a', 'r', CAST(152 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(10 AS BIGINT), 'p', 'ar', CAST(152 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(11 AS BIGINT), 'al', 'l', CAST(108 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(12 AS BIGINT), 'm', 'all', CAST(108 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(13 AS BIGINT), 's', 'mall', CAST(108 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(14 AS BIGINT), 'u', 'p', CAST(106 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(15 AS BIGINT), 'in', 'e', CAST(104 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(16 AS BIGINT), 'l', 'ine', CAST(104 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(17 AS BIGINT), 'g', 'r', CAST(102 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(18 AS BIGINT), 'gr', 'o', CAST(102 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(19 AS BIGINT), 'gro', 'up', CAST(102 AS BIGINT), CAST(31 AS BIGINT)),
          (CAST(20 AS BIGINT), 'a', 'n', CAST(99 AS BIGINT), CAST(31 AS BIGINT))
        ) v(rank, "left", "right", freq, dict_words)
        ORDER BY rank""")),

    // ---- BPE segmentation (the apply side) -------------------------------
    // Train on the same doc_id < 50 slice, then segment every distinct
    // token of doc_id < 5 through segmentUdf — the PRODUCTION path whose
    // plan size is constant in vocabulary size (the Column-fold variant is
    // spec-only). Oracle pinned vs tools/bpe_reference.py `segment`.
    QueryDef("bpe_segment",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val merges = bpeMerges(s, dir)
        docs.filter(col("doc_id") < 5)
          .select(explode(Dedup.tokens(col("text"))).as("token"))
          .distinct()
          .select(col("token"),
            array_join(Bpe.segmentUdf(merges)(col("token")), "|").as("pieces"))
          .orderBy("token")
      },
      Some(BpeSegmentOracle)),

    // ---- model-based quality scoring (classifier inference) -------------
    // Fixed-weight linear model over hashed bag-of-words: weights are the
    // exact-in-binary ramp ((i*37) mod 64 - 32)/64 (multiples of 1/64 —
    // sums are EXACT in both engines, so only the final sigmoid sees
    // libm noise, absorbed by the 6-decimal rounding contract).
    QueryDef("quality_model_score",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val wts = (0 until 64).map(i => ((i * 37) % 64 - 32) / 64.0)
        TextStats.modelQualityScore(docs, "text", "doc_id", wts, bias = 0.25)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> len(x) > 0) t
                   FROM documents),
        f AS (SELECT doc_id,
                CASE WHEN len(t) = 0 THEN 0.0
                     ELSE list_aggregate(list_transform(t, tok ->
                            (CAST(((CAST('0x'||substr(md5(tok),1,8) AS BIGINT) % 64) * 37) % 64 AS DOUBLE)
                              - 32) / 64.0), 'sum') / len(t)
                END mean
              FROM d)
        SELECT doc_id,
               round(1.0/(1.0 + exp(-(0.25 + mean))), 6) AS q_score,
               round(1.0/(1.0 + exp(-(0.25 + mean))), 6) >= 0.5 AS keep
        FROM f ORDER BY doc_id""")),

    // ---- HTML -> text extraction ----------------------------------------
    // Each document is wrapped in deterministic markup (script body with a
    // bare '<', style block, entities incl. the double-escape &amp;lt;)
    // and both engines run the byte-identical strip pipeline.
    QueryDef("html_to_text",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val html = concat(
          lit("<html><body><h1 class=\"t\">Title</h1><p>"), col("text"),
          lit("</p><script>if (x < 3) { alert('a&amp;b'); }</script>" +
            "<style>p { color: red; }</style>" +
            " &lt;tag&gt; &quot;q&#39;s&quot; &amp;lt; one&nbsp;two </body></html>"))
        docs.select(col("doc_id"), Curation.htmlToText(html).as("text_clean"))
          .orderBy("doc_id")
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
                 '<html><body><h1 class="t">Title</h1><p>' || text ||
                 '</p><script>if (x < 3) { alert(''a&amp;b''); }</script>' ||
                 '<style>p { color: red; }</style>' ||
                 ' &lt;tag&gt; &quot;q&#39;s&quot; &amp;lt; one&nbsp;two </body></html>' AS html
          FROM documents),
        stripped AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(html,
                   '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                   '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                   '(?s)<[^>]+>', ' ', 'g') AS s
          FROM h),
        decoded AS (
          SELECT doc_id,
                 replace(replace(replace(replace(replace(replace(s,
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS s
          FROM stripped)
        SELECT doc_id, trim(regexp_replace(s, '\s+', ' ', 'g')) AS text_clean
        FROM decoded
        ORDER BY doc_id""")),

    // ---- deterministic training-shard shuffle ---------------------------
    // Seeded md5 shuffle key, uniform shard hash, per-shard dense 0-based
    // positions — the oracle recomputes the identical permutation.
    QueryDef("shuffle_shards",
      (s, dir) =>
        Sampling.deterministicShuffle(
            Tables.read(s, dir, "documents").select("doc_id"),
            "doc_id", seed = 7L, nShards = 8)
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy("shard", "pos"),
      Some("""
        WITH k AS (
          SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
        s AS (
          SELECT doc_id, key,
                 CAST('0x' || substr(key, 1, 4) AS BIGINT) % 8 AS shard
          FROM k)
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1 AS pos
        FROM s
        ORDER BY shard, pos""")),

    // ---- JSONL ingestion: the crawl-dump source format -------------------
    // documents -> JSONL on disk -> schema-pinned streamable read; the
    // roundtrip must be byte-exact (JSON string escaping both ways).
    QueryDef("jsonl_source",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
        docs.coalesce(2).write.mode("overwrite").json(tmp)
        // schema pinned from the table contract, not re-inferred: at 100 TB
        // inference is a full extra pass and type drift is silent
        s.read.schema(docs.schema).json(tmp)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        ORDER BY doc_id""")),

    // ---- LM count table: corpus-wide trigram counts, top-100 ------------
    QueryDef("ngram_counts",
      (s, dir) =>
        TextStats.ngramCounts(Tables.read(s, dir, "documents"), "text", n = 3)
          .orderBy(desc("n"), col("gram"))
          .limit(100),
      Some("""
        WITH d AS (SELECT list_filter(string_split(lower(text), ' '),
                     x -> len(x) > 0) w
                   FROM documents),
        g AS (SELECT array_to_string(list_slice(w, CAST(r.i AS INT),
                       CAST(r.i AS INT) + 2), ' ') gram
              FROM d, unnest(range(1, len(w) - 1)) r(i))
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
        FROM g GROUP BY 1
        ORDER BY n DESC, gram
        LIMIT 100""")),

    // ---- token-budget sampling: ~10k tokens, 8 hash shards ---------------
    // Both engines derive the identical seeded key, shard, running token
    // total, and cut — the "give me N tokens of corpus" sizing primitive.
    QueryDef("token_budget_sample",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.wsTokenCount(col("text")).cast("long").as("n_tokens"))
        Sampling.tokenBudgetSample(docs, "doc_id", "n_tokens",
            budget = 10000L, nShards = 8, seed = 9L)
          .select(col("doc_id"), col("shard"), col("cum_tokens"))
          .orderBy("shard", "cum_tokens")
      },
      Some("""
        WITH t AS (SELECT doc_id,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                       x -> len(x) > 0)) AS BIGINT) n_tokens,
                     md5('9:' || CAST(doc_id AS VARCHAR)) skey
                   FROM documents),
        s AS (SELECT doc_id, n_tokens, skey,
                     CAST('0x' || substr(skey, 1, 4) AS BIGINT) % 8 AS shard
              FROM t),
        c AS (SELECT doc_id, shard,
                     SUM(n_tokens) OVER (PARTITION BY shard ORDER BY skey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_tokens
              FROM s)
        SELECT doc_id, shard, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens <= 1250
        ORDER BY shard, cum_tokens""")),

    // ---- corpus mixing: per-source weights, deterministic copies --------
    // en upsampled 2.5x, de halved, everything else kept — both engines
    // derive the identical per-doc copy count from the md5 bucket.
    QueryDef("corpus_mix",
      (s, dir) =>
        Sampling.weightedMix(
            Tables.read(s, dir, "documents").select("doc_id", "lang"),
            "doc_id", "lang", Map("en" -> 2.5, "de" -> 0.5))
          .select(col("doc_id"), col("lang"), col("epoch"))
          .orderBy("doc_id", "epoch"),
      Some("""
        WITH w AS (
          SELECT doc_id, lang,
                 CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 0.5 ELSE 1.0 END wt,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 4) AS BIGINT) % 100 h
          FROM documents),
        c AS (
          SELECT doc_id, lang,
                 CAST(floor(wt) AS BIGINT) +
                   (CASE WHEN h < CAST(round((wt - floor(wt)) * 100) AS BIGINT)
                         THEN 1 ELSE 0 END) n
          FROM w)
        SELECT doc_id, lang, CAST(r.i AS BIGINT) AS epoch
        FROM c, unnest(range(1, n + 1)) r(i)
        WHERE n > 0
        ORDER BY doc_id, epoch""")),

    // ---- text analysis -------------------------------------------------
    QueryDef("text_stats",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        TextStats.qualityMetrics(docs, "text", "doc_id")
          .join(docs.select(col("doc_id"),
            TextStats.regexTokenCount(col("text")).cast("long").as("n_subtokens")), "doc_id")
          .orderBy("doc_id")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split(lower(text), ' '), x -> len(x) > 0) toks,
                 CAST(len(text) AS DOUBLE) n_chars,
                 CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) n_punct
          FROM documents),
        m AS (
          SELECT doc_id,
                 n_chars,
                 CAST(len(toks) AS DOUBLE) n_tok,
                 CAST(len(list_filter(toks, x ->
                   list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) n_stop,
                 n_punct,
                 CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) n_subtokens
          FROM t)
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stopword_ratio,
               CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
               0.4 * (least(n_chars, 500.0) / 500.0)
                 + 0.3 * (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END)
                 + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
                 AS quality_score,
               n_subtokens
        FROM m
        ORDER BY doc_id""")),

    QueryDef("text_langid",
      (s, dir) =>
        Tables.read(s, dir, "documents")
          .select(col("doc_id"), TextStats.langId(col("text")).as("predicted_lang"))
          .orderBy("doc_id"),
      Some {
        val scoreExprs = TextStats.LangProfiles.map { case (lang, markers) =>
          val lst = markers.map(m => s"'$m'").mkString("[", ",", "]")
          s"CAST(len(list_filter(toks, x -> list_contains($lst, x))) AS BIGINT) s_$lang"
        }.mkString(",\n                 ")
        val langs = TextStats.LangProfiles.map(_._1)
        val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val caseChain = langs.map(l => s"WHEN s_$l = $mx THEN '$l'").mkString("\n               ")
        s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> len(x) > 0) toks
          FROM documents),
        sc AS (
          SELECT doc_id,
                 $scoreExprs
          FROM t)
        SELECT doc_id,
               CASE $caseChain
               END AS predicted_lang
        FROM sc
        ORDER BY doc_id"""
      }),

    // n-gram language ID: every document trigram scored against the
    // per-language rank-weight profiles; the oracle recomputes the same
    // profiles (rendered as literal lists) and the same weighted argmax.
    QueryDef("text_langid_ngram",
      (s, dir) =>
        Tables.read(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.langIdNgram(col("text")).as("predicted_lang"))
          .orderBy("doc_id"),
      Some {
        val profs = TextStats.NgramProfiles
        val scoreExprs = profs.map { case (lang, prof) =>
          val tl = prof.map(_._1.replace("'", "''")).map(t => s"'$t'")
            .mkString("[", ", ", "]")
          val wl = prof.map(_._2).mkString("[", ", ", "]")
          s"coalesce(list_sum(list_transform(tris, t -> " +
            s"coalesce(($wl)[list_position($tl, t)], 0))), 0) s_$lang"
        }.mkString(",\n                 ")
        val langs = profs.map(_._1)
        val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val caseChain = langs.map(l => s"WHEN s_$l = $mx THEN '$l'").mkString("\n               ")
        s"""
        WITH norm AS (
          SELECT doc_id,
                 ' ' || trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')) || ' ' AS s
          FROM documents),
        tri AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(s) - 1, 2)),
                   i -> substr(s, CAST(i AS INT), 3)) AS tris
          FROM norm),
        sc AS (
          SELECT doc_id,
                 $scoreExprs
          FROM tri)
        SELECT doc_id,
               CASE $caseChain
               END AS predicted_lang
        FROM sc
        ORDER BY doc_id"""
      }),

    QueryDef("text_fingerprint",
      (s, dir) =>
        Tables.read(s, dir, "documents")
          .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fingerprint"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               list_min(list_transform(
                 range(1, greatest(len(lower(text)) - 7, 1) + 1),
                 i -> CAST('0x'||substr(md5(substr(lower(text), CAST(i AS INT), 8)),1,8)
                      AS BIGINT))) AS fingerprint
        FROM documents
        ORDER BY doc_id""")),

    // ---- multimodal: binary payload + partition-parallel stub decode ---
    QueryDef("mm_decode",
      (s, dir) => {
        implicit val sp = s
        Multimodal.decode(Multimodal.mediaTable(Tables.read(s, dir, "documents")))
          .toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH b AS (
          SELECT doc_id, strlen(text) n,
                 list_transform(range(1, len(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))) codes
          FROM documents)
        SELECT doc_id,
               CAST(1 + (n % 64) AS INT) AS width,
               CAST((n + (1 + (n % 64)) - 1) // (1 + (n % 64)) AS INT) AS height,
               CAST(n AS BIGINT) AS n_bytes,
               CAST(list_sum(codes) AS DOUBLE) / n AS mean_byte
        FROM b
        ORDER BY doc_id""")),

    // ---- multimodal: REAL ImageIO decode, oracled from the pixel formula
    // Ten grayscale PNGs are generated with pixel(x,y) = (7x+13y+31i)%256;
    // the gate round-trips them through encode → distributed ImageIO decode
    // and the oracle recomputes width/height/mean from the same closed-form
    // formula in SQL — independent of any PNG encoder detail, so a stub
    // (byte-stats) decode cannot pass it.
    QueryDef("mm_decode_image",
      (s, dir) => {
        implicit val sp = s
        import java.awt.image.BufferedImage
        javax.imageio.ImageIO.setUseCache(false)
        val rows = (0 until 10).map { i =>
          val w = 4 + i
          val h = 3 + i
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          for (x <- 0 until w; y <- 0 until h)
            raster.setSample(x, y, 0, (7 * x + 13 * y + 31 * i) % 256)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (i.toLong, bos.toByteArray)
        }
        import s.implicits._
        Multimodal.decode(rows.toDF("doc_id", "media"))
          .toDF()
          .select(col("doc_id"), col("width"), col("height"), col("mean_byte"))
          .orderBy("doc_id")
      },
      Some("""
        WITH imgs AS (SELECT unnest(range(0, 10)) i),
        xs AS (SELECT unnest(range(0, 13)) x),
        ys AS (SELECT unnest(range(0, 12)) y),
        px AS (
          SELECT i, (7*x + 13*y + 31*i) % 256 AS p
          FROM imgs, xs, ys
          WHERE x < 4 + i AND y < 3 + i)
        SELECT i AS doc_id,
               CAST(4 + i AS INT) AS width,
               CAST(3 + i AS INT) AS height,
               CAST(sum(p) AS DOUBLE) / count(*) AS mean_byte
        FROM px GROUP BY i
        ORDER BY doc_id""")),

    // ---- multimodal: nearest-neighbor resize over the stub byte grid ---
    QueryDef("mm_resize",
      (s, dir) => {
        implicit val sp = s
        Multimodal.resize(Multimodal.mediaTable(Tables.read(s, dir, "documents")))
          .toDF()
          .orderBy("doc_id")
      },
      Some("""
        WITH b AS (
          SELECT doc_id, text, strlen(text) n,
                 1 + (strlen(text) % 64) w,
                 (strlen(text) + (1 + (strlen(text) % 64)) - 1)
                   // (1 + (strlen(text) % 64)) h
          FROM documents),
        px AS (
          SELECT doc_id,
                 list_sum(flatten(list_transform(range(0, 8), r ->
                   list_transform(range(0, 8), c ->
                     CASE WHEN (CAST(r*h//8 AS BIGINT)*w + CAST(c*w//8 AS BIGINT)) < n
                          THEN ascii(substr(text,
                            CAST(CAST(r*h//8 AS BIGINT)*w + CAST(c*w//8 AS BIGINT) + 1 AS INT), 1))
                          ELSE 0 END)))) s
          FROM b)
        SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
               CAST(s AS DOUBLE) / 64 AS mean_byte
        FROM px
        ORDER BY doc_id""")),

    // ---- multimodal: per-document byte-histogram feature extraction ----
    QueryDef("mm_feature_extract",
      (s, dir) => {
        implicit val sp = s
        Multimodal.featureExtract(Multimodal.mediaTable(Tables.read(s, dir, "documents")))
          .orderBy("doc_id")
      },
      Some {
        val binCols = (0 until 8).map(k =>
          s"CAST(len(list_filter(codes, x -> x // 32 = $k)) AS BIGINT) AS b$k")
          .mkString(",\n               ")
        s"""
        WITH b AS (
          SELECT doc_id,
                 list_transform(range(1, strlen(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INT), 1))) codes
          FROM documents)
        SELECT doc_id,
               $binCols
        FROM b
        ORDER BY doc_id"""
      }),

    // ---- streaming: AvailableNow incremental append through the gate ---
    // Runs the REAL Structured Streaming query (checkpointed file source →
    // parquet sink) twice; the second run must be a no-op, so the oracle
    // equals exactly one copy of the source.
    QueryDef("stream_incremental_append",
      (s, dir) => {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val src = Files.createTempDirectory("graft_stream_src_")
        Files.copy(Paths.get(s"$dir/events.parquet"),
          src.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
        val tgt = Files.createTempDirectory("graft_stream_tgt_").toString
        val ckpt = Files.createTempDirectory("graft_stream_ck_").toString
        val schema = s.read.parquet(src.toString).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.withStatePartitions(s) {
            val q = graft.streaming.StreamingIncremental.incrementalAppend(
              s, src.toString, schema, tgt, ckpt,
              df => df.select(col("event_id"),
                Tables.eventTs(schema).as("ts"),
                col("event_type"), col("value")))
            q.awaitTermination()
          }
        runOnce()
        runOnce() // checkpointed: must append nothing
        s.read.parquet(tgt)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_type"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, epoch_us(ts) AS ts_us, event_type
        FROM events
        ORDER BY event_id""")),

    // Stream-stream event-time interval join (attribution): clicks joined
    // to the same user's purchases within 4 hours, both sides watermarked
    // streams (a self-join of one file-source stream — the log-topology
    // case). INNER join on a bounded source = exactly the batch join's
    // rows; the checkpointed re-run must append nothing.
    QueryDef("stream_interval_join",
      (s, dir) => {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val src = Files.createTempDirectory("graft_ssj_src_")
        Files.copy(Paths.get(s"$dir/events.parquet"),
          src.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
        val tgt = Files.createTempDirectory("graft_ssj_tgt_").toString
        val ckpt = Files.createTempDirectory("graft_ssj_ck_").toString
        val schema = s.read.parquet(src.toString).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.withStatePartitions(s) {
            val ev = s.readStream.schema(schema).parquet(src.toString)
              .select(col("event_id"), Tables.eventTs(schema).as("ts"),
                col("user_id"), col("event_type"), col("value"))
            val joined = graft.streaming.StreamingIncremental
              .streamStreamIntervalJoin(ev, "ts", "user_id", "event_type",
                "click", "purchase", window = "4 hours")
            val q = joined.select(col("left_id").as("click_id"),
                col("right_id").as("purchase_id"),
                unix_micros(col("left_ts")).as("click_us"),
                unix_micros(col("right_ts")).as("purchase_us"), col("value"))
              .writeStream.format("parquet")
              .option("path", tgt).option("checkpointLocation", ckpt)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
        runOnce()
        runOnce() // checkpointed: must append nothing
        s.read.parquet(tgt).orderBy("click_id", "purchase_id")
      },
      Some("""
        WITH c AS (SELECT event_id click_id, ts cts, user_id FROM events
                   WHERE event_type = 'click'),
        p AS (SELECT event_id purchase_id, ts pts, user_id, value FROM events
              WHERE event_type = 'purchase')
        SELECT click_id, purchase_id, epoch_us(cts) AS click_us,
               epoch_us(pts) AS purchase_us, value
        FROM c JOIN p USING (user_id)
        WHERE pts >= cts AND pts <= cts + INTERVAL 4 HOUR
        ORDER BY click_id, purchase_id""")),

    // Streaming merge-upsert: the incremental_partition_merge driven by a
    // stream. Target pre-seeded with even event_ids carrying value=-99
    // (update path); odd ids arrive only via the stream (insert path);
    // maxFilesPerTrigger=1 forces two separate micro-batch merges; the
    // checkpointed re-run must change nothing.
    QueryDef("stream_merge_upsert",
      (s, dir) => {
        import java.nio.file.Files
        import graft.materialize.{MergeConfig, MergeIntoPartitioned}
        val wh = new graft.warehouse.Warehouse(
          Files.createTempDirectory("graft_smu_wh_").toString, s)
        val tgt = graft.core.TableId("proj", "stream", "upserted")
        val cfg = MergeConfig(partitionField = "ts", uniqueKey = Seq("event_id"))
        val evRaw = s.read.parquet(s"$dir/events.parquet")
        val ev = evRaw
          .select(col("event_id"),
            Tables.eventTs(evRaw.schema).as("ts"),
            col("event_type"), col("value"))
        val srcDir = Files.createTempDirectory("graft_smu_src_").toString
        ev.filter(col("event_id") % 2 === 1).coalesce(1)
          .write.mode("append").parquet(srcDir)
        ev.filter(col("event_id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(srcDir)
        new MergeIntoPartitioned(wh, s).run(
          ev.filter(col("event_id") % 2 === 0)
            .withColumn("value", lit(-99.0)), tgt, cfg)
        val ckpt = Files.createTempDirectory("graft_smu_ck_").toString
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.withStatePartitions(s) {
            graft.streaming.StreamingIncremental.streamingMergeUpsert(
              s, srcDir, ev.schema, wh, tgt, cfg, ckpt,
              maxFilesPerTrigger = Some(1)).awaitTermination()
          }
        runOnce()
        runOnce() // checkpointed: no new files, no merge effect
        wh.read(tgt)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_type"), col("value"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
        FROM events
        ORDER BY event_id""")),

    // Stateful streaming dedup through the gate: documents + planted dups
    // streamed through flatMapGroupsWithState; survivors = min id per text.
    QueryDef("stream_stateful_dedup",
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{OutputMode, Trigger}
        val srcDir = Files.createTempDirectory("graft_sdd_src_").toString
        val outDir = Files.createTempDirectory("graft_sdd_out_").toString
        val ckpt = Files.createTempDirectory("graft_sdd_ck_").toString
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        docs.unionByName(
          docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
            .withColumn("doc_id", col("doc_id") + 100000L))
          .write.mode("append").parquet(srcDir)
        val schema = s.read.parquet(srcDir).schema
        import s.implicits._
        graft.streaming.StreamingIncremental.withStatePartitions(s) {
          val in = s.readStream.schema(schema).parquet(srcDir)
            .select(md5(col("text")).as("hash"), col("doc_id"), col("text"))
            .as[graft.streaming.StreamingIncremental.DocIn]
          val q = graft.streaming.StreamingIncremental.streamingExactDedup(in)
            .writeStream.format("parquet")
            .option("path", outDir).option("checkpointLocation", ckpt)
            .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        s.read.parquet(outDir).select("doc_id").orderBy("doc_id")
      },
      Some("""
        WITH all_docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0)
        SELECT min(doc_id) AS doc_id FROM all_docs GROUP BY md5(text)
        ORDER BY doc_id""")),

    QueryDef("mm_frame_sample",
      (s, dir) => {
        implicit val sp = s
        Multimodal.frameSample(Multimodal.mediaTable(Tables.read(s, dir, "documents")))
          .toDF("doc_id", "frame_idx", "mean_byte")
          .orderBy("doc_id", "frame_idx")
      },
      Some("""
        WITH b AS (SELECT doc_id, text, strlen(text) n FROM documents),
        f AS (
          SELECT b.doc_id, CAST(r.o AS INT) frame_off, b.text
          FROM b, (SELECT unnest(range(0, 100000, 64)) o) r
          WHERE r.o < greatest(n - 16, 0)),
        m AS (
          SELECT doc_id, frame_off // 64 AS frame_idx,
                 CAST(list_sum(list_transform(range(1, 17),
                   i -> ascii(substr(text, frame_off + CAST(i AS INT), 1)))) AS DOUBLE) / 16 AS mean_byte
          FROM f)
        SELECT doc_id, frame_idx, mean_byte FROM m
        ORDER BY doc_id, frame_idx"""))
  )
}
