package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 gate queries: asymmetric containment dedup, content-defined
  * chunking, dbt source freshness, exact fixed-point group centroids,
  * and temperature-scaled corpus mixing. */
object QueriesR9 {

  /** Boilerplate footer appended to the planted "expanded" documents in
    * the containment gate — long enough that the REVERSE containment
    * (expanded → original) stays well under the 0.9 threshold on every
    * corpus document. */
  private[graft] val Footer =
    " repeated footer boilerplate sentence about terms of service and" +
      " rights reserved for syndication of this article"

  /** `dbt source freshness` tick: 2024-02-05 00:00:00 UTC, a few days
    * after the events table's newest row — fixed so the run is
    * reproducible (a scheduler supplies this in production). */
  private val AsOfUs = 1707091200000000L

  val all: Seq[QueryDef] = Seq(

    // ---- asymmetric containment dedup ----------------------------------
    // Plants: 8 "expanded" copies (original text + boilerplate footer).
    // Containment(original -> expanded) = 1.0; the reverse direction and
    // plain Jaccard stay below threshold — the signal this operator adds
    // over dedup_ngram_jaccard.
    QueryDef("dedup_containment",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        val planted = docs.filter(col("doc_id") < 8)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(Footer)).as("text"))
        graft.llm.Dedup.containmentPairs(
            docs.unionByName(planted), "text", "doc_id", threshold = 0.9)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 300000, text || '$Footer' FROM documents
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
        ORDER BY id_a, id_b""")),

    // ---- content-defined chunking --------------------------------------
    // Chunk rows for the whole corpus: rolling Karp-Rabin boundaries
    // (window 4, base 131, divisor 64), final chunk closes at text end.
    // The arithmetic is unrolled exact-BIGINT on both engines.
    QueryDef("cdc_chunks",
      (s, dir) =>
        graft.llm.Curation.cdcChunks(
            Tables.read(s, dir, "documents"), "text", "doc_id")
          .select("doc_id", "chunk_idx", "chunk_hash")
          .orderBy("doc_id", "chunk_idx"),
      Some(CdcChunkCte + """
        SELECT doc_id, CAST(k AS BIGINT) chunk_idx, h chunk_hash
        FROM ch
        ORDER BY doc_id, chunk_idx""")),

    // ---- chunk-store dedup accounting ----------------------------------
    // What chunk-level dedup buys on this corpus: distinct vs total
    // chunks and bytes (the near-dup documents planted by the generator
    // share every chunk outside their edit neighborhoods).
    QueryDef("cdc_dedup_stats",
      (s, dir) => {
        // ONE pass over the chunking subtree (PLANS.md rule 7): per-hash
        // stats in a single groupBy, then a tiny final aggregate derives
        // all four metrics — the corpus is chunked exactly once.
        val ch = graft.llm.Curation.cdcChunks(
          Tables.read(s, dir, "documents"), "text", "doc_id")
        ch.groupBy("chunk_hash")
          .agg(count(lit(1)).as("n"),
            sum(length(col("chunk"))).as("chars"),
            max(length(col("chunk"))).as("maxlen"))
          .agg(sum(col("n")).cast("long").as("total_chunks"),
            count(lit(1)).cast("long").as("distinct_chunks"),
            sum(col("chars")).cast("long").as("total_chars"),
            sum(col("maxlen")).cast("long").as("distinct_chars"))
      },
      Some(CdcChunkCte + """
        SELECT CAST(COUNT(*) AS BIGINT) total_chunks,
               CAST(COUNT(DISTINCT h) AS BIGINT) distinct_chunks,
               CAST(SUM(len(c)) AS BIGINT) total_chars,
               CAST((SELECT SUM(l) FROM
                      (SELECT max(len(c)) l FROM ch GROUP BY h)) AS BIGINT)
                 distinct_chars
        FROM ch""")),

    // ---- content-addressed chunk store round trip ----------------------
    // Write half the corpus, APPEND the other half (the anti-join path
    // that stores only never-seen chunks), reconstruct everything — the
    // oracle is the source table itself: byte-exact round trip through
    // deduplicated storage.
    QueryDef("chunkstore_roundtrip",
      (s, dir) => {
        import graft.llm.ChunkStore
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        val root = java.nio.file.Files
          .createTempDirectory("graft_chunkstore_").toString
        ChunkStore.write(docs.filter(col("doc_id") % 2 === 0),
          "text", "doc_id", root, nBuckets = 16)
        ChunkStore.append(docs.filter(col("doc_id") % 2 === 1),
          "text", "doc_id", root, nBuckets = 16)
        ChunkStore.reconstruct(s, root).orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text FROM documents
        WHERE len(text) > 0
        ORDER BY doc_id""")),

    // ---- streaming chunk-store ingest ----------------------------------
    // Two micro-batches through foreachBatch ChunkStore.append (store
    // seeded empty), checkpointed re-run is a no-op; reconstruction must
    // equal the one-shot store — batching cannot change content-defined
    // storage. Same oracle as chunkstore_roundtrip.
    QueryDef("stream_chunkstore",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.ChunkStore
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        val srcDir = Files.createTempDirectory("graft_sck_src_").toString
        docs.filter(col("doc_id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(srcDir)
        docs.filter(col("doc_id") % 2 === 1).coalesce(1)
          .write.mode("append").parquet(srcDir)
        val root = Files.createTempDirectory("graft_sck_store_").toString
        val ckpt = Files.createTempDirectory("graft_sck_ck_").toString
        ChunkStore.write(docs.filter(lit(false)), "text", "doc_id", root,
          nBuckets = 16) // empty seed
        val schema = s.read.parquet(srcDir).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.streamingChunkIngest(
            s, srcDir, schema, root, ckpt, "text", "doc_id",
            nBuckets = 16, maxFilesPerTrigger = Some(1)).awaitTermination()
        runOnce()
        runOnce() // checkpointed: no new batches, no new chunks
        ChunkStore.reconstruct(s, root).orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text FROM documents
        WHERE len(text) > 0
        ORDER BY doc_id""")),

    // ---- dbt source freshness ------------------------------------------
    // Three sources with per-source thresholds chosen to exercise all
    // three statuses on this data: events loaded days before the tick
    // (pass), orders years stale but inside its wide error window
    // (warn), lineitem far past its tight error window (error).
    QueryDef("source_freshness",
      (s, dir) => {
        import graft.operators.DataQuality.{freshness, FreshnessSource}
        freshness(Seq(
          FreshnessSource("events", Tables.events(s, dir), "ts",
            warnAfterSec = 604800L, errorAfterSec = 2592000L),
          FreshnessSource("orders", Tables.read(s, dir, "orders"),
            "o_orderdate",
            warnAfterSec = 315360000L, errorAfterSec = 788400000L),
          FreshnessSource("lineitem", Tables.read(s, dir, "lineitem"),
            "l_shipdate",
            warnAfterSec = 31536000L, errorAfterSec = 315360000L)),
          asOfUs = AsOfUs)
      },
      Some(s"""
        WITH s AS (
          SELECT 'events' source_name, epoch_us(max(ts)) mx,
                 604800000000 w, 2592000000000 e FROM events
          UNION ALL
          SELECT 'lineitem', epoch_us(max(l_shipdate)),
                 31536000000000, 315360000000000 FROM lineitem
          UNION ALL
          SELECT 'orders', epoch_us(max(o_orderdate)),
                 315360000000000, 788400000000000 FROM orders)
        SELECT source_name, mx max_loaded_us, $AsOfUs - mx age_us,
               CASE WHEN mx IS NULL THEN 'error'
                    WHEN $AsOfUs - mx > e THEN 'error'
                    WHEN $AsOfUs - mx > w THEN 'warn'
                    ELSE 'pass' END status
        FROM s ORDER BY source_name""")),

    // ---- dbt unit tests ------------------------------------------------
    // Fixture-driven logic tests against library operators, incl. a
    // PLANTED failing case so the nonzero missing/unexpected paths are
    // certified, not just the all-green diagonal.
    QueryDef("unit_test_report",
      (s, dir) => {
        import graft.operators.UnitTest
        import s.implicits._
        val dedupCase = UnitTest.Case(
          "exact_dedup_min_survivor",
          m => graft.llm.Dedup.exact(m("docs"), "text", "doc_id")
            .select("doc_id", "n_copies"),
          Map("docs" -> Seq((1L, "same text"), (2L, "same text"),
            (3L, "other text")).toDF("doc_id", "text")),
          Seq((1L, 2L), (3L, 1L)).toDF("doc_id", "n_copies"))
        val centroidCase = UnitTest.Case(
          "centroid_fixed_point",
          m => graft.llm.Similarity.groupCentroids(m("emb"), "vec", "g"),
          Map("emb" -> Seq(("g1", Seq(2.0f, 4.0f)), ("g1", Seq(4.0f, 8.0f)))
            .toDF("g", "vec")),
          Seq(("g1", 0L, 3000000L, 2L), ("g1", 1L, 6000000L, 2L))
            .toDF("g", "pos", "mean_scaled", "n"))
        val failCase = UnitTest.Case(
          "planted_failure_demo",
          m => m("t").select((col("x") * 2).as("y")),
          Map("t" -> Seq(1, 2).toDF("x")),
          Seq(2, 5).toDF("y"))
        UnitTest.report(Seq(dedupCase, centroidCase, failCase))
      },
      Some("""
        SELECT * FROM (VALUES
          ('centroid_fixed_point', TRUE, CAST(0 AS BIGINT), CAST(0 AS BIGINT), ''),
          ('exact_dedup_min_survivor', TRUE, CAST(0 AS BIGINT), CAST(0 AS BIGINT), ''),
          ('planted_failure_demo', FALSE, CAST(1 AS BIGINT), CAST(1 AS BIGINT), '')
        ) v(test_name, pass, missing_rows, unexpected_rows, error)
        ORDER BY test_name""")),

    // ---- exact fixed-point group centroids -----------------------------
    // Mean embedding per label in 10^6 fixed point: order-independent
    // exact integer sums (float aggregation could never hash-match), and
    // `div` / `//` agree on truncation toward zero for negative sums.
    QueryDef("domain_centroid",
      (s, dir) =>
        graft.llm.Similarity.groupCentroids(
            Tables.read(s, dir, "embeddings"), "embedding", "label")
          .orderBy("label", "pos"),
      Some("""
        SELECT label, CAST(i - 1 AS BIGINT) pos,
               CAST(SUM(CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                      * 1000000) AS BIGINT)) AS BIGINT)
                 // CAST(COUNT(*) AS BIGINT) mean_scaled,
               CAST(COUNT(*) AS BIGINT) n
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        GROUP BY label, i
        ORDER BY label, pos""")),

    // ---- deterministic in-shard negative sampling ----------------------
    // Contrastive-training pairing: k=2 negatives per doc from its own
    // hash shard, pure function of (seed, id, j) — full relational
    // oracle replays the rank arithmetic.
    QueryDef("negative_sample",
      (s, dir) =>
        graft.llm.Sampling.negativeSample(
            Tables.read(s, dir, "documents").select("doc_id"),
            "doc_id", k = 2, nShards = 8, seed = 23L)
          .orderBy("doc_id", "j"),
      Some("""
        WITH r AS (SELECT doc_id, md5('23:' || CAST(doc_id AS VARCHAR)) kk
                   FROM documents),
        rk AS (SELECT doc_id,
                 CAST('0x' || substr(kk, 1, 4) AS BIGINT) % 8 shard,
                 row_number() OVER (
                   PARTITION BY CAST('0x' || substr(kk, 1, 4) AS BIGINT) % 8
                   ORDER BY kk, doc_id) - 1 r,
                 COUNT(*) OVER (
                   PARTITION BY CAST('0x' || substr(kk, 1, 4) AS BIGINT) % 8) m
               FROM r),
        w AS (SELECT doc_id, shard, r, m, j,
                CAST('0x' || substr(md5('23:' || CAST(doc_id AS VARCHAR)
                  || ':' || CAST(j AS VARCHAR)), 1, 4) AS BIGINT) % 65536 h
              FROM rk, unnest(range(1, 3)) AS t(j)
              WHERE m > 1),
        n AS (SELECT doc_id, j, shard,
                (r + 1 + (h % (m - 1))) % m nr FROM w)
        SELECT n.doc_id AS doc_id, CAST(n.j AS BIGINT) j, rk2.doc_id neg_id
        FROM n JOIN rk rk2 ON rk2.shard = n.shard AND rk2.r = n.nr
        ORDER BY 1, 2""")),

    // ---- hard-negative mining ------------------------------------------
    // Planted EXACT duplicates (vec_id+100000) must be excluded (cosine
    // rounds to 1.0 >= 0.999); the output is the nearest NON-duplicate
    // neighbors — the pairs that move a contrastive loss.
    QueryDef("hard_negatives",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings").select("vec_id", "embedding")
        val planted = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        graft.llm.Similarity.hardNegatives(
            emb.unionByName(planted), emb.filter(col("vec_id") < 10),
            "embedding", "vec_id", k = 5, dupThreshold = 0.999)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH c AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
          FROM embeddings WHERE vec_id < 10),
        q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) embedding
              FROM embeddings WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id query_id, c.vec_id neighbor_id,
                 round(list_cosine_similarity(q.embedding, c.embedding), 6) c
          FROM q JOIN c ON q.vec_id <> c.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY c DESC, neighbor_id) rank
          FROM scored WHERE c < 0.999)
        SELECT query_id, rank, neighbor_id
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---- temperature-scaled corpus mixing ------------------------------
    // tau = 2 rebalancing: per-source targets proportional to
    // floor(sqrt(n_d)), exact integer arithmetic end-to-end, per-source
    // pick by seeded md5 order.
    QueryDef("mix_temperature",
      (s, dir) =>
        graft.llm.Sampling.temperatureMix(
            Tables.read(s, dir, "documents").select("doc_id", "source"),
            "doc_id", "source", budget = 300L, seed = 17L)
          .orderBy("doc_id"),
      Some("""
        WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) n
                   FROM documents GROUP BY source),
        w AS (SELECT source,
                CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) w FROM c),
        t AS (SELECT source,
                (w * 300) // (SELECT CAST(SUM(w) AS BIGINT) FROM w) target
              FROM w),
        r AS (SELECT d.doc_id, d.source,
                row_number() OVER (PARTITION BY d.source
                  ORDER BY md5('17:' || CAST(d.doc_id AS VARCHAR)), d.doc_id) rk
              FROM documents d)
        SELECT r.doc_id, r.source
        FROM r JOIN t USING (source)
        WHERE rk <= target
        ORDER BY doc_id""")),

    // ---- contamination as an overlap FRACTION --------------------------
    // Same blocklist as the decontaminate gates (doc_id % 20 == 0), but
    // scored GPT-3-appendix-C style: per-mille of each doc's distinct
    // 3-grams that hit the blocklist, not a raw hit count.
    QueryDef("contamination_score",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        graft.llm.Curation.contaminationScore(docs,
            docs.filter(pmod(col("doc_id"), lit(20L)) === 0),
            "text", "doc_id", shingleN = 3, flagPermille = 100L)
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
        tot AS (SELECT doc_id, CAST(len(h) AS BIGINT) n_grams FROM hs),
        e AS (SELECT doc_id, unnest(h) AS h FROM hs),
        bl AS (SELECT DISTINCT h FROM e WHERE doc_id % 20 = 0),
        hits AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) n
                 FROM e JOIN bl USING (h) GROUP BY e.doc_id)
        SELECT tot.doc_id, tot.n_grams,
               COALESCE(hits.n, 0) AS n_contaminated,
               CAST(CASE WHEN tot.n_grams > 0
                    THEN (COALESCE(hits.n, 0) * 1000) // tot.n_grams
                    ELSE 0 END AS BIGINT) AS overlap_permille,
               CAST(CASE WHEN tot.n_grams > 0
                    THEN (COALESCE(hits.n, 0) * 1000) // tot.n_grams
                    ELSE 0 END AS BIGINT) >= 100 AS flagged
        FROM tot LEFT JOIN hits USING (doc_id)
        ORDER BY doc_id""")),

    // ---- corpus-level gram-vocabulary overlap --------------------------
    // A = even doc_ids, B = odd: one-row report of shared 3-gram
    // vocabulary (the "is snapshot N+1 a re-crawl of snapshot N" stat).
    QueryDef("corpus_overlap",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        graft.llm.Dedup.corpusGramOverlap(
            docs.filter(pmod(col("doc_id"), lit(2L)) === 0),
            docs.filter(pmod(col("doc_id"), lit(2L)) === 1),
            "text", "doc_id", shingleN = 3)
          .orderBy("n_grams_a")
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
        fl AS (SELECT h,
                 MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) ia,
                 MAX(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) ib
               FROM e GROUP BY h),
        agg AS (SELECT CAST(SUM(ia) AS BIGINT) n_grams_a,
                       CAST(SUM(ib) AS BIGINT) n_grams_b,
                       CAST(SUM(ia * ib) AS BIGINT) n_common FROM fl)
        SELECT n_grams_a, n_grams_b, n_common,
               CAST(CASE WHEN n_grams_a + n_grams_b - n_common > 0
                    THEN (n_common * 1000) // (n_grams_a + n_grams_b - n_common)
                    ELSE 0 END AS BIGINT) AS jaccard_permille,
               CAST(CASE WHEN n_grams_a > 0
                    THEN (n_common * 1000) // n_grams_a
                    ELSE 0 END AS BIGINT) AS contain_a_permille,
               CAST(CASE WHEN n_grams_b > 0
                    THEN (n_common * 1000) // n_grams_b
                    ELSE 0 END AS BIGINT) AS contain_b_permille
        FROM agg
        ORDER BY n_grams_a""")),

    // ---- relational surface: pivot / unpivot ---------------------------
    // Wide pivot with an explicit value list (never collect-distinct the
    // pivot column at scale) and two aggregates per cell; lowercase
    // aliases because DuckDB lowercases unquoted identifiers.
    QueryDef("pivot_wide",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        def z(c: String) = coalesce(col(c), lit(0L))
        Tables.read(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"),
            Queries.scaledLong(
              sum(col("o_totalprice").cast(DecimalType(30, 10)))).as("rev"))
          .select(col("o_orderpriority"),
            z("F_n").as("f_n"), z("F_rev").as("f_rev"),
            z("O_n").as("o_n"), z("O_rev").as("o_rev"),
            z("P_n").as("p_n"), z("P_rev").as("p_rev"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
               COALESCE(CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,10))) FILTER (WHERE o_orderstatus = 'F'), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT), 0) AS f_rev,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
               COALESCE(CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,10))) FILTER (WHERE o_orderstatus = 'O'), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT), 0) AS o_rev,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
               COALESCE(CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,10))) FILTER (WHERE o_orderstatus = 'P'), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT), 0) AS p_rev
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // Long unpivot (melt) of part's numeric metrics; values meet on the
    // house ×10^4 BIGINT scale so the two metrics share one exact column.
    QueryDef("unpivot_long",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        Tables.read(s, dir, "part")
          .select(col("p_partkey"),
            (col("p_size").cast("long") * 10000L).as("p_size"),
            Queries.scaledLong(
              col("p_retailprice").cast(DecimalType(30, 10))).as("p_retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("p_size"), col("p_retailprice")),
            "metric", "value_scaled")
          .orderBy("p_partkey", "metric")
      },
      Some("""
        SELECT p_partkey, 'p_size' AS metric,
               CAST(p_size AS BIGINT) * 10000 AS value_scaled
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS metric,
               CAST(CAST(round(CAST(p_retailprice AS DECIMAL(30,10)), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS value_scaled
        FROM part
        ORDER BY p_partkey, metric"""))
  )

  /** CDC chunk CTE chain over an arbitrary (doc_id, text) source — the
    * DuckDB realization of Curation.cdcChunks (window 4, base 131,
    * divisor 64), term-for-term exact BIGINT arithmetic. Emits CTEs
    * `d$sfx, b$sfx, bs$sfx, ch$sfx` (no leading WITH) so two versions
    * of a corpus can be chunked in one query (the chunkstore_diff
    * oracle). `ch$sfx` has (doc_id, k, c, h). */
  private[graft] def cdcChunkCtes(src: String, sfx: String): String = s"""
        d$sfx AS (SELECT doc_id, text, string_split(text, '') cs,
                          len(text) n
                   FROM $src),
        b$sfx AS (SELECT doc_id, text, n,
                list_filter(range(4, n + 1), i ->
                  (CAST(ascii(cs[i]) AS BIGINT)
                   + CAST(ascii(cs[i-1]) AS BIGINT) * 131
                   + CAST(ascii(cs[i-2]) AS BIGINT) * 17161
                   + CAST(ascii(cs[i-3]) AS BIGINT) * 2248091) % 64 = 0) cuts
              FROM d$sfx),
        bs$sfx AS (SELECT doc_id, text, n,
                 CASE WHEN n = 0 THEN [CAST(0 AS BIGINT)]
                      WHEN len(cuts) > 0 AND cuts[-1] = n
                        THEN list_concat([CAST(0 AS BIGINT)], cuts)
                      ELSE list_concat(list_concat([CAST(0 AS BIGINT)], cuts),
                                       [CAST(n AS BIGINT)]) END bl
               FROM b$sfx),
        ch$sfx AS (SELECT doc_id, k,
                 substr(text, CAST(bl[CAST(k AS INT)] + 1 AS INT),
                   CAST(bl[CAST(k AS INT) + 1] - bl[CAST(k AS INT)] AS INT)) c,
                 md5(substr(text, CAST(bl[CAST(k AS INT)] + 1 AS INT),
                   CAST(bl[CAST(k AS INT) + 1] - bl[CAST(k AS INT)] AS INT))) h
               FROM bs$sfx, unnest(range(1, len(bl))) AS t(k))
  """

  /** Shared chunk CTE for the two cdc gates (documents source). */
  private def CdcChunkCte: String = "WITH " + cdcChunkCtes("documents", "")
}
