package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Dedup, KMeans, LmScore, Sampling, Similarity, TextStats}

/** Round-6 gate queries: corpus lifecycle operators around the curated
  * corpus — holdout splits, domain blocklists, composition reporting,
  * and the ORC interchange format. Same contract as every gate: the
  * Spark side runs the operator, the DuckDB side re-derives the result
  * independently, column names align, total ORDER BY. */
object QueriesR6 {

  // Frozen quantizers per sf dir, fit once and shared across runs of the
  // semantic-dedup gates — the real pipeline shape (centroids are a
  // trained ARTIFACT, not refit per query). KMeans.fit is deterministic
  // (stride init, fixed iters, rounded centroids), so memoization cannot
  // change results — the same precedent as QueriesLlm's bpe merge table.
  private val kmCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()
  private def kmFit(key: String)(f: => Seq[Seq[Double]]): Seq[Seq[Double]] =
    kmCache.computeIfAbsent(key, _ => f)

  /** Shared oracle fragment: the curation keep-set (stupid-backoff LM
    * surprisal filter at 4.4 bits/bigram, then exact dedup to min-id
    * survivors). Used by `curation_e2e` here and the round-7
    * `pipeline_materialized` gate — ONE definition of the curated set,
    * two consumers. Prefix with `WITH `. */
  private[graft] val CurationSurvivorCtes: String = """
        d AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
          FROM documents),
        bg AS (
          SELECT doc_id, w[CAST(r.i AS INT)] AS a, w[CAST(r.i AS INT) + 1] AS b
          FROM d, unnest(range(1, len(w))) r(i)),
        c2 AS (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c2
          FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        c1 AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        u AS (
          SELECT x AS b, CAST(COUNT(*) AS BIGINT) AS cu
          FROM (SELECT unnest(w) AS x FROM d WHERE doc_id % 2 = 0)
          GROUP BY 1),
        k AS (
          SELECT nv, LEAST(1000000000, 2305843009213693952 // nv) AS s
          FROM (SELECT (SELECT CAST(SUM(cu) AS BIGINT) FROM u)
                     + (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS nv)),
        p AS (
          SELECT bg.doc_id,
                 CASE WHEN c2.c2 IS NOT NULL THEN (c2.c2 * k.s) // c1.c1
                      ELSE (2 * (((COALESCE(u.cu, 0) + 1) * k.s) // k.nv)) // 5
                 END AS p_scaled, k.s AS s
          FROM bg LEFT JOIN c2 USING (a, b) LEFT JOIN c1 USING (a)
          LEFT JOIN u ON bg.b = u.b
          CROSS JOIN k),
        sc AS (
          SELECT doc_id, strlen(bin(s // greatest(p_scaled, 1))) - 1 AS bits
          FROM p),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(bits) AS BIGINT) AS sum_bits
          FROM sc GROUP BY 1),
        lmkeep AS (
          SELECT doc_id FROM agg
          WHERE n_bigrams > 0 AND sum_bits * 10 <= n_bigrams * 44),
        surv AS (
          SELECT min(doc_id) AS doc_id FROM documents
          WHERE doc_id IN (SELECT doc_id FROM lmkeep)
          GROUP BY md5(text))"""

  val all: Seq[QueryDef] = Seq(

    // ---- deterministic train/val/test split ------------------------------
    // Both engines derive the identical seeded md5 bucket; the gate pins
    // the whole assignment, not just the counts.
    QueryDef("split_assign",
      (s, dir) =>
        Sampling.splitAssign(Tables.read(s, dir, "documents"), "doc_id",
            seed = 7L, valPct = 10, testPct = 10)
          .select(col("doc_id"), col("split"))
          .orderBy("doc_id"),
      Some("""
        WITH b AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   AS BIGINT) % 100 AS bucket
          FROM documents)
        SELECT doc_id,
               CASE WHEN bucket < 10 THEN 'test'
                    WHEN bucket < 20 THEN 'val'
                    ELSE 'train' END AS split
        FROM b
        ORDER BY doc_id""")),

    // ---- domain blocklist filter ----------------------------------------
    // URLs are synthesized deterministically from doc_id (subdomains,
    // www., ports, mixed case); the blocklist blocks one apex domain
    // (which must also catch its subdomains) and one exact subdomain.
    // The oracle re-derives the domain with its own regexes and uses
    // LIKE-suffix parent matching — independent logic, same semantics.
    QueryDef("domain_filter",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val m = col("doc_id")
        val host = (m % 5).cast("string")
        val url = when(m % 3 === 0,
            concat(lit("https://WWW.Site"), host, lit(".COM/page")))
          .when(m % 3 === 1,
            concat(lit("http://ads.site"), host, lit(".com:8080/x?q=1")))
          .otherwise(concat(lit("https://site"), host, lit(".com/y")))
        val blocklist = s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row("site2.com"),
            org.apache.spark.sql.Row("ads.site4.com")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("domain",
              org.apache.spark.sql.types.StringType))))
        Curation.domainBlocklistFilter(
            docs.select(m, url.as("url")), "url", blocklist)
          .select(col("doc_id"))
          .orderBy("doc_id")
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            (CASE doc_id % 3
               WHEN 0 THEN 'https://WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.COM/page'
               WHEN 1 THEN 'http://ads.site' || CAST(doc_id % 5 AS VARCHAR) || '.com:8080/x?q=1'
               ELSE 'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.com/y' END) AS url
          FROM documents),
        d AS (
          SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)),
              '^.*@', ''), ':[0-9]+$', ''), '\.+$', ''), '^www\.', '') AS dom
          FROM u),
        bl(domain) AS (VALUES ('site2.com'), ('ads.site4.com')),
        blocked AS (
          SELECT DISTINCT doc_id
          FROM d JOIN bl ON d.dom = bl.domain OR d.dom LIKE '%.' || bl.domain)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM blocked)
        ORDER BY doc_id""")),

    // ---- corpus composition report --------------------------------------
    QueryDef("corpus_report",
      (s, dir) =>
        TextStats.corpusReport(Tables.read(s, dir, "documents"),
            "lang", "source", "n_chars")
          .orderBy("lang", "source"),
      Some("""
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY ROLLUP (lang, source)
        ORDER BY lang, source""")),

    // ---- bigram LM scoring (perplexity-family quality signal) -----------
    // Train on the even-id half of the corpus, score EVERY doc — odd docs
    // exercise the unseen-bigram/unseen-context smoothing paths. All
    // arithmetic after tokenization is exact integer (fixed-point
    // probability + bin-length surprisal bits), so the whole score is
    // pinned cross-engine, not just its shape.
    QueryDef("lm_score",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val model = LmScore.train(docs.filter(col("doc_id") % 2 === 0), "text")
        LmScore.score(docs, "text", "doc_id", model)
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> len(x) > 0) w
          FROM documents),
        bg AS (
          SELECT doc_id, w[CAST(r.i AS INT)] AS a, w[CAST(r.i AS INT) + 1] AS b
          FROM d, unnest(range(1, len(w))) r(i)),
        c2 AS (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c2
          FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        c1 AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        u AS (
          SELECT x AS b, CAST(COUNT(*) AS BIGINT) AS cu
          FROM (SELECT unnest(w) AS x FROM d WHERE doc_id % 2 = 0)
          GROUP BY 1),
        k AS (
          SELECT nv, LEAST(1000000000, 2305843009213693952 // nv) AS s
          FROM (SELECT (SELECT CAST(SUM(cu) AS BIGINT) FROM u)
                     + (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS nv)),
        p AS (
          SELECT bg.doc_id,
                 CASE WHEN c2.c2 IS NOT NULL THEN (c2.c2 * k.s) // c1.c1
                      ELSE (2 * (((COALESCE(u.cu, 0) + 1) * k.s) // k.nv)) // 5
                 END AS p_scaled, k.s AS s
          FROM bg LEFT JOIN c2 USING (a, b) LEFT JOIN c1 USING (a)
          LEFT JOIN u ON bg.b = u.b
          CROSS JOIN k),
        sc AS (
          SELECT doc_id, p_scaled,
                 strlen(bin(s // greatest(p_scaled, 1))) - 1 AS bits
          FROM p),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(p_scaled) AS BIGINT) AS sum_p,
                 CAST(SUM(bits) AS BIGINT) AS sum_bits
          FROM sc GROUP BY 1)
        SELECT documents.doc_id,
               COALESCE(n_bigrams, 0) AS n_bigrams,
               COALESCE(sum_p, 0) AS sum_p,
               COALESCE(sum_bits, 0) AS sum_bits
        FROM documents LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id""")),

    // ---- ANN: int8 scalar-quantization top-k (4x shrink serving) --------
    // Same planted-twin pin as ann_topk_pq: a twin is its query rescaled
    // by x1.001 — a positive scalar multiple, so it quantizes to (near-)
    // identical codes and its code-cosine is the max reachable; it must
    // come back at rank 1. corpus_rows guards the fixture scale.
    QueryDef("ann_topk_sq",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val planted = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
        val corpus = emb.select("vec_id", "embedding").unionByName(planted)
        val nCorpus = corpus.count()
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.sqTopK(corpus, queries, "embedding", "vec_id", k = 10)
          .filter(col("rank") === 1)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("query_id")
      },
      Some {
        val rows = (0L until 10L).map(q =>
          s"(CAST($q AS BIGINT), CAST(${q + 100000L} AS BIGINT), " +
            s"CAST(510 AS BIGINT))").mkString(", ")
        s"""
        SELECT * FROM (VALUES $rows) v(query_id, neighbor_id, corpus_rows)
        ORDER BY query_id"""
      }),

    // ---- semantic dedup (SemDeDup: cluster, then within-cluster pairs) --
    // Planted twins are EXACT copies of their originals: cluster
    // assignment is a deterministic function of the vector value, so an
    // identical vector provably lands in its original's cluster (a
    // rescaled twin could cross a Voronoi boundary) and cos = 1 >= the
    // threshold. The gate pins every dropped doc and its survivor.
    QueryDef("dedup_semantic",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val planted = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        val corpus = emb.select("vec_id", "embedding").unionByName(planted)
        val nCorpus = corpus.count()
        // centroids are a frozen quantizer fit on the BASE table and
        // shared with dedup_semantic_incremental: identical vectors
        // co-assign under ANY centroids, which is all the pinned twins
        // need — and sharing is exactly how a production index treats
        // its quantizer
        val centroids = kmFit(dir)(
          KMeans.fit(emb, "embedding", "vec_id",
            k = 8, iters = 2, corpusRows = Some(nCorpus - 10)))
        Dedup.semanticDedup(corpus, "embedding", "vec_id", centroids,
            threshold = 0.9)
          .filter(!col("keep"))
          .select(col("id"), col("dup_of"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("id")
      },
      Some {
        val rows = (0L until 10L).map(q =>
          s"(CAST(${q + 100000L} AS BIGINT), CAST($q AS BIGINT), " +
            s"CAST(510 AS BIGINT))").mkString(", ")
        s"""
        SELECT * FROM (VALUES $rows) v(id, dup_of, corpus_rows)
        ORDER BY id"""
      }),

    // ---- ORC interchange: write + schema-pinned read ---------------------
    // Same contract as jsonl_source: the roundtrip through the columnar
    // interchange format must be value-exact; the schema is pinned from
    // the table contract, never re-inferred (at 100 TB inference is a
    // full extra pass and type drift is silent).
    QueryDef("orc_source",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val tmp = java.nio.file.Files.createTempDirectory("graft_orc_").toString
        docs.coalesce(2).write.mode("overwrite").orc(tmp)
        s.read.schema(docs.schema).orc(tmp)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        ORDER BY doc_id""")),

    // ---- incremental semantic dedup (daily batch vs frozen index) --------
    // Corpus indexed once with frozen centroids; the batch carries 10
    // exact copies (must drop, survivor = the original) and 5 NEGATED
    // vectors (cos = -1 to their source — must keep). Never corpus-vs-
    // corpus: cost scales with the batch.
    QueryDef("dedup_semantic_incremental",
      (s, dir) => {
        val emb = Tables.read(s, dir, "embeddings")
        val nCorpus = emb.count()
        val centroids = kmFit(dir)(
          KMeans.fit(emb, "embedding", "vec_id",
            k = 8, iters = 2, corpusRows = Some(nCorpus)))
        val corpusIndexed = KMeans.assign(
          emb.select(col("vec_id"), col("embedding")), "embedding", centroids)
        val copies = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        val fresh = emb.filter(col("vec_id") >= 10 && col("vec_id") < 15)
          .select((col("vec_id") + 200000L).as("vec_id"),
            transform(col("embedding"), v => -v).as("embedding"))
        Dedup.semanticDedupIncremental(corpusIndexed,
            copies.unionByName(fresh), "embedding", "vec_id",
            centroids, threshold = 0.9)
          .select(col("id"), col("dup_of"), col("keep"))
          .withColumn("corpus_rows", lit(nCorpus))
          .orderBy("id")
      },
      Some {
        val rows =
          (0L until 10L).map(q =>
            s"(CAST(${q + 100000L} AS BIGINT), CAST($q AS BIGINT), FALSE, " +
              "CAST(500 AS BIGINT))") ++
          (10L until 15L).map(f =>
            s"(CAST(${f + 200000L} AS BIGINT), CAST(NULL AS BIGINT), TRUE, " +
              "CAST(500 AS BIGINT))")
        s"""
        SELECT * FROM (VALUES ${rows.mkString(", ")})
          v(id, dup_of, keep, corpus_rows)
        ORDER BY id"""
      }),

    // ---- per-domain quota capping ----------------------------------------
    // URLs synthesized from doc_id over 5 domains; quota 3 keeps exactly
    // the 3 md5-smallest ids per domain. The oracle selects them with an
    // independent row_number window over the same hash.
    QueryDef("domain_quota",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val url = concat(lit("https://site"), (col("doc_id") % 5).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string"))
        Curation.domainQuota(docs.select(col("doc_id"), url.as("url")),
            "url", "doc_id", quota = 3)
          .select("doc_id")
          .orderBy("doc_id")
      },
      Some("""
        WITH h AS (
          SELECT doc_id, doc_id % 5 AS domain,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) AS hh
          FROM documents),
        r AS (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rn
          FROM h)
        SELECT doc_id FROM r WHERE rn <= 3
        ORDER BY doc_id""")),

    // ---- within-document repeated-line removal ---------------------------
    // Multi-line docs are synthesized by repeating a slice of the text;
    // the duplicate line must vanish, order preserved, both engines
    // running their own indexed prefix-scan filter.
    QueryDef("line_dedup",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val text2 = concat_ws("\n",
          substring(col("text"), 1, 30), substring(col("text"), 31, 30),
          substring(col("text"), 1, 30), substring(col("text"), 61, 30))
        Curation.dedupLinesWithinDoc(
            docs.select(col("doc_id"), text2.as("text")), "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""
        WITH l AS (
          SELECT doc_id,
                 [substr(text, 1, 30), substr(text, 31, 30),
                  substr(text, 1, 30), substr(text, 61, 30)] AS lines
          FROM documents),
        k AS (
          SELECT doc_id, lines,
                 list_filter(lines,
                   (x, i) -> list_position(lines[1:i-1], x) = 0) AS kept
          FROM l)
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept,
               array_to_string(kept, chr(10)) AS text_clean
        FROM k
        ORDER BY doc_id""")),

    // ---- end-to-end curation pipeline ------------------------------------
    // The user story in one plan: LM-surprisal quality filter (keep docs
    // averaging <= 4.4 bits/bigram, integer form) -> exact dedup (min-id
    // survivor per distinct text) -> train/val/test split -> split-level
    // corpus report. Every stage is the already-gated operator; the
    // oracle chains the same proven CTE fragments, so this pins the
    // COMPOSITION, not just the parts.
    QueryDef("curation_e2e",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
        val model = LmScore.train(docs.filter(col("doc_id") % 2 === 0), "text")
        // ids only, materialized once: the keep-set feeds THREE plan arms
        // (kept, survivors, curated) — without this the whole scoring
        // subtree executes once per arm (production shape: write the
        // curated id set / table between stages)
        val lmKeep = LmScore.score(docs, "text", "doc_id", model)
          .filter(col("n_bigrams") > 0 &&
            col("sum_bits") * 10L <= col("n_bigrams") * 44L)
          .select("doc_id")
          .localCheckpoint()
        val kept = docs.join(lmKeep, Seq("doc_id"), "left_semi")
        val survivors = Dedup.exact(kept, "text", "doc_id").select("doc_id")
        val curated = kept.join(survivors, Seq("doc_id"), "left_semi")
        Sampling.splitAssign(curated, "doc_id", seed = 7L, valPct = 10, testPct = 10)
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy("split")
      },
      Some(s"""
        WITH $CurationSurvivorCtes,
        assigned AS (
          SELECT doc_id, n_chars,
                 CASE WHEN b < 10 THEN 'test'
                      WHEN b < 20 THEN 'val'
                      ELSE 'train' END AS split
          FROM (
            SELECT doc_id, n_chars,
                   CAST('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 4)
                     AS BIGINT) % 100 AS b
            FROM documents
            WHERE doc_id IN (SELECT doc_id FROM surv)))
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM assigned GROUP BY 1
        ORDER BY split""")),

    // ---- streaming curation: PII scrub as a stream transform -------------
    // The curation projections compose with Structured Streaming
    // unchanged: the SAME piiStats Column pipeline (and the same oracle
    // as pii_redact) runs as the transform of a checkpointed AvailableNow
    // file-source stream; the second run must append nothing. This is
    // the evidence for "curate the crawl as it lands" — any pure-
    // projection operator in graft.llm streams this way.
    QueryDef("stream_pii_redact",
      (s, dir) => {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val src = Files.createTempDirectory("graft_spii_src_")
        Files.copy(Paths.get(s"$dir/documents.parquet"),
          src.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
        val tgt = Files.createTempDirectory("graft_spii_tgt_").toString
        val ckpt = Files.createTempDirectory("graft_spii_ck_").toString
        val schema = s.read.parquet(src.toString).schema
        def runOnce(): Unit =
          graft.streaming.StreamingIncremental.withStatePartitions(s) {
            val q = graft.streaming.StreamingIncremental.incrementalAppend(
              s, src.toString, schema, tgt, ckpt,
              df => Curation.piiStats(
                df.select(col("doc_id"), concat(col("text"),
                  lit(" contact user"), col("doc_id").cast("string"),
                  lit("@example.com or +1 555-000-"), col("doc_id").cast("string"),
                  lit(" ip 10.0.0."), pmod(col("doc_id"), lit(255L)).cast("string"))
                  .as("text")),
                "text", "doc_id"))
            q.awaitTermination()
          }
        runOnce()
        runOnce() // checkpointed: must append nothing
        s.read.parquet(tgt).orderBy("doc_id")
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

    // ---- CSV interchange: write + schema-pinned read ---------------------
    // RFC-4180 quoting (escape = quote doubling) and multiLine read, so
    // embedded commas/quotes/newlines in document text survive the
    // roundtrip; schema pinned as always. multiLine is the correctness-
    // over-splittability call: a quoted-newline CSV cannot be split at
    // arbitrary byte offsets, so each FILE is one task — fine here
    // because the write controls file sizing (coalesce / maxRecordsPerFile
    // at scale), wrong only for foreign dumps, which should be converted
    // once and never re-read as CSV.
    QueryDef("csv_source",
      (s, dir) => {
        val docs = Tables.read(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val tmp = java.nio.file.Files.createTempDirectory("graft_csv_").toString
        docs.coalesce(2).write.mode("overwrite")
          .option("header", "true").option("escape", "\"")
          .csv(tmp)
        s.read.schema(docs.schema)
          .option("header", "true").option("escape", "\"")
          .option("multiLine", "true")
          .csv(tmp)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        ORDER BY doc_id"""))
  )
}
