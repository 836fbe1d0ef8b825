package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Sampling, TextStats}

/** Round-6 gate queries: corpus lifecycle operators around the curated
  * corpus — holdout splits, domain blocklists, composition reporting,
  * and the ORC interchange format. Same contract as every gate: the
  * Spark side runs the operator, the DuckDB side re-derives the result
  * independently, column names align, total ORDER BY. */
object QueriesR6 {

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
            regexp_replace(regexp_replace(
              lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)),
              '^www\.', ''), ':[0-9]+$', '') AS dom
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
        ORDER BY doc_id"""))
  )
}
