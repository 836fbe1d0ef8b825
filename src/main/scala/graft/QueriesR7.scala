package graft

import org.apache.spark.sql.functions._

/** Round-7 gate queries: the warehouse-materialized curation pipeline —
  * the resume-able staging variant of `curation_e2e` — certified by the
  * same independent DuckDB derivation of the curated survivor set. */
object QueriesR7 {

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
        ORDER BY split"""))
  )
}
