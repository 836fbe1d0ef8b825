package graft

import org.apache.spark.sql.functions._

/** Round-16 wave: the takedown story made STANDING — a denylist
  * recorded by `forgetDocs` that every append path consults, so a
  * forgotten document stays forgotten across later crawl batches —
  * plus the sketch-rebuild orchestration (Bloom/CMS re-seeded at a
  * fresh geometry from the one audited entry point). */
object QueriesR16 {

  val all: Seq[QueryDef] = Seq(

    // ---- takedown vs re-ingestion -------------------------------------------
    // The r15 hole: erasure was durable against REPLAYS (fold
    // manifests) but a brand-NEW crawl batch containing a forgotten
    // document re-landed it legitimately — chunk tombstones lose to
    // any higher-seq append, and every store happily re-admits. Here
    // three stores (content chunks, link graph, consistent samples)
    // are built, doc_id % 9 == 4 is forgotten with denylist = true,
    // and then a batch CONTAINING half the forgotten docs (every even
    // doc_id) is appended through the normal ingest paths. The batch's
    // SURVIVING content must land (n_live grows by exactly the
    // surviving batch rows — the denylist must not over-filter), and
    // the independent Forget.audit must still read zero leaks
    // everywhere, chunk manifest purge-debt included.
    QueryDef("forget_reingest",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.{ChunkStore, Forget}
        import graft.operators.{EdgeStore, SampleStore}
        val docs = Tables.read(s, dir, "documents")
        val ids = docs.select("doc_id")
        val pairs = ids.as("a").join(ids.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 &&
              col("a.doc_id") % 10 =!= 9)
          .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
        val base = Files.createTempDirectory("graft_reingest_gate_").toString
        val (chP, edP, smP) = (s"$base/chunk", s"$base/edge", s"$base/sample")
        // three independent store builds with bounded overlap (§2.6)
        graft.core.Par.run3(
          () => ChunkStore.write(docs.select("doc_id", "text"), "text",
            "doc_id", chP, nBuckets = 16),
          () => EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v",
            Some("w"), edP, nBuckets = 8),
          () => SampleStore.write(docs, Seq.empty, "doc_id", "source", smP,
            kMax = 40))
        val dropped = ids.filter(col("doc_id") % 9 === 4)
        val stores = Forget.Stores(chunk = Some(chP), edge = Some(edP),
          sample = Some(smP))
        Forget.forgetDocs(s, dropped, "doc_id", stores,
          chunkCompact = true, denylist = true, overlapStores = 3)
        // THE RE-INGESTION: a later crawl batch containing forgotten
        // docs, through each store's ordinary append path
        val batch = docs.filter(col("doc_id") % 2 === 0)
        graft.core.Par.run3(
          () => ChunkStore.append(batch.select("doc_id", "text"), "text",
            "doc_id", chP, nBuckets = 16, runId = Some("recrawl")),
          () => EdgeStore.append(pairs.filter(col("u") % 2 === 0), "u", "v",
            None, edP, nBuckets = 8, runId = Some("recrawl")),
          () => SampleStore.append(batch, Seq.empty, "doc_id", "source", smP,
            runId = Some("recrawl")))
        val audit = Forget.audit(s, dropped, "doc_id", stores)
        require(audit.filter(col("n_dropped") =!= 0L).isEmpty,
          "a re-ingested batch re-landed a forgotten id")
        audit.orderBy("store")
      },
      Some("""
        WITH surv AS (SELECT doc_id FROM documents WHERE doc_id % 9 <> 4),
        survLen AS (
          SELECT s.doc_id FROM surv s JOIN documents d USING (doc_id)
          WHERE len(d.text) > 0),
        pr AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 10 <> 9),
        sp AS (SELECT u, v FROM pr WHERE u % 9 <> 4 AND v % 9 <> 4)
        SELECT * FROM (VALUES
          ('chunk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM survLen),
           CAST(0 AS BIGINT)),
          ('chunk_manifest',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM survLen),
           CAST(0 AS BIGINT)),
          ('edge',
           CAST((SELECT COUNT(*) FROM sp) +
                (SELECT COUNT(*) FROM sp WHERE u % 2 = 0) AS BIGINT),
           CAST(0 AS BIGINT)),
          ('sample',
           CAST((SELECT COUNT(*) FROM surv) +
                (SELECT COUNT(*) FROM surv WHERE doc_id % 2 = 0) AS BIGINT),
           CAST(0 AS BIGINT))
        ) AS t(store, n_live, n_dropped)
        ORDER BY store""")),

    // ---- sketch rebuild from the audited takedown entry point ---------------
    // Bloom/CMS hold no key material, but a Bloom probe for a
    // forgotten id may still answer true — when policy says even that
    // residual signal must go, forgetDocs re-seeds the store from the
    // SURVIVING corpus at a declared fresh geometry (r15 verdict #6).
    // Every doc id is probed afterwards: surviving ids must verdict
    // true (no false negatives at any geometry), and each dropped id
    // behaves exactly as a fresh absent probe — the oracle replays the
    // new geometry's bits over the surviving corpus, so which dropped
    // ids still false-positive is pinned bit-for-bit, not waved at.
    QueryDef("forget_sketch_rebuild",
      (s, dir) => {
        import java.nio.file.Files
        import graft.llm.Forget
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_fsketch_gate_")
          .toString + "/bloom"
        BloomStore.write(docs, "doc_id", "source", p,
          depth = 3, width = 512)
        val dropped = docs.select("doc_id").filter(col("doc_id") % 9 === 4)
        Forget.forgetDocs(s, dropped, "doc_id",
          Forget.Stores(bloom = Some(Forget.SketchTarget(
            p, docs, "doc_id", "source", depth = 3, width = 2048))))
        require(BloomStore.readMeta(s, p) == ((3, 2048)),
          "the fresh geometry must install atomically")
        val probes = docs.select(col("doc_id").cast("string").as("k"))
        val out = BloomStore.mightContain(s, p, probes, "k")
        require(out.join(docs.filter(col("doc_id") % 9 =!= 4)
            .select(col("doc_id").cast("string").as("key")), "key")
          .filter(!col("might_contain")).isEmpty,
          "false negative on a surviving key after the rebuild")
        out.orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        pos AS (
          SELECT DISTINCT r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 2048 AS j
          FROM documents CROSS JOIN d WHERE doc_id % 9 <> 4),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 2048 AS j
          FROM (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS key
                FROM documents) CROSS JOIN d)
        SELECT key, COUNT(pos.j) = 3 AS might_contain
        FROM pj LEFT JOIN pos ON pj.r = pos.r AND pj.j = pos.j
        GROUP BY 1 ORDER BY 1"""))
  )
}
