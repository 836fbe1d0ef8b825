package graft

import org.apache.spark.sql.functions._

/** Round-14 wave: the erasure story's last two stores (ChunkStore
  * targeted gc, LabelStore node-drop) and the Bloom/CMS geometry
  * rebuild — the family's final "none — rebuild by hand" migration
  * rows become operators with gates. */
object QueriesR14 {

  val all: Seq[QueryDef] = Seq(

    // ---- refcounted chunk garbage collection ------------------------------
    // Every document gets a near-duplicate twin (same text + a unique
    // suffix): the twins share all their prefix chunks with the
    // originals and own their suffix chunks exclusively. Deleting the
    // twins and running gc must collect ONLY the exclusive bytes —
    // shared chunks survive because a surviving manifest still
    // references them — and the originals must reconstruct
    // byte-identically from the collected store. The oracle is the raw
    // corpus: the round trip proves no surviving byte moved.
    // ChunkStoreSpec pins the targeted part (clean buckets untouched,
    // crash leftovers refused, prefix-atomic install).
    QueryDef("chunk_gc",
      (s, dir) => {
        import graft.llm.ChunkStore
        val docs = Tables.read(s, dir, "documents").select("doc_id", "text")
        val twins = docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" unique twin suffix "),
            col("doc_id").cast("string"),
            lit(" marking bytes that must be collected")).as("text"))
        val root = java.nio.file.Files
          .createTempDirectory("graft_chunkgc_gate_").toString
        ChunkStore.write(docs.unionByName(twins),
          "text", "doc_id", root, nBuckets = 16)
        val storedBefore = s.read.parquet(s"$root/chunks").count()
        ChunkStore.deleteDocs(
          twins.select("doc_id"), "doc_id", root)
        val (buckets, collected) = ChunkStore.gc(s, root)
        require(buckets > 0 && collected > 0L,
          s"gc must collect the twins' exclusive chunks, got " +
            s"($buckets, $collected)")
        require(s.read.parquet(s"$root/chunks").count() ==
          storedBefore - collected,
          "collected count must equal the physical row delta")
        ChunkStore.reconstruct(s, root).orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, text FROM documents
        WHERE len(text) > 0
        ORDER BY doc_id""")),

    // ---- label-store node erasure with component re-closure ---------------
    // Chain graph: one pair (i, i+1) inside every decade of doc_ids, so
    // each decade is one component labeled by its smallest id. The
    // store is built in two generations (seed + a named backfill slot,
    // folded by compact — the erasure op refuses live slots), then
    // every doc_id % 20 == 5 node is erased. Each even decade's chain
    // SPLITS around the hole into two components with new min-labels;
    // odd decades are untouched (and their buckets never rewritten —
    // LabelStoreSpec pins that). The oracle is the recursive closure
    // over the surviving pairs alone: after erasure the store must be
    // indistinguishable from one that never saw the dropped nodes.
    QueryDef("labelstore_drop",
      (s, dir) => {
        import graft.operators.{ConnectedComponents, LabelStore}
        val ids = Tables.read(s, dir, "documents").select("doc_id")
        val pairsAll = ids.as("a").join(ids.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 &&
              col("a.doc_id") % 10 =!= 9)
          .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
        val p = java.nio.file.Files
          .createTempDirectory("graft_lsdrop_gate_").toString
        LabelStore.write(
          ConnectedComponents.run(pairsAll.filter(col("u") < 300), "u", "v"),
          p, nBuckets = 8)
        LabelStore.applyBatch(s, p, pairsAll.filter(col("u") >= 300),
          "u", "v", runId = Some("backfill-x"))
        LabelStore.compact(s, p) // dropNodes refuses live slots
        val (nAffected, _) = LabelStore.dropNodes(s, p,
          ids.filter(col("doc_id") % 20 === 5), "doc_id",
          pairsAll, "u", "v")
        require(nAffected > 0, "the drop must touch components")
        LabelStore.read(s, p).orderBy("node")
      },
      Some("""
        WITH RECURSIVE pr AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % 10 <> 9),
        surv AS (
          SELECT u, v FROM pr WHERE u % 20 <> 5 AND v % 20 <> 5),
        e AS (SELECT u, v FROM surv UNION SELECT v, u FROM surv),
        cc(node, label) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, cc.label FROM e JOIN cc ON cc.node = e.v)
        SELECT node, MIN(label) AS label
        FROM cc GROUP BY node
        ORDER BY node""")),

    // ---- bloom geometry rebuild from the raw corpus ------------------------
    // A deliberately tight store (w=512) is rebuilt at 4x width from
    // the same corpus: fill per-mille must DROP (require), keys the
    // corpus contains must verdict true at both geometries (no false
    // negatives ever — require), and the new verdicts — including
    // which absent probes false-positive now — are replayed exactly by
    // the oracle at the new geometry. BloomStoreSpec pins the crash
    // case (old store readable until the atomic swap).
    QueryDef("bloom_rebuild",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.BloomStore
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_bloomrb_gate_").toString
        BloomStore.write(docs, "doc_id", "source", p,
          depth = 3, width = 512)
        val present = docs.filter(col("doc_id") % 23 === 0)
        val probes = present.select(col("doc_id").cast("string").as("k"))
          .unionByName(present.select(
            concat(lit("zz"), col("doc_id").cast("string")).as("k")))
        def maxFill(): Long = BloomStore.fill(s, p)
          .agg(max("fill_pm")).head().getLong(0)
        def presentTrue(): Long = BloomStore
          .mightContain(s, p, probes, "k")
          .join(present.select(col("doc_id").cast("string").as("key")),
            "key")
          .filter(!col("might_contain")).count()
        val fillBefore = maxFill()
        require(presentTrue() == 0, "false negatives before rebuild")
        BloomStore.rebuild(docs, "doc_id", "source", p,
          depth = 3, width = 2048)
        require(BloomStore.readMeta(s, p) == ((3, 2048)),
          "rebuild must install the new geometry atomically")
        // strict drop only: the exact factor depends on corpus size
        // relative to width (a saturated 512-row store at sf0.1 drops
        // 1000 -> ~910, a 500-key one at sf0.01 drops ~620 -> ~215);
        // BloomStoreSpec pins the ~4x factor on a fixed fixture
        val fillAfter = maxFill()
        require(fillAfter < fillBefore,
          s"4x width must drop fill, got $fillBefore -> $fillAfter")
        require(presentTrue() == 0, "false negatives after rebuild")
        BloomStore.mightContain(s, p, probes, "k").orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        pos AS (
          SELECT DISTINCT r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 2048 AS j
          FROM documents CROSS JOIN d),
        pr AS (
          SELECT CAST(doc_id AS VARCHAR) AS key FROM documents
          WHERE doc_id % 23 = 0
          UNION ALL
          SELECT 'zz' || CAST(doc_id AS VARCHAR) FROM documents
          WHERE doc_id % 23 = 0),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 2048 AS j
          FROM (SELECT DISTINCT key FROM pr) CROSS JOIN d)
        SELECT key, COUNT(pos.j) = 3 AS might_contain
        FROM pj LEFT JOIN pos ON pj.r = pos.r AND pj.j = pos.j
        GROUP BY 1 ORDER BY 1""")),

    // ---- count-min geometry rebuild from the raw corpus --------------------
    // Seed + a stream batch, then rebuild at 4x width from the full
    // corpus. The carried fold manifest must record the committed
    // batch, so the post-rebuild REPLAY of b0 in the gate is a
    // write-level no-op — if it re-landed, every estimate of its keys
    // would double and the hash would miss. The oracle rebuilds the
    // whole sketch at the NEW geometry in exact SQL.
    QueryDef("cms_rebuild",
      (s, dir) => {
        import java.nio.file.Files
        import graft.operators.CmsStore
        import graft.llm.RunSlots
        val docs = Tables.read(s, dir, "documents")
        val p = Files.createTempDirectory("graft_cmsrb_gate_").toString
        CmsStore.write(
          docs.filter(expr("CAST(substr(source, 4) AS INT) < 10")),
          "lang", "source", p, depth = 4, width = 16)
        CmsStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          "lang", "source", p, batchId = 0L)
        CmsStore.rebuild(docs, "lang", "source", p, depth = 4, width = 64)
        require(CmsStore.readMeta(s, p) == ((4, 64)),
          "rebuild must install the new geometry atomically")
        require(RunSlots.foldedRuns(s, s"$p/cms").contains("b0"),
          "rebuild must carry the committed batch into the manifest")
        // the replay the manifest exists for: must be a no-op now
        CmsStore.appendBatch(
          docs.filter(expr("CAST(substr(source, 4) AS INT) >= 10")),
          "lang", "source", p, batchId = 0L)
        val probes = docs.select(col("lang").as("k")).distinct()
          .unionByName(s.range(1).select(lit("zz").as("k")))
        CmsStore.estimate(s, p, probes, "k").orderBy("key")
      },
      Some("""
        WITH d AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL
                   SELECT 2 UNION ALL SELECT 3),
        cells AS (
          SELECT r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                   lang), 1, 15) AS BIGINT) % 64 AS j,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents CROSS JOIN d
          GROUP BY 1, 2),
        probes AS (SELECT DISTINCT lang AS key FROM documents
                   UNION SELECT 'zz'),
        pj AS (
          SELECT key, r, CAST('0x' || substr(md5(CAST(r AS VARCHAR) ||
                   ':' || key), 1, 15) AS BIGINT) % 64 AS j
          FROM probes CROSS JOIN d)
        SELECT key, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est
        FROM pj LEFT JOIN cells USING (r, j)
        GROUP BY 1 ORDER BY 1"""))
  )
}
