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
        ORDER BY node"""))
  )
}
