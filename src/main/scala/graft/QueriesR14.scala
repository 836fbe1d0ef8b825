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
        ORDER BY doc_id"""))
  )
}
