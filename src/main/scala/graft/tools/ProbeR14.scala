package graft.tools

import org.apache.spark.sql.functions._

/** Round-14 scale probes: the targeted erasure ops vs the full-rewrite
  * alternative they buy out of.
  *
  *  1. ChunkStore.gc vs ChunkStore.compact after a SMALL takedown
  *     (hash-addressed garbage spreads uniformly, so the targeted win
  *     exists exactly when the delete set is small relative to the
  *     bucket count — the takedown/opt-out case; a mass delete is a
  *     compact, and the probe reports both so the crossover is
  *     visible);
  *  2. LabelStore.dropNodes vs LabelStore.compact on a store with many
  *     components where the drop touches a handful — rewrite cost must
  *     track the affected components' buckets, not the store.
  *
  * Usage: runMain graft.tools.ProbeR14 [sfDir] */
object ProbeR14 {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe14_").toString

    // ---- 1. chunk gc: small takedown ------------------------------------
    val cs = s"$tmp/cs"
    val (_, tBuild) = timed(
      graft.llm.ChunkStore.write(docs, "text", "doc_id", cs, nBuckets = 256))
    import spark.implicits._
    // a takedown must erase the CONTENT, not one row id: the MakeSf
    // fixture gives every doc an exact twin (the i%5 vowel rotation is
    // the identity for replica pairs 0/5 etc.), so single-doc deletes
    // collect nothing — every chunk stays referenced by the twin
    // (correct behavior; probe runs proved it: 0 chunks for arbitrary,
    // unique-text, and exclusive-owner single victims). Delete the
    // whole duplicate-text group of 5 chosen texts, the real takedown
    // shape ("remove this page wherever it was crawled").
    val chosen = docs.groupBy("text").agg(min("doc_id").as("m"))
      .orderBy(col("m").desc).limit(5).select("text")
    val victims = docs.join(chosen, Seq("text"), "left_semi")
      .select("doc_id").localCheckpoint(true)
    val nVictims = victims.count()
    graft.llm.ChunkStore.deleteDocs(victims, "doc_id", cs)
    val ((buckets, collected), tGc) = timed(graft.llm.ChunkStore.gc(spark, cs))
    val (_, tCompact) = timed(graft.llm.ChunkStore.compact(spark, cs))
    println(f"[probe14] chunkstore docs=$n build=$tBuild%.1fs | " +
      f"gc($nVictims docs, 5 texts): $tGc%.1fs, $buckets/256 buckets, " +
      f"$collected chunks | full compact: $tCompact%.1fs")

    // ---- 2. label-store node drop: few affected components --------------
    val ls = s"$tmp/ls"
    // one chain pair (i, i+1) inside every decade of ids: n/10 components
    val ids = docs.select(col("doc_id"))
    val pairs = ids.as("a").join(ids.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1 && col("a.doc_id") % 10 =!= 9)
      .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
      .localCheckpoint(true)
    val (_, tLsBuild) = timed(graft.operators.LabelStore.write(
      graft.operators.ConnectedComponents.run(pairs, "u", "v"),
      ls, nBuckets = 256))
    val drop = ids.filter(col("doc_id") % 10 === 5).limit(10)
    val ((nAffected, dirty), tDrop) = timed(
      graft.operators.LabelStore.dropNodes(spark, ls, drop, "doc_id",
        pairs, "u", "v"))
    val (_, tLsCompact) = timed(graft.operators.LabelStore.compact(spark, ls))
    println(f"[probe14] labelstore components=${n / 10} build=$tLsBuild%.1fs | " +
      f"dropNodes(10 nodes): $tDrop%.1fs, $nAffected components, " +
      f"$dirty/512 buckets | full compact: $tLsCompact%.1fs")
    spark.stop()
  }
}
