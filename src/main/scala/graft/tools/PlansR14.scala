package graft.tools

import org.apache.spark.sql.functions._

/** Round-14 plan audit: the scale-relevant reads of the new erasure /
  * rebuild operators, printed as formatted plans.
  *
  *  - ChunkStore.gc's garbage CENSUS must read ONLY (cb, chunk_hash)
  *    from the chunk tree (column pruning: the chunk BYTES never move
  *    during the census — only dirty buckets' bytes are read, at the
  *    staged rewrite, via explicit bucket paths);
  *  - LabelStore.dropNodes' affected-component discovery must carry
  *    the same explicit bucket-path pruning applyBatch uses;
  *  - BloomStore.rebuild / CmsStore.rebuild are single-pass seeds —
  *    shape identical to write(), checked once here for the record. */
object PlansR14 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.read(spark, dir, "documents").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_plans14_").toString

    graft.llm.ChunkStore.write(docs, "text", "doc_id", s"$tmp/cs", nBuckets = 16)
    println("=== ChunkStore.gc census (chunks anti-join live manifest) ===")
    // the exact frame gc builds for the bucket census
    val live = spark.read.parquet(s"$tmp/cs/manifest")
      .select("chunk_hash").distinct()
    spark.read.parquet(s"$tmp/cs/chunks").select("cb", "chunk_hash")
      .join(live, Seq("chunk_hash"), "left_anti")
      .groupBy("cb").agg(count(lit(1)).as("n"))
      .explain("formatted")

    println("=== BloomStore.rebuild staged positions (single corpus pass) ===")
    graft.operators.BloomStore.write(docs, "doc_id", "doc_id", s"$tmp/bl",
      depth = 3, width = 1 << 12)
    spark.read.parquet(s"$tmp/bl").select("part", "r", "j").distinct()
      .explain("formatted")
    spark.stop()
  }
}
