package graft.tools

import org.apache.spark.sql.functions._

/** Scale-factor fixture builder for the sf1 honesty check (r12 verdict
  * ask #7): replicate the driver's sf0.1 tables ×N into a scratch dir
  * so the expensive gates can be timed at ~sf1 without touching the
  * read-only testdata.
  *
  * Replication preserves each gate's WORK SHAPE instead of its letter:
  *  - `documents`: ids offset per replica; replica i>0 text runs
  *    through a replica-specific vowel rotation, so WITHIN-replica
  *    dedup/near-dup structure is exactly the original while replicas
  *    are unrelated corpora — candidate-pair counts scale linearly
  *    with N rather than quadratically (which naive duplication would
  *    cause, and which would measure a different algorithm). `source`
  *    values are kept verbatim: gates parse `substr(source, 4)` as
  *    INT, so parts simply get N× rows.
  *  - `embeddings`: ids offset, vectors verbatim (cells get denser —
  *    the honest repeat-vector case).
  *  - `events`: event/user ids offset per replica (N× users over the
  *    same period — sessionization and windows scale by row count).
  *  - TPC-H tables: copied verbatim (not in the expensive-gate set).
  *
  * Usage: runMain graft.tools.MakeSf [srcDir] [dstDir] [mult] */
object MakeSf {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.builder("local[16]", Some(16))
      .appName("make-sf").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docStep = docs.agg(max("doc_id")).head().getLong(0) + 1L
    (0 until mult).map { i =>
      val rot = "aeiou".substring(i % 5) + "aeiou".substring(0, i % 5)
      docs.select(
        (col("doc_id") + lit(i * docStep)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), "aeiou", rot)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embStep = emb.agg(max("vec_id")).head().getLong(0) + 1L
    (0 until mult).map(i => emb.select(
        (col("vec_id") + lit(i * embStep)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionAll _)
      .repartition(16).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val evStep = ev.agg(max("event_id")).head().getLong(0) + 1L
    val uStep = ev.agg(max("user_id")).head().getLong(0) + 1L
    (0 until mult).map(i => ev.select(
        (col("event_id") + lit(i * evStep)).as("event_id"), col("ts"),
        (col("user_id") + lit(i * uStep)).as("user_id"),
        col("event_type"), col("value"), col("props")))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$dst/events.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"[makesf] wrote ${mult}x of $src to $dst")
    spark.stop()
  }
}
