package graft.tools

import org.apache.spark.sql.functions._

/** Scale-factor fixture builder for the sf1 honesty check (r12 verdict
  * ask #7): replicate the driver's sf0.1 tables ×N into a scratch dir
  * so the expensive gates can be timed at ~sf1 without touching the
  * read-only testdata.
  *
  * Two modes (4th arg):
  *
  * `clone` (default) preserves each gate's WORK SHAPE instead of its
  * letter:
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
  *  - Degeneracy (why `organic` exists, r16 verdict "What's missing
  *    #4"): there are only 5 vowel rotations, so at ×10 replicas i and
  *    i+5 are EXACT clones — every doc sits in a duplicate pair, the
  *    BPE dict is identical, and dedup/pair workloads measure a
  *    pathological corpus.
  *
  * `organic` makes every document's text DISTINCT at any multiplier:
  *  - each doc (every replica, replica 0 included) gets a
  *    deterministic per-(doc, replica) salt token spliced in every 4th
  *    word — word statistics and lengths stay realistic, but no two
  *    docs anywhere share their shingles by construction, so the
  *    near-dup rate is controlled, not accidental;
  *  - a KNOWN near-dup structure is planted on top: every doc with
  *    doc_id % 50 == 0 gains a twin (ids above mult·step) whose text
  *    appends one token — Jaccard ≈ n/(n+2), safely above every gate
  *    threshold — so dedup families have exactly docs/50 true pairs
  *    per replica to find (the honest pair-count column);
  *  - `embeddings`: each component scaled by a deterministic ±3%
  *    per-(vec, dim, replica) factor — distinct vectors, same
  *    geometry, so IVF cells get realistic diversity instead of exact
  *    repeats.
  *
  * Usage: runMain graft.tools.MakeSf [srcDir] [dstDir] [mult] [mode] */
object MakeSf {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("clone")
    require(mode == "clone" || mode == "organic", s"unknown mode $mode")
    val spark = graft.core.GraftSession.builder("local[16]", Some(16))
      .appName("make-sf").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docStep = docs.agg(max("doc_id")).head().getLong(0) + 1L

    /** Deterministic per-(doc, replica) salt token spliced in every 4th
      * word: kills ALL accidental shingle overlap (within and across
      * replicas) while keeping word counts/lengths realistic. */
    def salted(i: Int) = {
      val salt = concat(lit("s"),
        pmod(col("doc_id") * 1103515245L + lit(i.toLong * 7919L),
          lit(999983L)).cast("string"))
      array_join(
        transform(split(col("text"), " "),
          (w, j) => when(j % 4 === 3, concat(w, lit(" "), salt))
            .otherwise(w)), " ")
    }

    if (mode == "clone") {
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
    } else {
      val base = (0 until mult).map { i =>
        docs.select(
          (col("doc_id") + lit(i * docStep)).as("doc_id"),
          salted(i).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
      // planted twins: doc_id % 50 == 0 gains a near-dup (one token
      // appended) with ids in a disjoint range above mult*docStep
      val twins = base
        .filter(col("doc_id") % 50 === 0)
        .select(
          (col("doc_id") + lit(mult.toLong * docStep)).as("doc_id"),
          concat(col("text"), lit(" twinmark")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      base.unionAll(twins)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$dst/documents.parquet")
    }

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embStep = emb.agg(max("vec_id")).head().getLong(0) + 1L
    (0 until mult).map { i =>
      val vec =
        if (mode == "clone") col("embedding")
        else transform(col("embedding"),
          (x, j) => (x * (lit(1.0f) +
            (pmod(col("vec_id") * 31L + j.cast("long") * 17L +
              lit(i.toLong * 7L), lit(13L)) - lit(6L)).cast("float")
              / lit(200.0f))).cast("float"))
      emb.select(
        (col("vec_id") + lit(i * embStep)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.reduce(_ unionAll _)
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
