package graft.tools

import org.apache.spark.sql.functions._

/** Round-17 organic-corpus slope probe (r16 verdict "What's missing
  * #4"): every previous 1×-vs-10× row used the MakeSf CLONE fixture,
  * which SCALING.md itself flags as degenerate for dedup/pair
  * workloads — only 5 vowel rotations exist, so at ×10 every doc sits
  * in an exact-duplicate pair and the BPE dict is identical. This
  * probe re-measures the families that distorts on the ORGANIC
  * fixture (`MakeSf mode=organic`): per-(doc, replica) salted text —
  * no two docs anywhere share shingles by construction — plus a
  * PLANTED near-dup twin for every doc_id % 50 == 0, so the true pair
  * count is known and reported alongside wall-clock (the honest
  * pair-count column).
  *
  * Families (the r16 verdict's list):
  *  - minhash near-dup pairs  (candidate volume honesty)
  *  - containment pairs       (prefix-filter volume honesty)
  *  - cc_store                (closure + delta-install on REAL pairs)
  *  - ann ivfpq retrain       (distinct vectors, not repeat-vector cells)
  *  - forget_docs             (six-store build + erasure + audit)
  *
  * Usage: runMain graft.tools.ProbeR17 [organic1xDir] [organic10xDir]
  * (build both first:
  *   runMain graft.tools.MakeSf /root/testdata/sf0.1 /tmp/org1 1 organic
  *   runMain graft.tools.MakeSf /root/testdata/sf0.1 /tmp/org10 10 organic) */
object ProbeR17 {
  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      "1x" -> args.lift(0).getOrElse("/tmp/graft_org1"),
      "10x" -> args.lift(1).getOrElse("/tmp/graft_org10"))
    val spark = graft.core.GraftSession.builder("local[32]", Some(32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.{ChunkStore, Dedup, Forget, IvfPq, MinHashIndex}
    import graft.operators.{ConnectedComponents, EdgeStore, LabelStore,
      SampleStore, TopKStore}

    // two passes over both scales in one JVM: pass 1 absorbs
    // JIT/codegen (the 1×-first ordering otherwise bills ALL warmup to
    // the 1× rows and the slope reads upside down); pass 2 is the
    // reported number, warm at both scales.
    for (pass <- 1 to 2; (tag0, dir) <- dirs) {
      val tag = s"p${pass}_$tag0"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val planted = docs.filter(col("doc_id") % 50 === 0).count() / 2

      // ---- minhash near-dup pairs ----------------------------------------
      val (mhPairs, tMh) = timed {
        Dedup.minhashNearDupPairs(docs, "text", "doc_id",
          jaccardThreshold = 0.8).count()
      }
      println(f"[probe17/$tag] minhash: $nDocs%d docs, $mhPairs%d pairs " +
        f"($planted%d planted twins), $tMh%.1f s")

      // ---- containment pairs ---------------------------------------------
      val (cnPairs, tCn) = timed {
        Dedup.containmentPairs(docs, "text", "doc_id",
          threshold = 0.9).count()
      }
      println(f"[probe17/$tag] containment: $cnPairs%d pairs, $tCn%.1f s")

      // ---- cc_store: closure from REAL pairs + delta install -------------
      val (ccInfo, tCc) = timed {
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        val fresh = docs.filter(col("doc_id") % 10 === 0)
        val oldPairs = Dedup.minhashNearDupPairs(corpus, "text", "doc_id",
          jaccardThreshold = 0.8)
        val path = java.nio.file.Files
          .createTempDirectory(s"graft_p17cc_${tag}_").toString
        LabelStore.write(ConnectedComponents.run(oldPairs, "id_a", "id_b"),
          path, nBuckets = 16)
        val batchPairs = Dedup.minhashNearDupPairsIncremental(
          fresh, corpus, "text", "doc_id", jaccardThreshold = 0.8)
        LabelStore.applyStreamBatch(spark, path, batchPairs, "id_a", "id_b", 0L)
        (LabelStore.read(spark, path).count(), batchPairs.count())
      }
      println(f"[probe17/$tag] cc_store: ${ccInfo._1}%d labeled nodes, " +
        f"${ccInfo._2}%d batch pairs, $tCc%.1f s")

      // ---- ann ivfpq retrain (distinct vectors) ---------------------------
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val (nVec, tRt) = timed {
        val a = emb.filter(col("vec_id") % 2 === 0)
          .select("vec_id", "embedding")
        val b = emb.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"),
            transform(col("embedding"), x => x + lit(2.0f)).as("embedding"))
        val all = a.unionByName(b)
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft_p17pq_${tag}_").toString
        IvfPq.write(a, "embedding", "vec_id", idx, nCells = 8, m = 8, k = 16)
        IvfPq.appendBatch(b, "embedding", "vec_id", idx, batchId = 0L)
        IvfPq.retrainFrom(all, "embedding", "vec_id", idx,
          nCells = 8, m = 8, k = 16)
        spark.read.parquet(idx).count()
      }
      println(f"[probe17/$tag] ivfpq_retrain: $nVec%d vectors, $tRt%.1f s")

      // ---- forget_docs: six-store build + erasure + audit -----------------
      val (leaks, tFg) = timed {
        val ids = docs.select("doc_id")
        val pairs = ids.as("a").join(ids.as("b"),
            col("b.doc_id") === col("a.doc_id") + 1 &&
              col("a.doc_id") % 10 =!= 9)
          .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
        val base = java.nio.file.Files
          .createTempDirectory(s"graft_p17fg_${tag}_").toString
        val (chP, mhP, edP, lbP, tkP, smP) = (s"$base/chunk", s"$base/mh",
          s"$base/edge", s"$base/label", s"$base/topk", s"$base/sample")
        ChunkStore.write(docs.select("doc_id", "text"), "text", "doc_id",
          chP, nBuckets = 16)
        MinHashIndex.write(docs.select("doc_id", "text"), "text", "doc_id",
          mhP, nBuckets = 16)
        EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v", Some("w"),
          edP, nBuckets = 8)
        LabelStore.write(ConnectedComponents.run(pairs, "u", "v"), lbP,
          nBuckets = 8)
        TopKStore.write(docs, Seq.empty, "doc_id", "source", tkP, m = 50)
        SampleStore.write(docs, Seq.empty, "doc_id", "source", smP,
          kMax = 40)
        val dropped = ids.filter(col("doc_id") % 9 === 4)
        val stores = Forget.Stores(
          chunk = Some(chP), minhash = Some(mhP), edge = Some(edP),
          label = Some(Forget.LabelTarget(lbP, pairs, "u", "v")),
          topk = Some(tkP), sample = Some(smP))
        Forget.forgetDocs(spark, dropped, "doc_id", stores,
          chunkCompact = true)
        Forget.audit(spark, dropped, "doc_id", stores)
          .agg(sum("n_dropped")).head().getLong(0)
      }
      println(f"[probe17/$tag] forget_docs: leaks=$leaks%d, $tFg%.1f s")
    }
    spark.stop()
  }
}
