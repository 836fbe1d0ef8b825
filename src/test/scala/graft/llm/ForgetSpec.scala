package graft.llm

import graft.SparkSpec
import graft.operators.{ConnectedComponents, EdgeStore, LabelStore,
  SampleStore, TopKStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Forget.forgetDocs: one call erases a doc set across the whole store
  * family — including the compact-first path for stores holding live
  * slots — and a re-run is a harmless no-op. The sf-scale end-to-end
  * serve check lives in the `forget_docs` gate; this spec pins the
  * sequencing corners on a hand fixture. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs() = (1L to 12L).map(i =>
    (i, s"document number $i with plenty of words to shingle and chunk " +
      s"into content addressed pieces of its very own kind $i", s"p${i % 3}"))
    .toDF("doc_id", "text", "part")

  test("forgetDocs sequences every store; live slots are compacted first; re-run no-ops") {
    val docs = mkDocs()
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("u", "v")
    val base = Files.createTempDirectory("graft_forget_spec_").toString
    val (chP, mhP, edP, lbP, tkP, smP) = (s"$base/ch", s"$base/mh",
      s"$base/ed", s"$base/lb", s"$base/tk", s"$base/sm")
    ChunkStore.write(docs, "text", "doc_id", chP, nBuckets = 4)
    MinHashIndex.write(docs, "text", "doc_id", mhP, nBuckets = 4)
    EdgeStore.write(pairs.withColumn("w", lit(1L)), "u", "v", Some("w"),
      edP, nBuckets = 4)
    // leave LIVE slots on the graph stores: forgetDocs must compact
    // them first (dropNodes refuses otherwise)
    EdgeStore.appendBatch(Seq((12L, 1L, 1L)).toDF("u", "v", "w"),
      "u", "v", Some("w"), edP, nBuckets = 4, batchId = 0L)
    LabelStore.write(ConnectedComponents.run(pairs, "u", "v"), lbP,
      nBuckets = 4)
    LabelStore.applyBatch(spark, lbP, Seq((12L, 1L)).toDF("u", "v"),
      "u", "v", runId = Some("backfill-z"))
    TopKStore.write(docs, Seq.empty, "doc_id", "part", tkP, m = 10)
    SampleStore.write(docs, Seq.empty, "doc_id", "part", smP, kMax = 10)
    val allPairs = pairs.unionByName(Seq((12L, 1L)).toDF("u", "v"))

    val dropped = Seq(4L, 9L)
    val report = Forget.forgetDocs(spark, dropped.toDF("doc_id"), "doc_id",
      Forget.Stores(chunk = Some(chP), minhash = Some(mhP),
        edge = Some(edP),
        label = Some(Forget.LabelTarget(lbP, allPairs, "u", "v")),
        topk = Some(tkP), sample = Some(smP)))
    assert(report.removed("edge").exists(_ > 0L))
    assert(report.removed("chunk").exists(_ > 0L))

    def dropless(ids: Seq[Long]): Unit =
      assert(ids.toSet.intersect(dropped.toSet).isEmpty, ids.toString)
    val served = ChunkStore.reconstruct(spark, chP)
      .select("doc_id").as[Long].collect().toSeq
    dropless(served)
    assert(served.toSet === (1L to 12L).toSet -- dropped)
    val edges = EdgeStore.read(spark, edP)
      .select("src", "dst").as[(Long, Long)].collect().toSeq
    dropless(edges.flatMap(e => Seq(e._1, e._2)))
    // ring 1-..-12-1 minus nodes 4, 9: edges touching them gone
    assert(edges.toSet === (1L to 12L).map(i => (i, i % 12 + 1))
      .filterNot(e => dropped.contains(e._1) || dropped.contains(e._2))
      .toSet)
    val labels = LabelStore.read(spark, lbP)
      .as[(Long, Long)].collect().toSeq
    dropless(labels.flatMap(l => Seq(l._1, l._2)))
    // the ring splits at the two holes: {5..8} labeled 5, {10..12,1..3}
    // labeled 1 (12-1 edge from the folded batch survives)
    assert(labels.toMap === ((5L to 8L).map(_ -> 5L) ++
      (10L to 12L).map(_ -> 1L) ++ (1L to 3L).map(_ -> 1L)).toMap)
    val topkVals = TopKStore.topK(spark, tkP, Seq.empty, k = 100)
      .select("value").as[String].collect().toSeq
    dropless(topkVals.map(_.toLong))
    assert(topkVals.map(_.toLong).toSet === (1L to 12L).toSet -- dropped)
    val sampleKeys = SampleStore.sample(spark, smP, Seq.empty, k = 10)
      .select("key").as[String].collect().toSeq
    dropless(sampleKeys.map(_.toLong))
    // minhash physically purged, not only hidden
    val mhIds = spark.read.parquet(s"$mhP/sets").select("id")
      .unionByName(spark.read.parquet(s"$mhP/bands").select("id"))
      .as[Long].collect().toSeq
    dropless(mhIds)

    // re-run: idempotent for already-erased ids (every step no-ops or
    // harmlessly re-tombstones); served state unchanged
    Forget.forgetDocs(spark, dropped.toDF("doc_id"), "doc_id",
      Forget.Stores(chunk = Some(chP), minhash = Some(mhP),
        edge = Some(edP),
        label = Some(Forget.LabelTarget(lbP, allPairs, "u", "v")),
        topk = Some(tkP), sample = Some(smP)))
    assert(ChunkStore.reconstruct(spark, chP)
      .select("doc_id").as[Long].collect().toSet ===
      (1L to 12L).toSet -- dropped)
    assert(EdgeStore.read(spark, edP)
      .select("src", "dst").as[(Long, Long)].collect().toSet ===
      edges.toSet)
  }

  test("forgetDocs physically purges the four candidate/vector indexes in one sequence") {
    val docs = mkDocs()
    val rnd = new scala.util.Random(7L)
    val vecs = (1L to 12L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat()))).toDF("vec_id", "vec")
    val base = Files.createTempDirectory("graft_forget_idx_").toString
    val (lxP, cnP, ivP, pqP) = (s"$base/lx", s"$base/cn", s"$base/iv",
      s"$base/pq")
    Retrieval.writeIndex(docs, "text", "doc_id", lxP, nBuckets = 4)
    ContainIndex.write(docs, "text", "doc_id", cnP, threshold = 0.8,
      shingleN = 3, nBuckets = 4)
    IvfIndex.write(vecs, "vec", "vec_id", ivP, nCells = 2)
    IvfPq.write(vecs, "vec", "vec_id", pqP, nCells = 2, m = 2, k = 4,
      iters = 2)
    val dropped = Seq(4L, 9L)
    Forget.forgetDocs(spark, dropped.toDF("doc_id"), "doc_id",
      Forget.Stores(lexical = Some(lxP), contain = Some(cnP),
        ivf = Some(ivP), ivfPq = Some(pqP)))
    // tombstones cleared AND rows physically gone — a takedown must not
    // depend on serve-time exclusion staying in place forever
    def ids(df: org.apache.spark.sql.DataFrame, c: String): Set[Long] =
      df.select(col(c).cast("long")).distinct().as[Long].collect().toSet
    val lexIds = ids(spark.read.parquet(lxP), "doc_id")
    val cnIds = ids(spark.read.parquet(s"$cnP/post"), "id") ++
      ids(spark.read.parquet(s"$cnP/sets"), "id") ++
      ids(spark.read.parquet(s"$cnP/pref"), "id")
    val ivIds = ids(spark.read.parquet(ivP), "neighbor_id")
    val pqIds = ids(spark.read.parquet(pqP), "id")
    for ((name, got) <- Seq("lexical" -> lexIds, "contain" -> cnIds,
        "ivf" -> ivIds, "ivfpq" -> pqIds)) {
      assert(got.intersect(dropped.toSet).isEmpty,
        s"$name still physically holds a dropped id")
      assert(got === (1L to 12L).toSet -- dropped,
        s"$name must keep every survivor, got $got")
    }
    assert(Tombstones.readOpt(spark, lxP).isEmpty &&
      Tombstones.readOpt(spark, cnP).isEmpty &&
      Tombstones.readOpt(spark, ivP).isEmpty &&
      Tombstones.readOpt(spark, pqP).isEmpty,
      "purge compacts must clear the applied markers")
    // the compliance audit reports the same physical truth
    val audit = Forget.audit(spark, dropped.toDF("doc_id"), "doc_id",
      Forget.Stores(lexical = Some(lxP), contain = Some(cnP),
        ivf = Some(ivP), ivfPq = Some(pqP)))
      .as[(String, Long, Long)].collect().toSeq
    assert(audit === Seq(("contain", 10L, 0L), ("ivf", 10L, 0L),
      ("ivfpq", 10L, 0L), ("lexical", 10L, 0L)), audit.toString)
  }

  test("forgetDocs rebuilds declared Bloom/CMS sketches from the surviving corpus at a fresh geometry") {
    import graft.operators.{BloomStore, CmsStore}
    val docs = mkDocs()
    val base = Files.createTempDirectory("graft_forget_sk_").toString
    val (blP, cmP) = (s"$base/bl", s"$base/cm")
    BloomStore.write(docs, "doc_id", "part", blP, depth = 3, width = 64)
    CmsStore.write(docs, "doc_id", "part", cmP, depth = 3, width = 8)
    val report = Forget.forgetDocs(spark, Seq(4L, 9L).toDF("doc_id"),
      "doc_id",
      Forget.Stores(
        bloom = Some(Forget.SketchTarget(blP, docs, "doc_id", "part",
          depth = 3, width = 256)),
        cms = Some(Forget.SketchTarget(cmP, docs, "doc_id", "part",
          depth = 3, width = 32))))
    assert(report.removed("bloom").isDefined &&
      report.removed("cms").isDefined)
    // fresh geometry installed atomically on both
    assert(BloomStore.readMeta(spark, blP) === ((3, 256)))
    assert(CmsStore.readMeta(spark, cmP) === ((3, 32)))
    // the contract that survives any geometry: no false negatives on
    // surviving keys, and CMS estimates upper-bound true counts
    val probes = (1L to 12L).map(i => Tuple1(i)).toDF("k")
    val fn = BloomStore.mightContain(spark, blP, probes, "k")
      .filter(!col("might_contain"))
      .select(col("key").cast("long")).as[Long].collect().toSet
    assert(fn.subsetOf(Set(4L, 9L)),
      s"false negative on a surviving key: $fn")
    val est = CmsStore.estimate(spark, cmP, probes, "k")
      .select(col("key").cast("long"), col("est")).as[(Long, Long)]
      .collect().toMap
    ((1L to 12L).toSet -- Set(4L, 9L)).foreach(i =>
      assert(est(i) >= 1L, s"cms underestimates surviving key $i"))
  }
}
