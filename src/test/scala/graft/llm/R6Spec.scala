package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Round-6 operator tests: bigram LM scoring, int8 scalar-quantization
  * ANN, SemDeDup semantic dedup, and the IntVecDot kernel. */
class R6Spec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private def emb = sf("sf0.001", "embeddings")

  // ---- IntVecDot kernel -------------------------------------------------

  test("intVecDot: exact integer dot, equals the HOF form, null-safe") {
    val df = Seq(
      (Seq(1, -2, 3), Seq(4, 5, 6)),
      (Seq(127, 127, 127), Seq(127, 127, 127)),
      (Seq.empty[Int], Seq.empty[Int])
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.intVecDot(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === Seq(1L * 4 - 2 * 5 + 3 * 6, 3L * 127 * 127, 0L))
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("long") * y.cast("long")), lit(0L), _ + _)).as[Long].collect()
    assert(got.toSeq === hof.toSeq)
    val withNull = Seq((Option.empty[Seq[Int]], Option(Seq(1)))).toDF("a", "b")
    assert(withNull.select(VectorFunctions.intVecDot(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  // ---- SQ8 ANN ----------------------------------------------------------

  test("sqEncode: codes bounded to [-127,127], max component hits 127, zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.sqEncode(df, "embedding", "vec_id")
      .orderBy("neighbor_id")
      .select("neighbor_codes", "neighbor_norm")
      .as[(Seq[Int], Double)].collect()
    assert(out(0)._1 === Seq(64, -127, 32)) // round(0.5*127)=64, round(.25*127)=31.75->32
    assert(out(0)._1.forall(c => c >= -127 && c <= 127))
    assert(out(1)._1 === Seq(0, 0, 0) && out(1)._2 === 0.0)
  }

  test("sqTopK: planted twins at rank 1; top-10 recall vs brute force stays high") {
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), v => v + (v * lit(0.001f))).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val queries = emb.filter(col("vec_id") < 20)
    val sq = Similarity.sqTopK(corpus, queries, "embedding", "vec_id", 10)
    val top1 = sq.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert((0L until 20L).forall(q => top1.get(q).contains(q + 100000L)),
      s"twins not all rank-1: $top1")
    // int8 quantization should preserve most of the exact top-10
    val brute = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", 10)
    val hits = sq.select("query_id", "neighbor_id")
      .join(brute.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= 140, s"sq top-10 recall vs brute: $hits/200") // >= 70%
  }

  // ---- bigram LM scoring ------------------------------------------------

  test("lmScore: hand-computed counts, backoff, and surprisal bits on a toy corpus") {
    // train: "a b a b" + "a c"  ->  c2: (a,b)=2 (b,a)=1 (a,c)=1
    //   c1: a=3 b=1 ; unigrams a=3 b=2 c=1 ; N=6 V=3 ; S=10^9
    val train = Seq((0L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = LmScore.train(train, "text")
    assert(model.vocab === 3L && model.tokens === 6L)
    assert(model.scale === LmScore.MaxScale)
    val c2 = model.bigrams.as[(String, String, Long)].collect().toSet
    assert(c2 === Set(("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L)))
    val c1 = model.contexts.as[(String, Long)].collect().toSet
    assert(c1 === Set(("a", 3L), ("b", 1L)))

    // score "a b z":
    //  (a,b) seen:   p = 2S div 3 = 666666666, bits = len(bin(S div p = 1))-1 = 0
    //  (b,z) unseen: p = (2*((1*S) div 9)) div 5 = 44444444
    //                bits = len(bin(S div p = 22))-1 = 4
    //  and "z": single token -> no bigrams -> zeros
    val scored = LmScore.score(
        Seq((1L, "a b z"), (9L, "z")).toDF("doc_id", "text"),
        "text", "doc_id", model)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(scored(0) === ((1L, 2L, 666666666L + 44444444L, 4L)))
    assert(scored(1) === ((9L, 0L, 0L, 0L)))
  }

  test("lmScore: in-distribution text scores more typical than gibberish") {
    val docs = sf("sf0.001", "documents")
    val model = LmScore.train(docs, "text")
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzq qqz xqx zxz qzq xzx zqz qxq zzx xzz")).toDF("doc_id", "text")
    val out = LmScore.score(probe, "text", "doc_id", model)
      .orderBy("doc_id")
      .select(col("sum_bits").cast("double") / col("n_bigrams"))
      .as[Double].collect()
    assert(out(0) < out(1), s"mean surprisal: natural ${out(0)} vs gibberish ${out(1)}")
  }

  // ---- semantic dedup ---------------------------------------------------

  test("semanticDedup: within-cluster copies drop to the min id; distinct docs keep") {
    // two well-separated clusters on orthogonal axes; ids 1,2,3 are
    // near-copies along +x (cos~1), ids 10,11 along +y; id 20 diagonal
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f)),
      (3L, Seq(1.01f, -0.01f, 0.0f)),
      (10L, Seq(0.0f, 1.0f, 0.0f)),
      (11L, Seq(0.01f, 0.98f, 0.0f)),
      (20L, Seq(0.7f, 0.7f, 0.1f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val out = Dedup.semanticDedup(vecs, "embedding", "vec_id", centroids, 0.95)
      .orderBy("id")
      .select("id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 && byId(10L)._3, "cluster minima must keep")
    assert(byId(2L)._2 === Some(1L) && byId(3L)._2 === Some(1L))
    assert(byId(11L)._2 === Some(10L))
    assert(byId(20L)._3, "diagonal doc is distinct in its cluster")
  }

  test("semanticDedupIncremental: copies drop to corpus survivor, batch-internal dups to the earlier id, fresh keeps") {
    val centroids = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (10L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val corpusIndexed = KMeans.assign(corpus, "embedding", centroids)
    val batch = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),   // copy of corpus 1 -> dup_of 1
      (101L, Seq(0.0f, 0.99f, 0.1f)),  // near corpus 10  -> dup_of 10
      (102L, Seq(0.6f, 0.75f, 0.0f)),  // fresh (y cell, cos to 10 ~0.78)
      (103L, Seq(0.6f, 0.75f, 0.0f))   // copy of batch 102 -> dup_of 102
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupIncremental(corpusIndexed, batch,
        "embedding", "vec_id", centroids, 0.95)
      .select("id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(100L)._2 === Some(1L) && !out(100L)._3)
    assert(out(101L)._2 === Some(10L) && !out(101L)._3)
    assert(out(102L)._3, s"fresh batch doc must keep: ${out(102L)}")
    assert(out(103L)._2 === Some(102L) && !out(103L)._3)
    assert(out.size === 4, "one verdict row per batch doc")
  }

  test("semanticDedup: zero-norm embeddings neither drop others nor drop themselves") {
    // id 0 is a failed embed (all-zero): dot(0, x) = 0 >= t·0·‖x‖ holds at
    // any threshold, so without the norm guard the low-id zero vector
    // would swallow its entire cluster
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f)),  // zero-norm, lowest id, x cell (tie -> cid 0)
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f))   // second zero vector: not a dup of id 0 either
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val out = Dedup.semanticDedup(vecs, "embedding", "vec_id", centroids, 0.95)
      .select("id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._3 && out(0L)._2.isEmpty, s"zero vector must keep: ${out(0L)}")
    assert(out(3L)._3 && out(3L)._2.isEmpty, s"zero vectors must not pair: ${out(3L)}")
    assert(out(1L)._3, "real cluster min still keeps")
    assert(out(2L)._2 === Some(1L), "real near-dup still drops to the real min id")

    // incremental: a zero-norm corpus row must not swallow the batch
    val corpusIndexed = KMeans.assign(
      Seq((0L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      "embedding", centroids)
    val batch = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val inc = Dedup.semanticDedupIncremental(corpusIndexed, batch,
        "embedding", "vec_id", centroids, 0.95)
      .select("id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
    assert(inc.toSeq === Seq((100L, None, true)))
  }

  test("semanticDedup: no cartesian product in the executed plan") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val vecs = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val plan = Dedup.semanticDedup(vecs, "embedding", "vec_id", centroids, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan)
  }
}
