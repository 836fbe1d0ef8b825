package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 wave-3 specs: exact histogram quantiles / top-fraction
  * selection (Selection), the dense global ordinal (Sampling), and the
  * token-bounded shard export (Packing). Every assertion is against a
  * driver-side brute-force reference computed from the same rows. */
class SelectionSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private lazy val docs = sf("sf0.001", "documents")

  /** Crafted skewed corpus: heavy tie mass at 10, a spread head. */
  private lazy val scoresDf = {
    val vals = Seq.fill(40)(10L) ++ (1L to 30L) ++ Seq(100L, 100L, 250L)
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "s")
  }
  private lazy val sortedVals = scoresDf.select("s").as[Long].collect().sorted

  // ---- exactQuantiles -------------------------------------------------

  test("exactQuantiles matches the sorted-array reference on every per-mille point") {
    val ps = Seq(1, 100, 250, 500, 750, 900, 999, 1000)
    val got = Selection.exactQuantiles(scoresDf, "s", ps)
      .select("p_mille", "target_rank", "q_value", "approx_ok")
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    val n = sortedVals.length.toLong
    assert(got.map(_._1).toSeq === ps.sorted)
    got.foreach { case (p, rank, q, ok) =>
      val expRank = (p.toLong * n + 999L) / 1000L
      assert(rank === expRank, s"p=$p rank")
      // reference: the rank-th smallest (1-based)
      assert(q === sortedVals((expRank - 1).toInt), s"p=$p quantile")
      assert(ok, s"p=$p approx sketch outside its rank guarantee")
    }
  }

  test("exactQuantiles: p=1000 is the max, tie mass resolves to the tied value") {
    val got = Selection.exactQuantiles(scoresDf, "s", Seq(500, 1000))
      .select("p_mille", "q_value").as[(Int, Long)].collect().toMap
    assert(got(1000) === sortedVals.last)
    // rank ceil(0.5·73)=37 lands inside the 40-deep tie block at 10
    assert(got(500) === 10L)
  }

  test("exactQuantiles on an empty frame returns no rows") {
    val empty = scoresDf.filter(col("s") < 0)
    assert(Selection.exactQuantiles(empty, "s", Seq(500)).count() === 0L)
  }

  // ---- topFractionThreshold / keepTopFraction -------------------------

  test("topFractionThreshold: highest threshold keeping >= k, ties inclusive") {
    val n = sortedVals.length.toLong
    for (keep <- Seq(10, 250, 500, 900, 1000)) {
      val (t, nOut, kept) = Selection.topFractionThreshold(scoresDf, "s", keep)
      val k = (keep.toLong * n + 999L) / 1000L
      assert(nOut === n)
      val cntGE = sortedVals.count(_ >= t).toLong
      assert(kept === cntGE)
      assert(kept >= k, s"keep=$keep kept fewer than k")
      // maximality: any higher existing threshold keeps < k
      sortedVals.filter(_ > t).headOption.foreach { t2 =>
        assert(sortedVals.count(_ >= t2) < k, s"keep=$keep threshold not maximal")
      }
    }
  }

  test("keepTopFraction keeps exactly the >= threshold rows; keep=1000 keeps all") {
    val (t, _, _) = Selection.topFractionThreshold(scoresDf, "s", 250)
    val kept = Selection.keepTopFraction(scoresDf, "s", 250)
      .select("id").as[Long].collect().toSet
    val exp = scoresDf.filter(col("s") >= t).select("id").as[Long].collect().toSet
    assert(kept === exp)
    assert(Selection.keepTopFraction(scoresDf, "s", 1000).count() ===
      scoresDf.count())
  }

  test("keepTopFraction on an empty frame is the empty frame") {
    val empty = scoresDf.filter(col("s") < 0)
    assert(Selection.keepTopFraction(empty, "s", 500).count() === 0L)
  }

  // ---- groupQuantileBuckets -------------------------------------------

  test("groupQuantileBuckets: each group is cut by ITS OWN distribution") {
    // group a: scores 1..30; group b: scores 101..130 — a global cut
    // would put all of b in the head; per-group terciles split both 10/10/10
    val df = ((1L to 30L).map(v => ("a", v)) ++ (101L to 130L).map(v => ("b", v)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "s")
    // with n=30, ceil(333·30/1000)=10 and ceil(666·30/1000)=20 — the
    // terciles land exactly on 10/10/10 per group
    val got = Selection.groupQuantileBuckets(df, "g", "s", Seq(333, 666))
    val counts = got.groupBy("g", "bucket").count()
      .as[(String, Int, Long)].collect()
      .map { case (g, b, c) => (g, b) -> c }.toMap
    for (g <- Seq("a", "b"); b <- 0 to 2)
      assert(counts((g, b)) === 10L, s"group $g bucket $b")
    // and the buckets respect each group's own values
    val bOf = got.select("id", "bucket").as[(Long, Int)].collect().toMap
    val rows = df.as[(Long, String, Long)].collect()
    rows.foreach { case (id, g, v) =>
      val groupVals = rows.filter(_._2 == g).map(_._3).sorted
      val q1 = groupVals((groupVals.length * 333 + 999) / 1000 - 1)
      val q2 = groupVals((groupVals.length * 666 + 999) / 1000 - 1)
      val exp = (if (v > q1) 1 else 0) + (if (v > q2) 1 else 0)
      assert(bOf(id) === exp, s"id=$id g=$g v=$v")
    }
  }

  test("groupQuantileBuckets matches a driver reference on the real corpus") {
    val scored = docs.select(col("doc_id"), col("lang"),
      TextStats.wsTokenCount(col("text")).cast("long").as("s"))
    val got = Selection.groupQuantileBuckets(scored, "lang", "s", Seq(333, 667))
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    val rows = scored.as[(Long, String, Long)].collect()
    val byLang = rows.groupBy(_._2)
    rows.foreach { case (id, lang, v) =>
      val vs = byLang(lang).map(_._3).sorted
      val q1 = vs((vs.length * 333 + 999) / 1000 - 1)
      val q2 = vs((vs.length * 667 + 999) / 1000 - 1)
      val exp = (if (v > q1) 1 else 0) + (if (v > q2) 1 else 0)
      assert(got(id) === exp, s"doc $id lang $lang score $v")
    }
  }

  // ---- globalOrdinal --------------------------------------------------

  test("globalOrdinal: a dense 0..n-1 permutation consistent with the shuffle order") {
    val ord = Sampling.globalOrdinal(docs.select("doc_id"), "doc_id", 7L, 8)
    val rows = ord.select("doc_id", "shard", "pos", "global_pos")
      .as[(Long, Long, Long, Long)].collect()
    val n = docs.count()
    assert(rows.length.toLong === n)
    assert(rows.map(_._4).sorted.toSeq === (0L until n).toSeq, "not dense")
    // global order = (shard, per-shard pos): sorting by (shard, pos)
    // must enumerate global_pos 0..n-1
    assert(rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq === (0L until n).toSeq)
  }

  test("globalOrdinal is reproducible; reseeding permutes independently") {
    val a = Sampling.globalOrdinal(docs.select("doc_id"), "doc_id", 7L, 8)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().sorted.toSeq
    val b = Sampling.globalOrdinal(docs.select("doc_id"), "doc_id", 7L, 8)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().sorted.toSeq
    val c = Sampling.globalOrdinal(docs.select("doc_id"), "doc_id", 8L, 8)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    assert(a !== c)
  }

  // ---- exportShards ---------------------------------------------------

  test("exportShards: manifest == pack arithmetic; files round-trip byte-exact") {
    val d = docs.select(col("doc_id"), col("text"),
      TextStats.wsTokenCount(col("text")).cast("long").as("n_toks"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sel_shards_").toString
    val manifest = Packing.exportShards(d, "doc_id", "text", "n_toks",
      maxTokens = 1024L, nShards = 4, path = tmp)
      .select("shard", "bin", "n_docs", "n_tokens", "min_id", "max_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))

    // reference: packBins aggregated driver-side
    val ref = Packing.packBins(d, "doc_id", "n_toks", 1024L, 4)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .select("shard", "bin", "n_docs", "n_tokens", "min_id", "max_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(manifest.toSeq === ref.toSeq)

    // read-back texts byte-exact vs source
    val back = sp.read.schema("doc_id LONG, text STRING, n_tokens LONG").json(tmp)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val src = d.select("doc_id", "text").as[(Long, String)].collect()
    assert(back.size === src.length)
    src.foreach { case (id, t) => assert(back(id) === t, s"doc $id text drift") }
  }

  test("exportShards: every bin respects maxTokens up to one-doc overflow") {
    val d = docs.select(col("doc_id"), col("text"),
      TextStats.wsTokenCount(col("text")).cast("long").as("n_toks"))
    val maxDoc = d.agg(max("n_toks")).as[Long].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_sel_shards2_").toString
    val manifest = Packing.exportShards(d, "doc_id", "text", "n_toks",
      maxTokens = 512L, nShards = 4, path = tmp)
    val worst = manifest.agg(max("n_tokens")).as[Long].head()
    // greedy contiguous fill: a bin holds < maxTokens of prior fill plus
    // at most one overflowing document
    assert(worst <= 512L + maxDoc, s"bin of $worst tokens exceeds 512+$maxDoc")
  }
}
