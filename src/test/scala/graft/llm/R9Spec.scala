package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operators: containment dedup, content-defined chunking,
  * source freshness, fixed-point group centroids, temperature mixing. */
class R9Spec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- containment -------------------------------------------------------

  test("containment finds a doc pasted into a longer one; jaccard cannot") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val footer = " one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    val docs = docsDf(Seq((1L, base), (2L, base + footer),
      (3L, "completely different words entirely here now")))
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1 ⊂ 2 at containment 1.0; the reverse direction dilutes below 0.9
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.9)
      .collect()
    assert(jac.isEmpty, "jaccard at the same threshold must miss the inclusion")
  }

  test("containment prefix filter is lossless vs brute force on the corpus") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(120)
    val got = Dedup.containmentPairs(docs, "text", "doc_id", threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all ordered pairs through the same verify arithmetic
    val sets = Dedup.shingleHashSets(docs, "text", "doc_id")
      .filter(size(col("hs")) > 0)
    val a = sets.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val b = sets.select(col("id").as("id_b"), col("hs").as("hs_b"))
    val brute = a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(col("hs_a")).cast("double")).as("c"))
      .filter(col("c") >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
  }

  // ---- content-defined chunking ------------------------------------------

  test("cdc chunks reassemble to the original text (incl. empty and short)") {
    val docs = docsDf(Seq(
      (1L, ""), (2L, "ab"), (3L, "abcd"),
      (4L, "the quick brown fox jumps over the lazy dog repeatedly and often"),
      (5L, "x" * 500)))
    val got = Curation.cdcChunks(docs, "text", "doc_id")
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("chunk_idx"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // empty text yields zero chunks, so doc 1 is absent from the rebuild
    assert(got == want.filter(_._2.nonEmpty))
  }

  test("cdc boundaries are content-local: edits re-synchronize") {
    // same tail text, different heads: chunks resync after the edit, so
    // the two docs share their suffix chunks
    val tail = "in the middle of the corpus there is a long shared run of " +
      "text that should chunk identically on both sides of the edit " +
      "because boundaries depend only on a four character window of content"
    val docs = docsDf(Seq(1L -> ("prefix one " + tail), 2L -> ("a completely different and longer prefix " + tail)))
    val ch = Curation.cdcChunks(docs, "text", "doc_id")
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val shared = ch(1L) intersect ch(2L)
    assert(shared.nonEmpty, "edited docs must share their synchronized suffix chunks")
  }

  test("cdc boundary rate is in the expected band on real text") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val chunks = Curation.cdcChunks(docs, "text", "doc_id").count()
    val chars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
    // divisor 64: expect roughly chars/64 + one tail chunk per doc; allow 3x slack
    val expect = chars / 64.0 + 500
    assert(chunks > expect / 3 && chunks < expect * 3,
      s"chunks=$chunks vs expected ~$expect from $chars chars")
  }

  // ---- source freshness --------------------------------------------------

  test("freshness statuses: pass, warn, error, and empty-source error") {
    import graft.operators.DataQuality.{freshness, FreshnessSource}
    import spark.implicits._
    def tsDf(us: Long*) = us.toSeq.toDF("us")
      .select(timestamp_micros(col("us")).as("loaded_at"))
    val asOf = 1000000000L * 86400L // arbitrary fixed tick (us)
    val day = 86400000000L
    val fresh = tsDf(asOf - day / 2, asOf - day) // newest: half a day old
    val stale = tsDf(asOf - 10 * day)
    val empty = tsDf().filter(lit(false))
    val got = freshness(Seq(
      FreshnessSource("a_pass", fresh, "loaded_at", 86400L, 5 * 86400L),
      FreshnessSource("b_warn", stale, "loaded_at", 86400L, 30 * 86400L),
      FreshnessSource("c_error", stale, "loaded_at", 3600L, 86400L),
      FreshnessSource("d_empty", empty, "loaded_at", 86400L, 86400L)),
      asOfUs = asOf)
      .select("source_name", "age_us", "status")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getString(2)))
    assert(got.toSeq == Seq(
      ("a_pass", Some(day / 2), "pass"),
      ("b_warn", Some(10 * day), "warn"),
      ("c_error", Some(10 * day), "error"),
      ("d_empty", None, "error")))
  }

  // ---- group centroids ---------------------------------------------------

  test("group centroids: exact fixed-point means, order-independent") {
    import spark.implicits._
    val rows = Seq(
      ("g1", Seq(1.5f, -2.25f)), ("g1", Seq(0.5f, -0.25f)),
      ("g1", Seq(1.0f, 1.0f)), ("g2", Seq(-1.0f, 0.125f)))
    val df = rows.toDF("g", "vec")
    val expect = Map( // driver-side same arithmetic
      ("g1", 0L) -> (1500000L + 500000L + 1000000L) / 3,
      ("g1", 1L) -> (-2250000L - 250000L + 1000000L) / 3,
      ("g2", 0L) -> -1000000L,
      ("g2", 1L) -> 125000L)
    for (parts <- Seq(1, 7)) {
      val got = Similarity.groupCentroids(df.repartition(parts), "vec", "g")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  // ---- temperature mixing ------------------------------------------------

  test("temperature mix: targets flatten the head, realized counts exact") {
    import spark.implicits._
    // head source 1600 docs, tail source 100: raw ratio 16x, sqrt ratio 4x
    val docs = ((1 to 1600).map(i => (i.toLong, "head")) ++
      (2001 to 2100).map(i => (i.toLong, "tail"))).toDF("doc_id", "source")
    val budget = 250L
    val got = Sampling.temperatureMix(docs, "doc_id", "source", budget)
    val counts = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_head=40, w_tail=10, total 50: targets 200 and 50
    assert(counts == Map("head" -> 200L, "tail" -> 50L))
    // deterministic: a rerun picks the identical ids
    val ids1 = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.temperatureMix(docs, "doc_id", "source", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("temperature mix: null-source rows are excluded; non-string source fails fast") {
    import spark.implicits._
    val docs = ((1 to 50).map(i => (i.toLong, Some("a"))) ++
      (101 to 150).map(i => (i.toLong, Some("b"))) ++
      (201 to 210).map(i => (i.toLong, None: Option[String])))
      .toDF("doc_id", "source")
    // null-source rows name no mixture component: excluded from both the
    // weights and the output, in both forms
    val exact = Sampling.temperatureMix(docs, "doc_id", "source", 40L)
    assert(exact.filter(col("source").isNull).count() === 0)
    assert(exact.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 20L, "b" -> 20L),
      "targets must be computed over non-null sources only")
    val thr = Sampling.temperatureMixThreshold(docs, "doc_id", "source", 40L)
    assert(thr.filter(col("source").isNull).count() === 0)
    // a non-string source column used to throw mid-collect; now it is a
    // front-door contract failure
    val bad = (1 to 10).map(i => (i.toLong, i.toLong % 3)).toDF("doc_id", "source")
    val ex = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(bad, "doc_id", "source", 5L)
    }
    assert(ex.getMessage.contains("must be STRING"))
  }

  test("prefix-length ceil guard: a one-ulp round-up of t*n cannot shorten the prefix") {
    // 0.07 * 100 = 7.000000000000001 in IEEE double — the raw ceil
    // overshoots to 8 and would cut the prefix one element short (a
    // qualifying containment pair could then be missed; ADVICE r9). The
    // 1e-9 back-off restores the exact required overlap.
    val r = spark.range(1).select(
      ceil(lit(0.07) * lit(100)).cast("int").as("raw"),
      ceil(lit(0.07) * lit(100) - lit(1e-9)).cast("int").as("guarded"))
      .head()
    assert(r.getInt(0) === 8, "the double artifact this guard exists for")
    assert(r.getInt(1) === 7, "guarded ceil must hit the exact integer")
  }

  test("temperature mix keeps whole small sources only at budget >= total weight share") {
    import spark.implicits._
    val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
      (201 to 300).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    // equal sources: equal targets
    val counts = Sampling.temperatureMix(docs, "doc_id", "source", 60L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 30L, "b" -> 30L))
  }

  test("negative sampling: k in-shard negatives, never self, deterministic") {
    import spark.implicits._
    val docs = (1L to 300L).toDF("doc_id")
    val neg = Sampling.negativeSample(docs, "doc_id", k = 3, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(neg.forall { case (id, _, n) => id != n }, "self-negative found")
    val perDoc = neg.groupBy(_._1).map(_._2.length).toSet
    assert(perDoc == Set(3), s"every doc must get exactly k negatives: $perDoc")
    assert(neg.length == 900)
    val again = Sampling.negativeSample(docs, "doc_id", k = 3, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(neg.toSet == again.toSet, "must be deterministic")
    // singleton shards emit nothing rather than a self-pair
    val one = Sampling.negativeSample(Seq(7L).toDF("doc_id"), "doc_id", 2, 1)
    assert(one.count() == 0)
  }

  test("hard negatives: exact duplicates excluded, hardest-first order") {
    import spark.implicits._
    val emb = sf("sf0.001", "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val planted = queries
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val got = Similarity.hardNegatives(emb.unionByName(planted), queries,
      "embedding", "vec_id", k = 5, dupThreshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.forall { case (q, _, n, _) => n != q + 100000L },
      "planted exact duplicate must never appear as a negative")
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sameElements(sorted.map(_._4).sortBy(-(_: Double))),
        "cosines must be non-increasing in rank")
      assert(sorted.forall(_._4 < 0.999))
    }
  }

  test("temperature mix threshold form: zero-shuffle, deterministic, near-target") {
    import spark.implicits._
    val docs = ((1 to 1600).map(i => (i.toLong, "head")) ++
      (2001 to 2100).map(i => (i.toLong, "tail"))).toDF("doc_id", "source")
    val got = Sampling.temperatureMixThreshold(docs, "doc_id", "source", 250L)
    // pure projection + filter: no exchange in the plan
    val plan = got.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!"Exchange \\(\\d+\\)".r.findAllIn(plan).hasNext,
      s"threshold mix must not shuffle:\n${plan.take(1500)}")
    val counts = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets 200/50; binomial-ish concentration — generous 30% band
    assert(math.abs(counts("head") - 200L) <= 60, counts.toString)
    assert(math.abs(counts("tail") - 50L) <= 25, counts.toString)
    // deterministic rerun
    val again = Sampling.temperatureMixThreshold(docs, "doc_id", "source", 250L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  // ---- contamination overlap fraction ------------------------------------

  test("contamination score: exact per-mille, zero-gram docs unflagged") {
    // doc 1: fully contaminated (IS the blocklist text); doc 2: half its
    // grams hit; doc 3: disjoint; doc 4: too short to shingle (0 grams)
    val bench = "alpha bravo charlie delta echo"          // grams: 3
    val docs = docsDf(Seq(
      (1L, bench),
      (2L, "alpha bravo charlie zulu yankee xray whiskey"), // 5 grams, 1 hit
      (3L, "one two three four five six"),
      (4L, "too short")))
    val bl = docsDf(Seq((100L, bench)))
    val got = Curation.contaminationScore(docs, bl, "text", "doc_id",
        shingleN = 3, flagPermille = 300L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 1000L, true),
      (2L, 5L, 1L, 200L, false),
      (3L, 4L, 0L, 0L, false),
      (4L, 0L, 0L, 0L, false)))
  }

  test("contamination score agrees with decontaminate's hit counts") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text").limit(150)
    val bl = docs.filter(pmod(col("doc_id"), lit(20L)) === 0)
    val scored = Curation.contaminationScore(docs, bl, "text", "doc_id")
      .select(col("doc_id"), col("n_contaminated").as("n_s"))
    val counted = Curation.decontaminate(docs, bl, "text", "doc_id")
      .select(col("doc_id"), col("n_contaminated").as("n_c"))
    val diff = scored.join(counted, "doc_id")
      .filter(col("n_s") =!= col("n_c")).count()
    assert(diff == 0L)
  }

  // ---- corpus gram-vocabulary overlap -------------------------------------

  test("corpus overlap: exact counts and per-milles on a known fixture") {
    // A-grams: {abc, bcd} ∪ {xyz grams}; B shares exactly the abc/bcd pair
    val a = docsDf(Seq(
      (2L, "a b c d"),          // grams: "a b c", "b c d"
      (4L, "p q r s")))         // grams: "p q r", "q r s"
    val b = docsDf(Seq(
      (1L, "a b c d"),          // same two grams as doc 2
      (3L, "u v w")))           // gram: "u v w"
    val r = Dedup.corpusGramOverlap(a, b, "text", "doc_id").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 3L, 2L))
    assert(r.getLong(3) == 400L)  // 2/(4+3-2) = 2/5
    assert(r.getLong(4) == 500L)  // 2/4
    assert(r.getLong(5) == 666L)  // floor(2000/3)
  }

  test("corpus overlap: empty sides yield zeros, not DIVIDE_BY_ZERO") {
    val e = docsDf(Seq.empty)
    val d = docsDf(Seq((1L, "a b c d")))
    val r1 = Dedup.corpusGramOverlap(e, d, "text", "doc_id").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == (0L, 2L, 0L))
    assert((r1.getLong(3), r1.getLong(4), r1.getLong(5)) == (0L, 0L, 0L))
    val r2 = Dedup.corpusGramOverlap(e, e, "text", "doc_id").collect()(0)
    assert((r2.getLong(3), r2.getLong(4), r2.getLong(5)) == (0L, 0L, 0L))
  }
}
