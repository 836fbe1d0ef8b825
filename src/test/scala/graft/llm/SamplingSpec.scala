package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private lazy val docs = sf("sf0.001", "documents")

  test("stratifiedHashSample is deterministic and a subset of the input") {
    val a = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 10), defaultPct = 50).select("doc_id")
    val b = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 10), defaultPct = 50).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.exceptAll(docs.select("doc_id")).isEmpty)
  }

  test("per-stratum keep rates land near the configured percentages") {
    val sampled = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 10), defaultPct = 50)
    val total = docs.groupBy("lang").count().withColumnRenamed("count", "n_all")
    val kept = sampled.groupBy("lang").count().withColumnRenamed("count", "n_kept")
    val rates = total.join(kept, Seq("lang"), "left")
      .select(col("lang"),
        (coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_all")).as("r"))
      .as[(String, Double)]
      .collect().toMap
    // md5 buckets are uniform; strata are small (tens to hundreds of
    // docs), so allow wide-but-meaningful bands
    assert(rates("en") < 0.3, s"en kept ${rates("en")}, want ~0.1")
    (rates - "en").foreach { case (lang, r) =>
      assert(r > 0.25 && r < 0.75, s"$lang kept $r, want ~0.5")
    }
  }

  test("rate 0 keeps nothing; rate 100 keeps everything") {
    val none = Sampling.stratifiedHashSample(docs, "doc_id", "lang", Map(), 0)
    val everything = Sampling.stratifiedHashSample(docs, "doc_id", "lang", Map(), 100)
    assert(none.count() === 0L)
    assert(everything.count() === docs.count())
  }

  test("deterministicShuffle: a reproducible permutation with dense per-shard positions") {
    val a = Sampling.deterministicShuffle(docs.select("doc_id"), "doc_id", 7L, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted
    val b = Sampling.deterministicShuffle(docs.select("doc_id"), "doc_id", 7L, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted
    assert(a.toSeq == b.toSeq, "same seed must reproduce the identical shuffle")

    // permutation: every doc exactly once, positions dense 0..n_shard-1
    assert(a.map(_._1).distinct.length == docs.count())
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (0L until rows.length.toLong), s"shard $shard positions not dense")
    }

    // a different seed produces a different order (not a different SET)
    val c = Sampling.deterministicShuffle(docs.select("doc_id"), "doc_id", 8L, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted
    assert(c.map(_._1).toSet == a.map(_._1).toSet)
    assert(c.toSeq != a.toSeq, "re-seeding must yield an independent permutation")
  }

  test("weightedMix: copy counts bracket the weight; epochs dense; deterministic") {
    val docs = (1L to 400L).map(i =>
      (i, if (i <= 200) "up" else if (i <= 300) "down" else "keep"))
      .toDF("doc_id", "src")
    val mix = Sampling.weightedMix(docs, "doc_id", "src",
      Map("up" -> 2.5, "down" -> 0.5))
    val counts = mix.groupBy("doc_id", "src").count()
      .as[(Long, String, Long)].collect()
    val bySrc = counts.groupBy(_._2)
    // up: every doc 2 or 3 copies; down: only 1-copy survivors; keep: exactly 1
    assert(bySrc("up").forall(c => c._3 == 2L || c._3 == 3L))
    assert(bySrc("down").forall(_._3 == 1L))
    assert(bySrc("keep").forall(_._3 == 1L))
    // realized fractions track the design (md5 buckets; 200/100 docs)
    val upThird = bySrc("up").count(_._3 == 3L)
    assert(upThird > 60 && upThird < 140, s"~50% of 'up' expected 3 copies, got $upThird")
    val downKept = bySrc("down").size
    assert(downKept > 25 && downKept < 75, s"~50% of 'down' expected kept, got $downKept")
    // epochs are dense 1..n per doc
    val upDoc = bySrc("up").find(_._3 == 3L).get._1
    val eps = mix.filter(col("doc_id") === upDoc)
      .select("epoch").as[Long].collect().sorted
    assert(eps.toSeq == Seq(1L, 2L, 3L))
    // deterministic: a second run yields the identical multiset
    val again = Sampling.weightedMix(docs, "doc_id", "src",
      Map("up" -> 2.5, "down" -> 0.5))
      .groupBy("doc_id", "src").count().as[(Long, String, Long)].collect()
    assert(again.sorted.toSeq == counts.sorted.toSeq)
  }

  test("tokenBudgetSample: hard budget cap, monotone in budget, deterministic") {
    val docs = (1L to 300L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tokens")
    def run(budget: Long) =
      Sampling.tokenBudgetSample(docs, "doc_id", "n_tokens", budget, nShards = 4)
        .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val small = run(1000L)
    val big = run(4000L)
    // hard cap: the kept token total never exceeds the budget
    assert(small.map(_._2).sum <= 1000L)
    assert(big.map(_._2).sum <= 4000L)
    // shortfall bounded: within nShards * max_doc_tokens of the budget
    assert(big.map(_._2).sum > 4000L - 4 * 47)
    // monotone: a bigger budget keeps a superset
    assert(small.map(_._1).toSet.subsetOf(big.map(_._1).toSet))
    // deterministic
    assert(run(1000L) === small)
  }

  test("topTokens: counts and deterministic tie order on a known corpus") {
    val tiny = Seq("b b a", "a c B").toDF("text").withColumn("id", lit(1L))
    val out = TextStats.topTokens(tiny, "text", 3)
      .as[(String, Long)].collect()
    // lowercased: a=2 b=3(b,b,B) c=1 -> b first, then a, then c
    assert(out === Seq("b" -> 3L, "a" -> 2L, "c" -> 1L))
  }

  test("splitAssign: every doc gets exactly one split, fractions near the config") {
    val out = Sampling.splitAssign(docs, "doc_id", seed = 7L, valPct = 10, testPct = 10)
    assert(out.count() === docs.count())
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.6, s"train frac ${counts("train") / n}")
    assert(counts("val") / n < 0.25 && counts("test") / n < 0.25)
  }

  test("splitAssign: assignment is stable under corpus append") {
    // a doc's split is a pure function of (seed, id): assigning a SUBSET
    // must agree with assigning the full corpus — growing the corpus can
    // never move yesterday's holdout into train
    val full = Sampling.splitAssign(docs, "doc_id", 7L, 10, 10)
      .select("doc_id", "split")
    val subset = Sampling.splitAssign(docs.filter(col("doc_id") < 100), "doc_id", 7L, 10, 10)
      .select("doc_id", "split")
    assert(subset.exceptAll(full.filter(col("doc_id") < 100)).isEmpty)
  }

  test("splitAssign: re-seeding moves documents; bad percentages are rejected") {
    val a = Sampling.splitAssign(docs, "doc_id", 7L, 20, 20).select("doc_id", "split")
    val b = Sampling.splitAssign(docs, "doc_id", 8L, 20, 20).select("doc_id", "split")
    assert(a.exceptAll(b).count() > 0)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", 7L, 60, 50)
    }
  }
}
