package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  // The classic Sennrich (2016) worked example (no end-of-word marker):
  // corpus low×5 lower×2 newest×6 widest×3. Weighted pair counts give
  // (e,s)=9 -> (es,t)=9 -> (l,o)=7 -> (lo,w)=7; then newest=[n,e,w,est]
  // yields a 3-way tie at 6 ((n,e),(e,w),(w,est)) won by (e,w) on the
  // (left,right)-ascending tie-break, and finally (ew,est) beats (n,ew)
  // since 'ew' < 'n'. Cross-derived with tools/bpe_reference.py.
  private val sennrich = Seq(
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))

  private def corpus = sennrich
    .flatMap { case (w, n) => Seq.fill(n)(w) }
    .mkString(" ")

  test("train reproduces the Sennrich worked example, deterministically") {
    val docs = Seq(corpus).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    assert(merges.map { case (r, a, b, f) => (r, a, b, f) } === Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L), // 3-way tie at 6 broken on (left, right) ascending
      (6L, "ew", "est", 6L))) // tie (n,ew) vs (ew,est): 'ew' < 'n'
  }

  test("train stops early when no pair repeats") {
    val docs = Seq("ab cd ef").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 10)
    assert(merges.isEmpty) // every pair occurs once -> freq < 2 -> stop
  }

  test("mergePair is greedy left-to-right and non-chaining: l l l + (l,l) -> [ll, l]") {
    val out = Seq(Seq("l", "l", "l"), Seq("l", "l", "l", "l"))
      .toDF("syms")
      .select(Bpe.mergePair(col("syms"), "l", "l").as("m"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("ll", "l"))
    assert(out(1) === Seq("ll", "ll"))
  }

  test("segment (Column fold) splits a trained word into learned pieces") {
    val docs = Seq(corpus).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val seg = Seq("newest", "lowest", "wider")
      .toDF("tok")
      .select(Bpe.segment(col("tok"), merges).as("pieces"))
      .as[Seq[String]].collect()
    assert(seg(0) === Seq("n", "ewest")) // e+s, es+t, e+w, ew+est in rank order
    assert(seg(1) === Seq("low", "est"))
    assert(seg(2) === Seq("w", "i", "d", "e", "r"))
  }

  test("segment refuses a merge table deep enough to blow up Catalyst") {
    val big = (1 to 129).map(i => (i.toLong, s"a$i", s"b$i", 2L))
    val e = intercept[IllegalArgumentException] {
      Bpe.segment(col("tok"), big)
    }
    assert(e.getMessage.contains("segmentUdf"))
  }

  test("segmentUdf matches the Column fold on every trained-corpus word") {
    val docs = Seq(corpus).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val words = Seq("low", "lower", "newest", "widest", "slowest", "x", "")
      .toDF("tok")
    val both = words.select(
        col("tok"),
        Bpe.segment(col("tok"), merges).as("fold"),
        Bpe.segmentUdf(merges)(col("tok")).as("imp"))
      .as[(String, Seq[String], Seq[String])].collect()
    both.foreach { case (tok, fold, imp) =>
      assert(fold === imp, s"fold vs segmentUdf diverge on '$tok'")
    }
  }

  test("segmentUdf handles a large merge table (plan size stays constant)") {
    // 5k synthetic merges none of which apply, plus the real ones —
    // the working-set probe must skip the dead merges cheaply.
    val docs = Seq(corpus).toDF("text")
    val real = Bpe.train(docs, "text", numMerges = 6)
    val dead = (100 to 5100).map(i => (i.toLong, s"zz$i", s"qq$i", 2L))
    val seg = Seq("newest").toDF("tok")
      .select(Bpe.segmentUdf(real ++ dead)(col("tok")).as("pieces"))
      .as[Seq[String]].head()
    assert(seg === Seq("n", "ewest"))
  }

  test("local (hybrid) and distributed training are bit-identical") {
    // localVocabMax=0 forces the distributed per-round path; the default
    // takes the in-memory incremental path — same merges, same freqs
    val docs = sf("sf0.001", "documents").filter(col("doc_id") < 80)
    val local = Bpe.train(docs, "text", numMerges = 8)
    val dist = Bpe.train(docs, "text", numMerges = 8, localVocabMax = 0L)
    assert(local === dist)
    // and the Sennrich vectors hold on both paths
    val sdocs = Seq(corpus).toDF("text")
    assert(Bpe.train(sdocs, "text", numMerges = 6) ===
      Bpe.train(sdocs, "text", numMerges = 6, localVocabMax = 0L))
  }

  test("min-count dict pre-filter keeps the in-memory path reachable past the cap") {
    // corpus: frequent words (the real merge signal) + SINGLE-CHARACTER
    // singleton noise words — a one-symbol word contributes zero pairs,
    // so dropping them is provably lossless (multi-char singletons would
    // NOT be: their pairs accumulate across distinct words)
    val noise = "a b c d f g h i j k m n p q u v x y z 0"
    val docs = Seq(
      ("low lower lowest " * 10) + noise,
      "low lower lowest low lower lowest").toDF("text")
    val dictAll = 3 + 20 // distinct words: 3 frequent + 20 singletons
    val exact = Bpe.train(docs, "text", numMerges = 6)
    // cap BETWEEN the filtered (3) and unfiltered (43) dict sizes: the
    // full dict no longer fits, the freq>=2 dict does — step 2 runs
    val filtered = Bpe.train(docs, "text", numMerges = 6,
      localVocabMax = 10L, minCount = 2L)
    assert(filtered === exact,
      "filtered-local past the cap must match the exact table when no " +
        "merge touches count-1 words")
    assert(dictAll > 10 && filtered.nonEmpty)
    // minCount=1 disables step 2: the same cap forces the distributed
    // loop, which is exact by construction
    val dist = Bpe.train(docs, "text", numMerges = 6,
      localVocabMax = 10L, minCount = 1L)
    assert(dist === exact)
    // all-singleton corpus: the filtered dict is EMPTY, but cross-word
    // pairs still repeat — must fall through to distributed, not return
    // an empty merge table
    val singletons = Seq("abde", "abxy", "abqr").toDF("text")
    val viaCap = Bpe.train(singletons, "text", numMerges = 1,
      localVocabMax = 0L, minCount = 2L)
    assert(viaCap.nonEmpty && viaCap.head._2 == "a" && viaCap.head._3 == "b")
  }

  test("trainLocal early-stops and caps at numMerges like the distributed path") {
    assert(Bpe.trainLocal(Seq(("ab", 1L), ("cd", 1L)), 10) === Seq.empty)
    val m = Bpe.trainLocal(Seq(("aaaa", 3L)), 2)
    assert(m.length === 2)
    assert(m.head === ((1L, "a", "a", 9L))) // 3 adjacent positions x freq 3
  }

  test("trainDf on the gate slice matches the independent Python reference head") {
    // first rows of tools/bpe_reference.py over sf0.001 — cross-checks the
    // distributed pair count + rewrite against hand-verifiable data shape
    val docs = sf("sf0.001", "documents").filter(col("doc_id") < 50)
    val merges = Bpe.train(docs, "text", numMerges = 3)
    assert(merges.length === 3)
    assert(merges.map(_._1) === Seq(1L, 2L, 3L))
    // freqs strictly positive and non-increasing is NOT guaranteed by BPE
    // (later merges can count composite symbols), but every freq >= 2 is
    assert(merges.forall(_._4 >= 2L))
  }

  test("writeMerges/readMerges roundtrip preserves the table and rank order") {
    val docs = sf("sf0.001", "documents").filter(col("doc_id") < 50)
    val merges = Bpe.train(docs, "text", numMerges = 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_rt_").toString
    Bpe.writeMerges(spark, merges, path)
    val back = Bpe.readMerges(spark, path)
    assert(back === merges)
    // segmentation through the artifact is indistinguishable
    val tok = "customer"
    assert(Bpe.segmentToken(tok, back.map(m => (m._2, m._3)).toArray).toSeq ===
      Bpe.segmentToken(tok, merges.map(m => (m._2, m._3)).toArray).toSeq)
  }
}
