package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 additions: the native cosine coarse-assign kernel
  * (NearestCentroids) replacing the O(nCells)-node candidate-struct
  * Column form under every IVF-family path. The contract is
  * BIT-IDENTICAL assignments — the former form is re-implemented inline
  * here and pinned against the kernel, so any arithmetic or tie-break
  * drift fails loudly rather than shifting four certified gates. */
class R7Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "sf0.001"
  private def emb = sf(dir, "embeddings")

  /** The pre-round-7 assignCells Column form, verbatim: nCells candidate
    * structs + array_min / array_sort+slice. Kept as the semantic oracle
    * for the kernel. */
  private def structFormAssign(
      df: DataFrame, cents: Seq[(Long, Seq[Float])],
      vecCol: String, idCol: String, role: String, keep: Int): DataFrame = {
    import graft.functions.VectorFunctions.floatVecDot
    val v = col(s"${role}_vec")
    val cands = array(cents.map { case (cid, c) =>
      val cl = typedLit(c)
      val d = floatVecDot(v, cl) /
        (sqrt(floatVecDot(v, v)) * sqrt(floatVecDot(cl, cl)))
      struct((lit(0.0) - d).as("nd"), lit(cid).as("cid"))
    }: _*)
    val sel = df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"))
    val cid =
      if (keep == 1) array_min(cands).getField("cid")
      else explode(slice(array_sort(cands), 1, keep).getField("cid"))
    sel.withColumn("cid", cid)
  }

  private def centsOf(n: Int): Seq[(Long, Seq[Float])] =
    Similarity.centroidsOf(emb, "embedding", "vec_id", n, Some(emb.count()), None)

  test("nearestCentroids kernel: bit-identical to the candidate-struct form, keep=1 and keep=4") {
    val cents = centsOf(16)
    for (keep <- Seq(1, 4)) {
      val kernel = Similarity.assignCells(emb, cents, "embedding", "vec_id", "neighbor", keep)
        .select("neighbor_id", "cid").as[(Long, Long)].collect().sorted.toSeq
      val struct = structFormAssign(emb, cents, "embedding", "vec_id", "neighbor", keep)
        .select("neighbor_id", "cid").as[(Long, Long)].collect().sorted.toSeq
      assert(kernel === struct, s"keep=$keep assignment drift vs the struct form")
    }
  }

  test("nearestCentroids kernel: probe ORDER matches array_sort (nearest first)") {
    val cents = centsOf(8)
    import graft.functions.VectorFunctions.nearestCentroids
    val kernel = emb.limit(50)
      .select(col("vec_id"), nearestCentroids(col("embedding"), cents, 3).as("cells"))
      .as[(Long, Seq[Long])].collect().toMap
    val struct = structFormAssign(emb.limit(50), cents, "embedding", "vec_id", "query", 3)
      .select("query_id", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // explode preserves array order, so grouping keeps the sorted order
    kernel.foreach { case (id, cells) =>
      assert(cells === struct(id), s"probe order drift for vec $id")
    }
  }

  test("nearestCentroids kernel: NaN (zero-norm) and tie semantics") {
    // duplicate centroids tie to the lower cid — compared against the
    // struct form, whose (nd, cid) array_sort order is the contract
    val cents = Seq(
      (9L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (5L, Seq(1.0f, 0.0f))) // duplicate of cid 9 under cosine
    val tie = Seq((2L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val kernel = Similarity.assignCells(tie, cents, "embedding", "vec_id", "q", 3)
      .select("cid").as[Long].collect().toSeq
    val struct = structFormAssign(tie, cents, "embedding", "vec_id", "q", 3)
      .select("cid").as[Long].collect().toSeq
    assert(kernel === struct)
    assert(kernel.take(2) === Seq(5L, 9L), "cosine tie breaks to the lower cid")

    // zero-norm vector: the struct form's ANSI Divide KILLS the job
    // (DIVIDE_BY_ZERO) — a single failed embed taking down an index build.
    // The kernel is deliberately total: Java double 0/0 = NaN, NaN sorts
    // last under Spark's double order, all-NaN ties fall to ascending cid —
    // a deterministic parking cell instead of a dead job.
    intercept[Exception] {
      structFormAssign(Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        cents, "embedding", "vec_id", "q", 3).collect()
    }
    val zero = Similarity.assignCells(
        Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        cents, "embedding", "vec_id", "q", 3)
      .select("cid").as[Long].collect().toSeq
    assert(zero === Seq(2L, 5L, 9L), "all-NaN falls to ascending cid")
  }

  test("nearestCentroids kernel: keep > nCells returns nCells cells; ragged and null vectors fail loudly") {
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
    val ok = Similarity.assignCells(
        Seq((7L, Seq(3.0f, 4.0f))).toDF("vec_id", "embedding"),
        cents, "embedding", "vec_id", "q", 5)
      .select("cid").as[Long].collect()
    assert(ok.toSeq === Seq(1L, 0L), "min(keep, nCells) cells, nearest first")

    val ragged = intercept[Exception] {
      Similarity.assignCells(
        Seq((8L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding"),
        cents, "embedding", "vec_id", "q", 1).collect()
    }
    assert(ragged.getMessage.contains("expected 2-dim"), ragged.getMessage)

    val nul = intercept[Exception] {
      Similarity.assignCells(
        Seq((9L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"),
        cents, "embedding", "vec_id", "q", 1).collect()
    }
    assert(nul.getMessage.contains("null embedding"), nul.getMessage)
  }

  test("adcLut/adcScore kernels: bit-identical to the HOF forms they replace") {
    import graft.functions.VectorFunctions.{adcLut, adcScore, floatVecDot}
    val books = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 2)
    val m = books.size
    val kCw = books.head.size
    val dsub = books.head.head.size
    // the pre-round-7 Column forms, verbatim
    val hofLut = array((0 until m).map { s =>
      array(books(s).map(c =>
        floatVecDot(slice(col("embedding"), s * dsub + 1, dsub),
          typedLit(c.map(_.toFloat)))): _*)
    }: _*)
    val both = emb.select(col("vec_id"),
      adcLut(col("embedding"), books).as("flat"), hofLut.as("nested"))
      .as[(Long, Seq[Double], Seq[Seq[Double]])].collect()
    both.foreach { case (id, flat, nested) =>
      assert(flat === nested.flatten, s"LUT drift for vec $id")
    }

    // score: native sum vs zip_with+aggregate over the same codes/lut
    val codes = Pq.encode(emb, "embedding", "vec_id", books)
    val q = emb.filter(col("vec_id") < 3).select(
      col("vec_id").as("query_id"), adcLut(col("embedding"), books).as("lut"),
      hofLut.as("nested"))
    val scores = codes.join(broadcast(q), col("query_id") =!= col("id"))
      .select(
        adcScore(col("codes"), col("lut"), kCw).as("native"),
        aggregate(zip_with(col("codes"), col("nested"), (c, l) => element_at(l, c + 1)),
          lit(0.0), (a, v) => a + v).as("hof"))
      .as[(Double, Double)].collect()
    assert(scores.nonEmpty)
    scores.foreach { case (n, h) => assert(n === h, "ADC score drift") }
  }

  test("Pq.topK plan: both ADC halves are native kernels, no m×k literal array") {
    val books = Pq.fit(emb, "embedding", "vec_id", m = 4, k = 4, iters = 1)
    val plan = Pq.topK(Pq.encode(emb, "embedding", "vec_id", books), books,
        emb.filter(col("vec_id") < 2), "embedding", "vec_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("adc_lut"), "LUT build must be the native kernel")
    assert(plan.contains("adc_score"), "pair scoring must be the native kernel")
    assert(!plan.contains("zip_with") && !plan.contains("float_vec_dot(slice"),
      "the HOF/literal-array ADC forms must be gone from the serving plan")
  }

  test("CurationPipeline: stage outputs are readable tables; crash-retry resumes without recompute") {
    val docs = sf(dir, "documents").select("doc_id", "text")
    val wh = new graft.warehouse.Warehouse(
      java.nio.file.Files.createTempDirectory("graft_pipe_wh_").toString, spark)
    val st = CurationPipeline.Stages("proj", "curation")
    val report = CurationPipeline.run(wh, docs,
        docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", st)
      .as[(String, Long, Long)].collect().toSeq
    assert(report.map(_._1) === report.map(_._1).sorted && report.nonEmpty)

    // every stage boundary is an independently-readable table
    st.all.foreach(t => assert(wh.exists(t), s"missing stage table $t"))
    val nKeep = wh.read(st.lmKeep).count()
    val nCurated = wh.read(st.curated).count()
    assert(nKeep > 0 && nCurated > 0 && nCurated <= nKeep)
    assert(report.map(_._2).sum === nCurated, "report rows must cover curated set")

    // the materialized composition equals the direct (gate-shape) one
    val model = LmScore.train(docs.filter(col("doc_id") % 2 === 0), "text")
    val lmKeep = LmScore.score(docs, "text", "doc_id", model)
      .filter(col("n_bigrams") > 0 && col("sum_bits") * 10L <= col("n_bigrams") * 44L)
      .select("doc_id").localCheckpoint()
    val kept = docs.join(lmKeep, Seq("doc_id"), "left_semi")
    val survivors = Dedup.exact(kept, "text", "doc_id").select("doc_id")
    val direct = Sampling.splitAssign(
        kept.join(survivors, Seq("doc_id"), "left_semi"), "doc_id",
        seed = 7L, valPct = 10, testPct = 10)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .orderBy("split").as[(String, Long, Long)].collect().toSeq
    assert(report === direct, "materialized pipeline must equal the direct composition")

    // resume contract: with every stage table present, a re-run touches
    // NOTHING — even a garbage corpus input cannot change the answer
    val empty = docs.filter(lit(false))
    val resumed = CurationPipeline.run(wh, empty, empty, "text", "doc_id", st)
      .as[(String, Long, Long)].collect().toSeq
    assert(resumed === report, "resume must serve completed stages from tables")

    // resume=false forces recompute through the same tables
    val forced = CurationPipeline.run(wh, docs,
        docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", st, resume = false)
      .as[(String, Long, Long)].collect().toSeq
    assert(forced === report)
  }

  test("bm25TopK: exact integer scores match a driver-side reference; length normalization penalizes padded docs") {
    // crafted corpus: doc 1 and doc 2 have the SAME tf for 'cat', but doc 2
    // is padded 4x longer — BM25 must rank doc 1 above doc 2 (TF-IDF ties)
    val docs = Seq(
      (1L, "cat cat dog"),
      (2L, "cat cat " + Seq.fill(10)("filler").mkString(" ")),
      (3L, "bird bird bird"),
      (4L, "cat fish")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "cat")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "text", "doc_id",
        queries, "text", "doc_id", k = 4)
      .select("rank", "doc_id", "score").as[(Long, Long, Long)].collect()
      .sortBy(_._1)

    // driver-side reference with the exact same integer arithmetic
    val toks = Map(1L -> Seq("cat", "cat", "dog"),
      2L -> ("cat cat " + Seq.fill(10)("filler").mkString(" ")).split(" ").toSeq,
      3L -> Seq("bird", "bird", "bird"), 4L -> Seq("cat", "fish"))
    val n = 4L
    val scale = Retrieval.bm25AdaptiveScale(n)
    val tt = toks.values.map(_.size.toLong).sum
    val dfCat = toks.values.count(_.contains("cat")).toLong
    val idfCat = n * scale / dfCat
    def score(id: Long): Long = {
      val tf = toks(id).count(_ == "cat").toLong
      val adm = 1000L * tt / n
      val lpm = 1000000L * toks(id).size / adm
      math.min(idfCat * 22000L * tf / (10000L * tf + 3000L + 9L * lpm),
        Retrieval.ContribCap)
    }
    val expect = Seq(1L, 2L, 4L).map(id => id -> score(id)).toMap
    got.foreach { case (_, id, s) =>
      assert(s === expect(id), s"score drift for doc $id")
    }
    // BM25's whole point: the short tf=1 doc (4) outranks the padded tf=2
    // doc (2) — under TF-IDF doc 2 would win on raw tf
    assert(got.map(_._2).toSeq === Seq(1L, 4L, 2L),
      "expected order doc1 > doc4 > doc2 (padding beats raw tf); doc3 absent")
    assert(expect(1L) > expect(4L) && expect(4L) > expect(2L),
      "length normalization must invert the tf ordering for the padded doc")
  }

  test("bm25AvgDocLenMilli: Long-safe at 100TB magnitudes where the one-step lpm form overflows") {
    // the ADVICE scenario: a 10^7-token document in a 10^9-document corpus
    // (~2.5e13 total tokens). The one-step form computes 1000*dl*n = 1e19
    // > Long.MaxValue — provably overflowing — while the two-step form
    // stays exact to within the documented 0.1% of the true rational.
    val n = 1_000_000_000L
    val tt = 25_000_000_000_000L // avg 25k tokens/doc
    val dl = 10_000_000L
    assert(BigInt(1000) * BigInt(dl) * BigInt(n) > BigInt(Long.MaxValue),
      "fixture must sit in the one-step overflow regime")
    val adm = Retrieval.bm25AvgDocLenMilli(tt, n)
    val lpm = 1000000L * dl / adm
    val exact = BigInt(1000) * BigInt(dl) * BigInt(n) / BigInt(tt)
    val err = (BigInt(lpm) - exact).abs.toDouble / exact.toDouble
    assert(err <= 0.001, s"two-step lpm $lpm vs exact $exact: err $err > 0.1%")
    // every intermediate of the two-step form is Long-safe here
    assert(BigInt(1000) * BigInt(tt) <= BigInt(Long.MaxValue))
    assert(BigInt(1000000) * BigInt(dl) <= BigInt(Long.MaxValue))

    // loud failures at the documented boundaries, not silent corruption
    intercept[IllegalArgumentException] {
      Retrieval.bm25AvgDocLenMilli(Retrieval.Bm25MaxTotalTokens + 1, n)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25AvgDocLenMilli(0L, n)
    }
    intercept[IllegalArgumentException] { // avg below 0.001 tokens
      Retrieval.bm25AvgDocLenMilli(1L, 10_000L)
    }
  }

  test("lexical index: served BM25 equals the direct path; buckets prune; appends compose") {
    val docs = sf(dir, "documents").select("doc_id", "text")
    val queries = docs.filter(col("doc_id") % 100 === 3)
      .select(col("doc_id"),
        array_join(slice(Dedup.tokens(col("text")), 1, 5), " ").as("qtext"))
    val path = java.nio.file.Files.createTempDirectory("graft_lex_spec_").toString
    // write half, append half: the gate shape — stats delta rows must sum
    Retrieval.writeIndex(docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", path)
    Retrieval.appendIndex(docs.filter(col("doc_id") % 2 === 1), "text", "doc_id", path)

    val served = Retrieval.bm25TopKFromIndex(spark, path, queries, "qtext", "doc_id", 10)
    val direct = Retrieval.bm25TopK(docs, "text", "doc_id",
      queries, "qtext", "doc_id", 10)
    val s = served.select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val d = direct.select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(s === d, "index-served BM25 must equal the direct path bit-for-bit")

    // the scan must be bucket-pruned at planning time, strictly partial
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("bucket") && l.contains("IN") && !l.contains("IN ()")),
      s"expected a bucket IN (...) PartitionFilter, got: ${pf.mkString(" | ")}")
    val allBuckets = spark.read.parquet(path).select("bucket").distinct().count()
    val qb = queries
      .select(explode(array_distinct(Dedup.tokens(col("qtext")))).as("term"))
      .select(pmod(xxhash64(col("term")), lit(64L))).distinct().count()
    assert(qb < allBuckets, s"fixture must prune: $qb of $allBuckets buckets")

    // compaction: write+append left >=2 file sets per touched bucket;
    // compact collapses to one file per bucket, stats and results intact
    def files(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("bucket="))
        .toSeq
    }
    val before = files().size
    Retrieval.compactIndex(spark, path)
    val after = files()
    assert(after.size < before, s"compact must shrink files ($before -> ${after.size})")
    after.groupBy(p => p.substring(p.indexOf("bucket=")).split("/")(0))
      .foreach { case (b, fs) => assert(fs.size === 1, s"$b has ${fs.size} files") }
    val servedAfter = Retrieval
      .bm25TopKFromIndex(spark, path, queries, "qtext", "doc_id", 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(servedAfter === d, "compacted index must serve identical results")
  }

  test("MinHashIndex: served incremental pairs equal the recompute path; buckets prune; append rolls the corpus forward") {
    val docs = sf(dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250 && col("doc_id") < 300)
      .unionByName(corpus.filter(pmod(col("doc_id"), lit(10L)) === 0)
        .withColumn("doc_id", col("doc_id") + 200000L))
    val path = java.nio.file.Files.createTempDirectory("graft_mh_spec_").toString
    MinHashIndex.write(corpus, "text", "doc_id", path)

    val served = MinHashIndex.nearDupPairsIncremental(
      spark, path, batch, "text", "doc_id", 0.8)
    val direct = Dedup.minhashNearDupPairsIncremental(
      batch, corpus, "text", "doc_id", 0.8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().sorted.toSeq
    val s0 = rows(served)
    assert(s0 === rows(direct),
      "index-served incremental pairs must equal the recompute path")
    assert(s0.nonEmpty, "fixture must produce planted-clone pairs")

    // both reads must be bucket-pruned at planning time. The public entry
    // checkpoints (severing the lineage the filters live in), so the pin
    // inspects the lazy plan variant the public entry materializes.
    val (lazyPairs, caches) = MinHashIndex.nearDupPairsIncrementalPlan(
      spark, path, batch, "text", "doc_id", 0.8, 3, 64)
    val plan = lazyPairs.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    caches.foreach(_.unpersist())
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("kb") && l.contains("IN")),
      s"expected a kb IN (...) PartitionFilter on bands: ${pf.mkString(" | ")}")
    assert(pf.exists(l => l.contains("ib") && l.contains("IN")),
      s"expected an ib IN (...) PartitionFilter on sets: ${pf.mkString(" | ")}")

    // the public entry must release its three intermediate caches (the
    // r7-advice session leak): a serve may add at most its own checkpoint
    // block to the persistent-RDD registry, never the signature/band/
    // candidate caches (which would accumulate run over run)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    MinHashIndex.nearDupPairsIncremental(
      spark, path, batch, "text", "doc_id", 0.8).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"a serve must leak at most its checkpoint block, left ${leaked.size}")

    // roll forward: append the batch, serve a SECOND batch that clones a
    // first-batch doc — the pair must surface from the index alone
    MinHashIndex.append(batch, "text", "doc_id", path)
    val second = docs.filter(col("doc_id") === 260L)
      .withColumn("doc_id", col("doc_id") + 500000L)
    val roll = MinHashIndex.nearDupPairsIncremental(
      spark, path, second, "text", "doc_id", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(roll.contains((260L, 500260L)),
      s"appended corpus must pair with the new clone, got $roll")
  }

  test("ivfTopK plan: the kernel (not the O(nCells) struct array) does the assignment") {
    val queries = emb.filter(col("vec_id") < 5)
    val plan = Similarity.ivfTopK(emb, queries, "embedding", "vec_id", 10,
        corpusRows = Some(emb.count()))
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearest_centroids"),
      "coarse assignment must run through the native kernel")
    assert(!plan.contains("array_min(array(struct"),
      "the O(nCells) candidate-struct array form must be gone")
  }
}
