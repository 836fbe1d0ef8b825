package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.llm.{Packing, Sampling}

/** Property-based checks of the round-3 operators against independent
  * in-memory reference implementations (union-find, linear scans) on
  * randomized inputs with a fixed seed. Each property evaluates in one
  * Spark job over the whole sample. */
class OperatorPropertySpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(7L)).get

  test("prop: connectedComponents agrees with union-find on random graphs") {
    val edges = samples(Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 60L)), 150)
      .filter { case (a, b) => a != b }
    // reference: union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> find(n)).toMap
    val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("prop: incremental CC ≡ full recompute across random batch splits") {
    // three seeds × a random split point: labels from the first slice,
    // the rest folded incrementally — must equal CC over ALL edges
    for (seed <- Seq(11L, 23L, 47L)) {
      val edges = Gen.listOfN(120,
          Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 50L)))
        .apply(Gen.Parameters.default, Seed(seed)).get
        .filter { case (a, b) => a != b }
      val cut = 40 + (seed % 30).toInt
      val (old, batch) = edges.splitAt(cut)
      val labels = ConnectedComponents.run(old.toDF("a", "b"), "a", "b")
      val inc = ConnectedComponents
        .incremental(labels, batch.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val full = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(inc === full, s"seed $seed split $cut")
    }
  }

  test("prop: PageRank conserves mass on random weighted graphs") {
    for (seed <- Seq(5L, 17L)) {
      val edges = Gen.listOfN(80,
          Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(1L, 30L), Gen.chooseNum(1L, 9L)))
        .apply(Gen.Parameters.default, Seed(seed)).get
      val n = edges.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
      val total = n * 1000000L
      val got = PageRank.rank(edges.toDF("src", "dst", "w"), "src", "dst",
          Some("w"), iters = 6)
        .agg(org.apache.spark.sql.functions.sum("pr")).first().getLong(0)
      // integer truncation only LOSES mass, boundedly
      assert(got <= total && got > total - 6 * (n + 2) * 4,
        s"seed $seed: mass $got of $total")
    }
  }

  test("prop: cc-label idempotence — re-applying a batch is a fixpoint") {
    val edges = samples(Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L)), 80)
      .filter { case (a, b) => a != b }
    val (old, batch) = edges.splitAt(50)
    val labels = ConnectedComponents.run(old.toDF("a", "b"), "a", "b")
    val once = ConnectedComponents
      .incremental(labels, batch.toDF("a", "b"), "a", "b")
      .localCheckpoint(true)
    val twice = ConnectedComponents
      .incremental(once, batch.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(twice === once.as[(Long, Long)].collect().toMap)
  }

  test("prop: sessionize invariants — intra-gap <= gap, inter-gap > gap, counts partition events") {
    val gapUs = 1000L
    val evs = samples(Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 20000L)), 300)
      .map { case (k, us) => (k, new Timestamp(us / 1000), us / 1000 * 1000) }
    // microsecond-truncate to ms so Timestamp and expected math agree
    val df = evs.map { case (k, t, _) => (k, t) }.toDF("user_id", "ts")
    val out = Sessionize.sessions(df, "user_id", "ts", gapUs)
      .as[(Long, Long, Long, Long, Long)].collect() // key, idx, n, start, end
    val byKey = evs.map { case (k, _, us) => (k, us) }.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    // counts partition the events
    assert(out.map(_._3).sum === evs.size)
    byKey.foreach { case (k, times) =>
      val sessions = out.filter(_._1 == k).sortBy(_._2)
      // reference sessionization by linear scan
      val refSessions = times.foldLeft(List.empty[List[Long]]) {
        case (cur :: rest, t) if t - cur.head <= gapUs => (t :: cur) :: rest
        case (acc, t) => List(t) :: acc
      }.reverse.map(_.reverse)
      assert(sessions.length === refSessions.length, s"key $k session count")
      sessions.zip(refSessions).foreach { case ((_, _, n, s, e), ref) =>
        assert(n === ref.size && s === ref.head && e === ref.last)
      }
    }
  }

  test("prop: packBins — offsets bounded, bins contiguous, shard-deterministic") {
    val docs = samples(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(1L, 700L)), 250)
      .distinctBy(_._1)
    val out = Packing.packBins(docs.toDF("id", "n"), "id", "n", maxTokens = 1000L, nShards = 7)
      .select("id", "shard", "bin", "off_in_bin", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === docs.size)
    out.foreach { case (_, s, b, o, _) =>
      assert(s >= 0 && s < 7 && b >= 0 && o >= 0 && o < 1000)
    }
    // per shard: ordered by id, cumulative-sum offsets reproduce bin/off
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, b, o, n) =>
        assert(b === cum / 1000 && o === cum % 1000)
        cum += n
      }
    }
  }

  test("prop: stratifiedHashSample keeps exactly the rows whose bucket clears the rate") {
    val rows = samples(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.oneOf("x", "y")), 300)
      .distinctBy(_._1)
    val df = rows.toDF("id", "s")
    val kept = Sampling.stratifiedHashSample(df, "id", "s", Map("x" -> 30), 70)
      .select("id").as[Long].collect().toSet
    val buckets = df.select(col("id"), Sampling.hashBucket(col("id")).as("b"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, s) =>
      val rate = if (s == "x") 30 else 70
      assert(kept.contains(id) === (buckets(id) < rate), s"id $id stratum $s")
    }
  }

  test("prop: asOf equals the per-row argmax reference on random series") {
    val gen = Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 1000000L))
    val leftRows = samples(gen, 150).map { case (k, us) => (k, us / 1000 * 1000) }
    val rightRows = samples(gen, 80).map { case (k, us) => (k, us / 1000 * 1000) }
      .distinct
    val left = leftRows.zipWithIndex
      .map { case ((k, us), i) => (i.toLong, k, new Timestamp(us / 1000)) }
    val right = rightRows.map { case (k, us) => (k, new Timestamp(us / 1000), us) }
    val out = AsOfJoin.asOf(
        left.toDF("id", "key", "t"),
        right.toDF("key", "rt", "payload"),
        "key", "t", "rt", Seq("payload"))
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    left.foreach { case (id, k, t) =>
      val want = right.filter(r => r._1 == k && !r._2.after(t)).map(_._3).maxOption
      assert(out(id) === want, s"id $id key $k t $t")
    }
  }

  /** Reference span-merger shared by the two gram-flagging properties:
    * positions -> (spanCount, coveredTokens) under [p, p+n-1] intervals. */
  private def refSpans(flagged: Seq[Int], n: Int): (Long, Long) = {
    if (flagged.isEmpty) return (0L, 0L)
    val sorted = flagged.distinct.sorted
    var spans = 0L; var covered = 0L
    var s = sorted.head; var e = sorted.head + n - 1
    for (p <- sorted.tail) {
      if (p > e + 1) { spans += 1; covered += e - s + 1; s = p }
      e = p + n - 1
    }
    (spans + 1, covered + e - s + 1)
  }

  test("prop: duplicatedSpans agrees with a brute-force reference on random corpora") {
    val n = 4
    // tiny vocabulary forces real cross-doc gram collisions
    val docs = samples(Gen.listOfN(18, Gen.chooseNum(0, 5)), 60)
      .zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.map("t" + _).mkString(" ")) }
    val gramsOf = docs.map { case (id, text) =>
      id -> text.split(" ").toSeq.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    }.toMap
    val global = gramsOf.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val want = docs.map { case (id, text) =>
      val flagged = gramsOf(id).zipWithIndex.collect {
        case (g, i) if global(g) > 1 => i + 1 }
      val (sp, cov) = refSpans(flagged, n)
      (id, text.split(" ").length.toLong, sp, cov)
    }.sortBy(_._1)
    val got = graft.llm.Curation.duplicatedSpans(docs.toDF("doc_id", "text"),
        "text", "doc_id", minLen = n)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("prop: excisePassages — excised count matches reference; survivors = uncovered tokens in order") {
    val n = 3
    val docs = samples(Gen.listOfN(14, Gen.chooseNum(0, 4)), 50)
      .zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.map("w" + _).mkString(" ")) }
    val blTexts = docs.filter(_._1 % 10 == 3).map(_._2.split(" ").take(6).mkString(" "))
    val bl = blTexts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    val blGrams = blTexts.flatMap(_.split(" ").toSeq.sliding(n).filter(_.size == n)
      .map(_.mkString(" "))).toSet
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ").toSeq
      val flagged = toks.sliding(n).zipWithIndex.collect {
        case (g, i) if g.size == n && blGrams(g.mkString(" ")) => i + 1 }.toSeq
      val coveredSet = flagged.flatMap(p => p until (p + n)).toSet
      val kept = toks.zipWithIndex.collect { case (t, i) if !coveredSet(i + 1) => t }
      (id, toks.size.toLong, coveredSet.size.toLong, kept.mkString(" "))
    }.sortBy(_._1)
    val got = graft.llm.Curation.excisePassages(docs.toDF("doc_id", "text"),
        bl.toDF("doc_id", "text"), "text", "doc_id", shingleN = n)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got === want)
  }

  test("prop: canonicalizeUrl is idempotent and drops every tracking param") {
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Ex.com", "a.b.org", "SITE7.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/A/b", "/x/", "/p//")
      params <- Gen.someOf(Seq("utm_source=1", "b=2", "a=1", "fbclid=z", "ref=t", "pref=9"))
      frag <- Gen.oneOf("", "#frag")
    } yield s"$scheme://$www$host$port$path" +
      (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag
    val urls = samples(gen, 150).zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val once = graft.llm.Curation.canonicalizeUrl(col("url"))
    val out = urls.toDF("i", "url")
      .select(col("i"), once.as("c1"),
        graft.llm.Curation.canonicalizeUrl(once).as("c2"))
      .as[(Long, String, String)].collect()
    out.foreach { case (i, c1, c2) =>
      assert(c1 === c2, s"not idempotent for ${urls(i.toInt)._2}")
      assert(!c1.contains("utm_") && !c1.contains("fbclid") &&
        !c1.matches(".*[?&]ref=.*"), s"tracking param survived: $c1")
      assert(!c1.contains("#"), s"fragment survived: $c1")
    }
  }

  test("prop: lmScore equals an in-memory stupid-backoff reference; partition-invariant") {
    import graft.llm.LmScore
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = samples(doc, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val trainRows = corpus.filter(_._1 % 2 == 0)

    // in-memory reference: identical integer formulas, independent code path
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).map(_.toLowerCase).toSeq
    val allToks = trainRows.flatMap(r => toks(r._2))
    // bigrams are PER-DOC sliding pairs — never across document bounds
    val bigrams = trainRows.flatMap(r => toks(r._2).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1ref = bigrams.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cu = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allToks.size.toLong
    val v = cu.size.toLong
    val s = LmScore.adaptiveScale(n, v)
    val nv = n + v
    def pOf(a: String, b: String): Long = bigrams.get((a, b)) match {
      case Some(cc) => (cc * s) / c1ref(a)
      case None => (2L * (((cu.getOrElse(b, 0L) + 1L) * s) / nv)) / 5L
    }
    def bitsOf(p: Long): Long =
      java.lang.Long.toBinaryString(s / math.max(p, 1L)).length.toLong - 1L
    val want = corpus.map { case (id, t) =>
      val bg = toks(t).sliding(2).filter(_.size == 2).toSeq
      (id, bg.size.toLong, bg.map(p => pOf(p(0), p(1))).sum,
        bg.map(p => bitsOf(pOf(p(0), p(1)))).sum)
    }.sortBy(_._1)

    val model = LmScore.train(trainRows.toDF("doc_id", "text"), "text")
    def run(parts: Int) =
      LmScore.score(corpus.toDF("doc_id", "text").repartition(parts), "text",
          "doc_id", model)
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val got1 = run(1)
    assert(got1 === want)
    // exact-integer arithmetic => merge order cannot shift anything
    assert(run(7) === got1)
  }

  test("prop: domainQuota keeps exactly the quota md5-smallest ids per domain") {
    val rows = samples(Gen.chooseNum(0, 6), 120).zipWithIndex.map { case (d, i) =>
      (i.toLong, s"https://host$d.example.com/p/$i")
    }
    val quota = 4
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = rows.groupBy(r => r._2.split("/")(2)).values.flatMap { grp =>
      grp.map(r => (r._1, java.lang.Long.parseLong(md5hex(r._1.toString).take(15), 16)))
        .sortBy { case (id, h) => (h, id) }.take(quota).map(_._1)
    }.toSeq.sorted
    val got = graft.llm.Curation.domainQuota(rows.toDF("doc_id", "url"),
        "url", "doc_id", quota)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
  }
}
