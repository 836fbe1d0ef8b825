package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materialized containment index: indexed serving ≡ the
  * recompute-everything operator restricted to batch-touching pairs,
  * both candidate directions, append composition, the threshold guard,
  * and deletion. */
class ContainIndexSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  // base text long enough for ~38 word 3-grams
  private val T = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val footer = " legal footer boilerplate all rights reserved here"

  private lazy val corpus = Seq(
    10L -> T,
    11L -> "a completely unrelated document about maritime law and ships",
    12L -> "another unrelated document concerning medieval agriculture")
    .toDF("doc_id", "text")

  // 20 contains 10 (index-as-A direction); 21 is a prefix slice of T
  // (batch-as-A against the index); 22 duplicates 21 (batch-vs-batch)
  private lazy val batch = Seq(
    20L -> (T + footer),
    21L -> (1 to 25).map(i => s"tok$i").mkString(" "),
    22L -> (1 to 25).map(i => s"tok$i").mkString(" "))
    .toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cidx_spec_").toString

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.select("id_a", "id_b", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("indexed serve == full recompute restricted to batch-touching pairs, both directions") {
    val path = tmp()
    ContainIndex.write(corpus, "text", "doc_id", path,
      threshold = 0.9, nBuckets = 8)
    val served = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id", threshold = 0.9))
    val full = pairsOf(Dedup.containmentPairs(
        corpus.unionByName(batch), "text", "doc_id", threshold = 0.9))
      .filter { case ((a, b), _) => a >= 20 || b >= 20 }
    assert(served === full,
      s"served=$served\nfull(batch-touching)=$full")
    // the fixture exercises every direction:
    assert(served.contains((10L, 20L)), "index-as-A (stored prefix) direction")
    assert(served.contains((21L, 10L)), "batch-as-A against index postings")
    assert(served.contains((21L, 22L)) && served.contains((22L, 21L)),
      "batch-vs-batch pairs")
    assert(!full.exists { case ((a, b), _) => a < 20 && b < 20 },
      "index-vs-index pairs must not be served")
  }

  test("append composes: write half + append half == write all, at serve time") {
    val pathA = tmp(); val pathB = tmp()
    ContainIndex.write(corpus, "text", "doc_id", pathA,
      threshold = 0.9, nBuckets = 8)
    val extra = Seq(13L -> T).toDF("doc_id", "text") // second copy of T
    ContainIndex.append(extra, "text", "doc_id", pathA)
    ContainIndex.write(corpus.unionByName(extra), "text", "doc_id", pathB,
      threshold = 0.9, nBuckets = 8)
    val viaAppend = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, pathA, batch, "text", "doc_id"))
    val viaWrite = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, pathB, batch, "text", "doc_id"))
    assert(viaAppend === viaWrite)
    // the appended doc's FROZEN prefix serves the index-as-A direction
    assert(viaAppend.contains((13L, 20L)),
      s"appended doc must pair through its stored prefix: $viaAppend")
  }

  test("serving below the indexed threshold is refused (stored prefixes would be lossy)") {
    val path = tmp()
    ContainIndex.write(corpus, "text", "doc_id", path,
      threshold = 0.9, nBuckets = 8)
    val ex = intercept[IllegalArgumentException] {
      ContainIndex.containmentPairsIncremental(
        spark, path, batch, "text", "doc_id", threshold = 0.5)
    }
    assert(ex.getMessage.contains("threshold"))
    // at or above the indexed threshold is fine
    ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id", threshold = 0.95).count()
  }

  test("empty-seeded index: append + serve work from zero (the streaming seed pattern)") {
    val path = tmp()
    ContainIndex.write(corpus.filter(lit(false)), "text", "doc_id", path,
      threshold = 0.9, nBuckets = 8)
    // serve against the empty index: no index pairs, batch-vs-batch only
    // (21/22 are slices of T, so they are contained in 20 = T+footer too)
    val served0 = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id"))
    assert(served0.keySet ===
      Set((21L, 22L), (22L, 21L), (21L, 20L), (22L, 20L)), s"$served0")
    // append the corpus, then the full pair set appears
    ContainIndex.append(corpus, "text", "doc_id", path)
    val served = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id"))
    assert(served.contains((10L, 20L)) && served.contains((21L, 10L)))
  }

  test("serveThenAppend composes: two sequential batches == one-shot union") {
    val path = tmp()
    ContainIndex.write(corpus, "text", "doc_id", path,
      threshold = 0.9, nBuckets = 8)
    val b1 = batch.filter(col("doc_id") <= 21L)
    val b2 = batch.filter(col("doc_id") > 21L) // 22 pairs with 21 CROSS-batch
    var acc = Map.empty[(Long, Long), Double]
    ContainIndex.serveThenAppend(spark, path, b1, "text", "doc_id") { p =>
      acc = acc ++ pairsOf(p)
    }
    ContainIndex.serveThenAppend(spark, path, b2, "text", "doc_id") { p =>
      acc = acc ++ pairsOf(p)
    }
    val oneShot = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, tmpIndexOf(corpus), batch, "text", "doc_id"))
    assert(acc === oneShot,
      s"serve-then-append union must equal one-shot: $acc vs $oneShot")
    assert(acc.contains((21L, 22L)) && acc.contains((22L, 21L)),
      "cross-batch pair must be found by the later batch")
  }

  private def tmpIndexOf(docs: org.apache.spark.sql.DataFrame): String = {
    val p = tmp()
    ContainIndex.write(docs, "text", "doc_id", p, threshold = 0.9, nBuckets = 8)
    p
  }

  test("prop: indexed serving == full recompute on randomized corpora (20 trials)") {
    // adversarial sweep: random docs built from a small vocabulary so
    // containment relationships (substrings, supersets, near-misses)
    // occur organically; every trial pins incremental == full-restricted
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 12).map(i => s"w$i")
    def randDoc(): String = {
      val n = 6 + rnd.nextInt(20)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (trial <- 1 to 20) {
      val nCorpus = 4 + rnd.nextInt(6)
      val nBatch = 2 + rnd.nextInt(4)
      val corpusDocs = (0 until nCorpus).map(i => (i.toLong, randDoc()))
      // half the batch docs are derived (superset/substring of a corpus
      // doc) so qualifying pairs actually appear in most trials
      val batchDocs = (0 until nBatch).map { i =>
        val id = 100L + i
        if (i % 2 == 0 && corpusDocs.nonEmpty) {
          val base = corpusDocs(rnd.nextInt(corpusDocs.size))._2
          if (rnd.nextBoolean()) (id, base + " " + randDoc())   // superset
          else (id, base.split(" ").take(
            math.max(4, base.split(" ").length / 2)).mkString(" ")) // slice
        } else (id, randDoc())
      }
      val cdf = corpusDocs.toDF("doc_id", "text")
      val bdf = batchDocs.toDF("doc_id", "text")
      val t = 0.7 + rnd.nextInt(3) * 0.1 // 0.7 / 0.8 / 0.9
      val path = tmp()
      ContainIndex.write(cdf, "text", "doc_id", path,
        threshold = t, nBuckets = 4)
      val served = pairsOf(ContainIndex.containmentPairsIncremental(
        spark, path, bdf, "text", "doc_id", threshold = t))
      val full = pairsOf(Dedup.containmentPairs(
          cdf.unionByName(bdf), "text", "doc_id", threshold = t))
        .filter { case ((a, b), _) => a >= 100 || b >= 100 }
      assert(served === full,
        s"trial $trial (t=$t): served=$served full=$full\n" +
          s"corpus=$corpusDocs\nbatch=$batchDocs")
    }
  }

  test("deleteDocs hides an indexed doc immediately; compact purges all three tables") {
    val path = tmp()
    ContainIndex.write(corpus, "text", "doc_id", path,
      threshold = 0.9, nBuckets = 8)
    val before = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id"))
    assert(before.exists { case ((a, b), _) => a == 10L || b == 10L })
    ContainIndex.deleteDocs(Seq(Tuple1(10L)).toDF("doc_id"), "doc_id", path)
    val after = pairsOf(ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id"))
    assert(!after.exists { case ((a, b), _) => a == 10L || b == 10L },
      s"deleted doc must stop pairing immediately: $after")
    ContainIndex.compact(spark, path)
    for (t <- Seq("pref", "post", "sets"))
      assert(spark.read.parquet(s"$path/$t").filter(col("id") === 10L).count() === 0,
        s"compact must purge $t rows of the deleted doc")
    assert(pairsOf(ContainIndex.containmentPairsIncremental(
      spark, path, batch, "text", "doc_id")) === after,
      "survivors must serve identically after compact")
  }
}
