package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

/** Property-based tests (SURVEY §5.4). Samples are generated with a fixed
  * scalacheck seed and evaluated in ONE Spark job per property (a single
  * DataFrame of all samples) — per-sample jobs would be 100x slower. */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("property-test")
    .getOrCreate()

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 300): Seq[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(42L)).get

  test("prop: bitstringToInt ∘ valueToBitstring = identity at width 64 (incl. negatives)") {
    val xs = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val out = xs.toDF("v")
      .select(col("v"), bitstringToInt(valueToBitstring(col("v"), 64)).as("rt"))
      .as[(Long, Long)].collect()
    out.foreach { case (v, rt) => assert(rt == v, s"roundtrip($v) = $rt") }
  }

  test("prop: hexToInt matches BigInt(s,16) with NULL on overflow/malformed") {
    val hexG = for {
      n <- Gen.chooseNum(1, 20)
      cs <- Gen.listOfN(n, Gen.oneOf(("0123456789abcdefABCDEF").toSeq))
      pre <- Gen.oneOf("", "0x", "0X")
    } yield pre + cs.mkString
    val junkG = Gen.oneOf("", "0x", "xyz", "12g4", " 12", "0x 1")
    val xs = samples(Gen.frequency(9 -> hexG, 1 -> junkG))
    val out = xs.toDF("h")
      .select(col("h"), hexToInt(col("h")).as("v"))
      .as[(String, Option[Long])].collect()
    out.foreach { case (h, v) =>
      val stripped = h.replaceFirst("(?i)^0x", "")
      val expected: Option[Long] =
        if (stripped.nonEmpty && stripped.forall(c => "0123456789abcdefABCDEF".contains(c))) {
          val bi = BigInt(stripped, 16)
          if (bi.isValidLong) Some(bi.toLong) else None // overflow -> NULL
        } else None
      assert(v == expected, s"hexToInt('$h') = $v, expected $expected")
    }
  }

  test("prop: reverseHexBytes is an involution on even-length hex strings") {
    val hexG = for {
      n <- Gen.chooseNum(1, 16)
      cs <- Gen.listOfN(2 * n, Gen.oneOf("0123456789abcdef".toSeq))
    } yield cs.mkString
    val xs = samples(hexG)
    val out = xs.toDF("h")
      .select(col("h"), reverseHexBytes(reverseHexBytes(col("h"))).as("rr"))
      .as[(String, String)].collect()
    out.foreach { case (h, rr) => assert(rr == h) }
  }

  test("prop: doubleFromComponents ∘ (decode bits) reconstructs round(d, 5) for doubles in codomain") {
    // exponents small enough that round(.,5) is exact-representable territory
    val g = for {
      sign <- Gen.oneOf(0L, 1L)
      exp <- Gen.chooseNum(-3, 6)
      frac <- Gen.chooseNum(0L, (1L << 52) - 1)
    } yield (sign, exp.toLong, frac)
    val xs = samples(g, 200)
    val out = xs.toDF("sign", "exp", "frac")
      .select(col("sign"), col("exp"), col("frac"),
        doubleFromComponents(col("sign"),
          doubleMantissa(valueToBitstring(col("frac"), 52)),
          doubleUnbiasedExponent(valueToBitstring(col("exp") + 1023L, 11))).as("v"))
      .as[(Long, Long, Long, Double)].collect()
    out.foreach { case (sign, exp, frac, v) =>
      val mant = 1.0 + frac.toDouble / (1L << 52).toDouble
      val expect = BigDecimal(math.pow(-1.0, sign.toDouble) * mant * math.pow(2.0, exp.toDouble))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(v - expect) < 1e-12, s"($sign,$exp,$frac): $v vs $expect")
    }
  }

  test("prop: uuidV5 matches an independent RFC-4122 v5 implementation") {
    val ns = "3bfbbd36-410b-43fa-999a-bb990a6db5c7"
    def refUuidV5(namespace: String, name: String): String = {
      val nsBytes = namespace.replace("-", "").sliding(2, 2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      val md = java.security.MessageDigest.getInstance("SHA-1")
      md.update(nsBytes); md.update(name.getBytes("UTF-8"))
      val h = md.digest()
      h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
      h(8) = ((h(8) & 0x3f) | 0x80).toByte // variant 10xx
      val hex = h.take(16).map("%02x".format(_)).mkString
      s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20, 32)}"
    }
    val xs = samples(Gen.asciiPrintableStr, 200).distinct
    val out = xs.toDF("name")
      .select(col("name"), uuidV5(col("name"), ns).as("u"))
      .as[(String, String)].collect()
    out.foreach { case (name, u) =>
      assert(u == refUuidV5(ns, name), s"uuidV5('$name')")
    }
  }

  test("prop: merge is idempotent — applying the same batch twice equals once") {
    import graft.materialize.{MergeConfig, MergeIntoPartitioned}
    import graft.warehouse.Warehouse
    val g = for {
      id <- Gen.chooseNum(1L, 40L)
      day <- Gen.chooseNum(1, 9)
      hour <- Gen.chooseNum(0, 23)
      amt <- Gen.chooseNum(0, 1000)
    } yield (id, f"2024-01-0$day $hour%02d:00:00", s"s$amt", amt.toDouble)
    val batch0 = samples(g, 60)
    // unique key per batch (BigQuery MERGE requires it): keep max event time
    val batch = batch0.groupBy(_._1).map(_._2.maxBy(_._2)).toSeq
    def mk(rows: Seq[(Long, String, String, Double)]) =
      rows.toDF("id", "updated_at", "status", "amount")
        .withColumn("updated_at", col("updated_at").cast("timestamp"))
    val cfg = MergeConfig(partitionField = "updated_at",
      uniqueKey = Seq("id"), eventTime = Some("updated_at"))

    val wh = new Warehouse(Files.createTempDirectory("graft_prop_").toString, spark)
    val m = new MergeIntoPartitioned(wh, spark)
    val tgt = graft.core.TableId("proj", "p", "t1")
    m.run(mk(batch), tgt, cfg)
    val once = wh.read(tgt).orderBy("id")
      .select("id", "updated_at", "status", "amount")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toSeq
    m.run(mk(batch), tgt, cfg) // same batch again
    val twice = wh.read(tgt).orderBy("id")
      .select("id", "updated_at", "status", "amount")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toSeq
    assert(once == twice, "merge must be idempotent for identical batches")
  }

  test("prop: sortedLongIntersectCount = |array_intersect| on random sorted distinct arrays") {
    import graft.functions.VectorFunctions.sortedLongIntersectCount
    // small value domain forces real overlaps; sets are sorted+distinct as
    // the kernel contract requires
    val pairGen = for {
      a <- Gen.listOf(Gen.chooseNum(0L, 40L))
      b <- Gen.listOf(Gen.chooseNum(0L, 40L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val xs = samples(pairGen)
    val out = xs.toDF("a", "b")
      .select(
        sortedLongIntersectCount(col("a"), col("b")).as("kernel"),
        size(array_intersect(col("a"), col("b"))).as("hof"))
      .as[(Int, Int)].collect()
    out.foreach { case (k, h) => assert(k == h, s"kernel=$k hof=$h") }
  }

  test("prop: MinHashSig kernel = k array_min(transform) HOFs; empty -> NULL") {
    import graft.functions.VectorFunctions.minHashSig
    import graft.llm.Dedup
    val gen = Gen.listOf(Gen.chooseNum(0L, 1000000L))
    val xs = samples(gen) :+ List.empty[Long]
    val hof = Dedup.minhashSignature(col("hs"))
    val out = xs.toDF("hs")
      .select(
        minHashSig(col("hs"), Dedup.MinhashA, Dedup.MinhashB, Dedup.MinhashP).as("kernel"),
        array(hof: _*).as("ref"))
      .as[(Option[Seq[Long]], Seq[Option[Long]])].collect()
    out.foreach {
      case (Some(k), r) => assert(k === r.map(_.get), "kernel mins must equal HOF mins")
      case (None, r) => assert(r.forall(_.isEmpty), "empty input: kernel NULL = HOF all-null")
    }
  }

  test("prop: text stats edge cases — empty, punctuation-only, whitespace-only texts") {
    import graft.llm.TextStats
    val cases = Seq("", "   ", "...!!!", "the the the", "a b c d", "x")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = TextStats.qualityMetrics(df, "text", "doc_id")
      .orderBy("doc_id")
      .select("n_chars", "n_tokens", "stopword_ratio", "punct_ratio")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(rows(0) == ((0L, 0L, 0.0, 0.0)))          // empty: no div-by-zero
    assert(rows(1)._2 == 0L && rows(1)._3 == 0.0)    // whitespace-only
    assert(rows(2)._4 > 0.9)                         // punctuation-only
    assert(rows(3)._3 == 1.0)                        // all stopwords
    // fingerprint never nulls, even on texts shorter than the window
    val fps = df.select(TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(_.isNullAt(0))
    assert(fps.forall(_ == false))
  }

  test("prop: Bpe.segmentUdf = the Column fold on random tokens and merge tables") {
    import graft.llm.Bpe
    // small alphabet forces real merge hits, including the chaining edge
    // ("aaa" + (a,a)): random tokens over {a,b,c} against random rank-
    // ordered merge tables whose symbols grow from the same alphabet
    val tokG = for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val mergeG = for {
      a <- Gen.oneOf("a", "b", "c", "aa", "ab", "bc", "cc")
      b <- Gen.oneOf("a", "b", "c", "ba", "cb")
    } yield (a, b)
    val tables = samples(Gen.listOfN(6, mergeG), n = 10).map(_.distinct)
    val toks = samples(tokG, n = 120)
    tables.foreach { t =>
      val merges = t.zipWithIndex.map { case ((a, b), i) => (i.toLong + 1, a, b, 2L) }
      val out = toks.toDF("tok")
        .select(col("tok"),
          Bpe.segment(col("tok"), merges).as("fold"),
          Bpe.segmentUdf(merges)(col("tok")).as("imp"))
        .as[(String, Seq[String], Seq[String])].collect()
      out.foreach { case (tok, fold, imp) =>
        assert(fold === imp, s"fold vs udf diverge on '$tok' with table $merges")
      }
    }
  }

  test("prop: NearestCodewords kernel = driver argmin on random vectors/codebooks") {
    import graft.functions.VectorFunctions.nearestCodewords
    val m = 4; val k = 5; val dsub = 3
    val bookG = Gen.listOfN(m * k * dsub, Gen.chooseNum(-5.0, 5.0))
    val vecG = Gen.listOfN(m * dsub, Gen.chooseNum(-5.0f, 5.0f))
    val books = samples(bookG, n = 1).head.grouped(k * dsub).toSeq
      .map(_.grouped(dsub).toSeq.map(_.toSeq))
    val vecs = samples(vecG, n = 200).map(_.toSeq)
    val got = vecs.toDF("v")
      .select(nearestCodewords(col("v"), books).as("codes"))
      .as[Seq[Int]].collect()
    vecs.zip(got).foreach { case (v, codes) =>
      val expect = (0 until m).map { s =>
        val sub = v.slice(s * dsub, (s + 1) * dsub)
        val dss = sub.map(x => x.toDouble * x.toDouble).sum
        books(s).zipWithIndex.map { case (c, j) =>
          val dsc = sub.zip(c.map(_.toFloat)).map { case (a, b) => a.toDouble * b.toDouble }.sum
          (dss - 2.0 * dsc + c.map(x => x * x).sum, j)
        }.min._2
      }
      assert(codes === expect)
    }
  }

  override def afterAll(): Unit = spark.stop()
}
