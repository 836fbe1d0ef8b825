package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Unicode normalization kernel + the normalizeText cleaning pass.
  *
  * Reference vectors come from the Unicode standard's canonical examples
  * (UAX #15 sec 1.2): e+COMBINING ACUTE (U+0301) composes to U+00E9 under
  * NFC, the fi ligature U+FB01 decomposes to "fi" under NFKC only, etc.
  * The JDK normalizer is the implementation under test; these pins certify
  * the wiring (expression, codegen, SQL registration, the cleaning pass),
  * not the algorithm. All fixtures are written as \\uXXXX escapes \u2014 raw
  * combining characters in source survive neither editors nor diffs.
  */
class TextNormalizeSpec extends SparkSpec {

  private val EAcute = "\u00E9"         // precomposed e-acute
  private val EDecomp = "e\u0301"       // decomposed e + combining acute
  private val ARing = "\u00C5"          // precomposed A-ring
  private val ADecomp = "A\u030A"       // decomposed A + combining ring

  private def norm(s: String, form: String): String = {
    val out = spark.range(1)
      .select(TextFunctions.unicodeNormalize(lit(s), form).as("v"))
      .collect()(0)
    if (out.isNullAt(0)) null else out.getString(0)
  }

  test("NFC composes canonical sequences; NFD decomposes") {
    assert(norm("caf" + EDecomp, "NFC") == "caf" + EAcute)
    assert(norm("caf" + EAcute, "NFD") == "caf" + EDecomp)
    assert(norm(ADecomp + "ngstrom", "NFC") == ARing + "ngstrom")
    // already-NFC text is unchanged
    assert(norm("caf" + EAcute, "NFC") == "caf" + EAcute)
  }

  test("NFKC applies compatibility mappings NFC must not touch") {
    assert(norm("\uFB01le", "NFKC") == "file")  // fi ligature
    assert(norm("\uFB01le", "NFC") == "\uFB01le") // canonical form keeps it
    assert(norm("\uFF21", "NFKC") == "A")       // fullwidth A
    assert(norm("\u00BD", "NFKD") == "1\u20442") // vulgar half -> 1 FRACTION-SLASH 2
  }

  test("ASCII fast-path and null propagation") {
    assert(norm("plain ascii text 123", "NFC") == "plain ascii text 123")
    assert(norm("", "NFC") == "")
    val r = spark.range(1)
      .select(TextFunctions.unicodeNormalize(lit(null).cast("string"), "NFC"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted paths agree with the JDK normalizer") {
    import java.text.Normalizer
    val samples = Seq("caf" + EDecomp + " bar", ADecomp, "\uFB03x", "ascii", "",
      "mixed " + EAcute + " " + EDecomp + " \uFF24", "\u0301leading combining")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(samples.map(Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(TextFunctions.unicodeNormalize(col("t"), form))
        .collect().map(_.getString(0)).toSeq
      val want = samples.map(Normalizer.normalize(_, Normalizer.Form.valueOf(form)))
      assert(got == want, s"form $form")
    }
  }

  test("unknown form is rejected eagerly") {
    intercept[IllegalArgumentException] {
      TextFunctions.unicodeNormalize(lit("x"), "NFX")
    }
  }

  test("SQL surface: graft_unicode_normalize") {
    org.apache.spark.sql.graft.SqlRegistration.register(spark)
    // NB: Spark's chr() wraps its argument mod 256 (DuckDB's chr is a
    // full codepoint constructor) — so the fixture comes in via a view.
    import spark.implicits._
    Seq(Tuple1("caf" + EDecomp)).toDF("t").createOrReplaceTempView("tn_fixture")
    val got = spark.sql(
      "SELECT graft_unicode_normalize(t, 'NFC') AS v FROM tn_fixture")
      .collect()(0).getString(0)
    assert(got == "caf" + EAcute)
    intercept[Exception] {
      spark.sql("SELECT graft_unicode_normalize('x', 'bogus')").collect()
    }
  }

  test("normalizeText: NFC + control strip + whitespace collapse + counters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "caf" + EDecomp + " and\u0007bell"), // composes 1, strips 1 ctrl
      (2L, "  double  spaced\ttabs  "),         // collapse + trim only
      (3L, "scar\uFFFDred\uFFFD"),              // 2 replacement chars
      (4L, "clean ascii"),                      // untouched
      (5L, "keep\nnewlines\nintact")            // \n survives the strip
    ).toDF("doc_id", "text")
    val out = graft.llm.Curation.normalizeText(docs, "text", "doc_id")
      .orderBy("doc_id").collect()

    assert(out(0).getString(1) == "caf" + EAcute + " andbell")
    assert(out(0).getLong(2) == 1L)  // n_ctrl
    assert(out(0).getLong(4) == 1L)  // n_composed
    assert(out(0).getLong(5) == 1L)  // changed

    assert(out(1).getString(1) == "double spaced tabs")
    assert(out(1).getLong(2) == 0L)
    assert(out(1).getLong(5) == 1L)

    assert(out(2).getString(1) == "scar\uFFFDred\uFFFD")
    assert(out(2).getLong(3) == 2L)  // n_repl counts but does not strip
    assert(out(2).getLong(5) == 0L)  // text unchanged -> not flagged

    assert(out(3).getString(1) == "clean ascii")
    assert(out(3).getLong(5) == 0L)

    assert(out(4).getString(1) == "keep\nnewlines\nintact")
    assert(out(4).getLong(2) == 0L)
  }

  test("plan: normalizeText is map-only (no shuffle)") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = graft.llm.Curation.normalizeText(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
