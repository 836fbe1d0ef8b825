package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface tests: every registered graft_* function callable from
  * spark.sql text, matching the Scala Column API. */
class SqlRegistrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("sqlreg-test")
      .getOrCreate()
    org.apache.spark.sql.graft.SqlRegistration.register(s)
    s
  }

  test("GraftSparkExtensions: functions available via spark.sql.extensions config (needs a FRESH session: extensions bind at creation)") {
    // suites share one JVM and getOrCreate() would silently reuse a live
    // session WITHOUT binding the extensions (discovery order decides
    // which suite precedes us — this must not depend on it)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .appName("ext-test")
      .getOrCreate()
    try {
      import s2.implicits._
      val v = s2.newSession().sql("SELECT graft_hex_to_int('0x10') AS v").as[Long].head()
      assert(v == 16L)
    } finally s2.stop()
  }

  test("graft_uuid_v5 from SQL matches the known RFC vector") {
    import spark.implicits._
    val u = spark.sql(
      "SELECT graft_uuid_v5('www.example.com', '6ba7b810-9dad-11d1-80b4-00c04fd430c8') AS u")
      .as[String].head()
    // python: uuid.uuid5(uuid.NAMESPACE_DNS, 'www.example.com')
    assert(u == "2ed6657d-e927-568b-95e1-2665a8aea6a2")
  }

  test("scalar functions callable from SQL with column args") {
    import spark.implicits._
    val r = spark.sql("""
      SELECT graft_hex_to_int('0xff') AS a,
             graft_hex_to_int('ffffffffffffffff') AS a_overflow,
             graft_bitstring_to_int(graft_value_to_bitstring(-2, 64)) AS b,
             graft_reverse_hex_bytes('0a0b0c') AS c,
             graft_bytes4_to_int32(unhex('FFFFFFFF')) AS d,
             graft_base64_map('QUJD', 1) AS e,
             graft_float_vec_dot(array(cast(1.5 as float), cast(2.0 as float)),
                                 array(cast(2.0 as float), cast(3.0 as float))) AS f
    """).as[(Option[Long], Option[Long], Long, String, Long, Long, Double)].head()
    assert(r == ((Some(255L), None, -2L, "0c0b0a", -1L, 16L, 9.0)))
  }

  test("text/vector curation functions callable from SQL") {
    import spark.implicits._
    val r = spark.sql("""
      SELECT graft_int_vec_dot(array(127, -2), array(127, 3)) AS a,
             graft_tokens('  The quick  fox ') AS b,
             graft_url_domain('https://WWW.Example.COM:8080/p?q=1#f') AS c,
             graft_canonicalize_url('http://www.site.com:80/a/?utm_source=x&id=1#s') AS d,
             graft_lang_id('the a value row') AS e
    """).as[(Long, Seq[String], String, String, String)].head()
    assert(r._1 === 127L * 127 - 6)
    assert(r._2 === Seq("the", "quick", "fox"))
    assert(r._3 === "example.com")
    assert(r._4 === "http://site.com/a?id=1")
    assert(r._5 === "en")
    // null inputs stay null across the whole library (lang_id previously
    // leaked its fold default "en" for null text)
    val nulls = spark.sql("""
      SELECT graft_tokens(CAST(NULL AS STRING)) a,
             graft_url_domain(CAST(NULL AS STRING)) b,
             graft_lang_id(CAST(NULL AS STRING)) c,
             graft_text_simhash(CAST(NULL AS STRING)) d""").head()
    assert((0 until 4).forall(nulls.isNullAt), nulls.toString)
    // same expression tree as the Scala API: simhash from SQL == Dedup.simhash
    val (sqlSim, apiSim) = spark.sql("SELECT graft_text_simhash('a b c') AS s")
      .as[Long].head() ->
      Seq("a b c").toDF("t")
        .select(graft.llm.Dedup.simhash(org.apache.spark.sql.functions.col("t")))
        .as[Long].head()
    assert(sqlSim === apiSim)
  }

  test("literal-argument validation raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_value_to_bitstring(5, length('xx'))").collect()
    }
    assert(e.getMessage.contains("must be an integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("must be an integer literal")))
  }

  override def afterAll(): Unit = spark.stop()
}
