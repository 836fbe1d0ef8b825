package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order keys and quarantine routing. */
class LayoutSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  test("zValue: known interleavings and Morton ordering") {
    val df = Seq((3L, 1L), (0L, 0L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    val out = df.select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    // (3,1): a bits 0,2 set; b bit 1 -> 1+4+2 = 7
    // (0,0) -> 0; (1,1) -> 1+2 = 3; (2,2) -> 4+8 = 12
    assert(out.toSeq === Seq(7L, 0L, 3L, 12L))
  }

  test("zValue: out-of-range values saturate instead of wrapping") {
    val df = Seq((1L << 30, -5L)).toDF("a", "b")
    val z = df.select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect().head
    // a clamps to 2^21-1 (all even bits set), b clamps to 0 (no odd bits)
    val allEven = (0 until 21).map(i => 1L << (2 * i)).sum
    assert(z === allEven, "max-clamp must set every even bit, min-clamp none")
  }

  test("zValue: roundtrip — even/odd bit extraction recovers both inputs") {
    val xs = Seq((123456L, 654321L), (0L, 1L), ((1L << 21) - 1, (1L << 21) - 1))
    val out = xs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) =>
      var (ra, rb) = (0L, 0L)
      (0 until 21).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra === a && rb === b, s"roundtrip($a,$b)")
    }
  }

  test("quarantine: null predicates are violations; split partitions the input") {
    val df = Seq(
      (1L, Some(5L)),   // clean
      (2L, Some(-1L)),  // fails positive
      (3L, None)        // null -> fails positive (null-safe)
    ).toDF("id", "v")
    val rules = Seq("positive" -> (col("v") > 0))
    val (clean, bad) = Quarantine.split(df, rules)
    assert(clean.select("id").as[Long].collect().toSet === Set(1L))
    val badRows = bad.select(col("id"), concat_ws(",", col("violations")).as("vi"))
      .as[(Long, String)].collect().toMap
    assert(badRows === Map(2L -> "positive", 3L -> "positive"))
    assert(clean.count() + bad.count() === df.count())
  }

  test("quarantine: multiple rules accumulate in declaration order") {
    val df = Seq((1L, -5L, "x")).toDF("id", "v", "s")
    val out = Quarantine.tag(df,
        Seq("pos" -> (col("v") > 0), "short" -> (length(col("s")) <= 2),
          "neg" -> (col("v") < 0)))
      .select(concat_ws(",", col("violations"))).as[String].collect()
    assert(out === Seq("pos")) // short passes, neg passes, only pos fails
  }
}
