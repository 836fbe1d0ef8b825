package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join, range join, and sessionization: semantics pinned against
  * naive per-row formulations on data small enough to check by hand. */
class TemporalSpec extends SparkSpec {

  private lazy val sp = spark
  import sp.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left: (id, key, t)   right: (key, t, payload v)
  private lazy val left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")),   // before any right row
    (2L, "a", ts("2024-01-01 12:00:00")),   // exact tie with right@12:00
    (3L, "a", ts("2024-01-01 13:30:00")),   // matches right@12:00
    (4L, "a", ts("2024-01-02 23:00:00")),   // matches right@14:00, far back
    (5L, "b", ts("2024-01-01 12:30:00")),   // matches b's only row
    (6L, "c", ts("2024-01-01 12:00:00"))    // key with no right rows
  ).toDF("id", "key", "t")

  private lazy val right = Seq(
    ("a", ts("2024-01-01 12:00:00"), 100L),
    ("a", ts("2024-01-01 14:00:00"), 200L),
    ("b", ts("2024-01-01 12:00:00"), 300L)
  ).toDF("key", "rt", "v")

  test("asOf: latest right row at or before left time, per key") {
    val out = AsOfJoin.asOf(left, right, "key", "t", "rt", Seq("rt", "v"))
      .orderBy("id")
      .select("id", "v")
      .as[(Long, Option[Long])].collect()
    assert(out === Seq(
      1L -> None,          // nothing at or before 10:00
      2L -> Some(100L),    // tie: right row at the same instant is visible
      3L -> Some(100L),
      4L -> Some(200L),
      5L -> Some(300L),
      6L -> None))         // no right rows for key c
  }

  test("asOf: tolerance nulls out stale matches but keeps the row") {
    val out = AsOfJoin.asOf(left, right, "key", "t", "rt", Seq("v"),
        toleranceUs = Some(2L * 3600 * 1000000))
      .orderBy("id")
      .select("id", "v")
      .as[(Long, Option[Long])].collect()
    // id=4 is 33h after its match -> nulled; id=3 is 1.5h after -> kept
    assert(out.toMap === Map(1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> None, 5L -> Some(300L), 6L -> None))
  }

  test("asOf: NULL-time right rows are never a fill source") {
    // without the guard, the NULL-time row sorts first and forward-fills
    // every left row before the first real match
    val dirtyRight = Seq(("a", None: Option[Timestamp], 999L),
        ("a", Some(ts("2024-01-01 12:00:00")), 100L))
      .toDF("key", "rt", "v")
    val out = AsOfJoin.asOf(left.filter(col("id") === 1L), dirtyRight,
        "key", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect()
    assert(out === Seq(1L -> None))
  }

  test("asOf forward: earliest right row at or after left time, per key") {
    val out = AsOfJoin.asOf(left, right, "key", "t", "rt", Seq("v"),
        direction = "forward")
      .orderBy("id").select("id", "v")
      .as[(Long, Option[Long])].collect()
    assert(out === Seq(
      1L -> Some(100L),    // 10:00 -> earliest at/after is 12:00
      2L -> Some(100L),    // tie: right at the same instant matches (>=)
      3L -> Some(200L),    // 13:30 -> 14:00
      4L -> None,          // nothing after Jan 2 23:00
      5L -> None,          // b's only row (12:00) is BEFORE 12:30
      6L -> None))
  }

  test("asOf forward: tolerance measured in the forward direction") {
    val out = AsOfJoin.asOf(left, right, "key", "t", "rt", Seq("v"),
        toleranceUs = Some(1L * 3600 * 1000000), direction = "forward")
      .orderBy("id").select("id", "v")
      .as[(Long, Option[Long])].collect()
    // id=1 is 2h before its 12:00 match -> nulled; id=3 is 0.5h -> kept
    assert(out.toMap === Map(1L -> None, 2L -> Some(100L), 3L -> Some(200L),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("asOf nearest: closer side wins; one-sided rows fall back") {
    val out = AsOfJoin.asOf(left, right, "key", "t", "rt", Seq("v"),
        direction = "nearest")
      .orderBy("id").select("id", "v")
      .as[(Long, Option[Long])].collect()
    assert(out === Seq(
      1L -> Some(100L),    // backward empty -> forward 12:00
      2L -> Some(100L),    // distance 0 both ways (same row)
      3L -> Some(200L),    // 1.5h back vs 0.5h fwd -> forward
      4L -> Some(200L),    // forward empty -> backward 14:00 (33h)
      5L -> Some(300L),    // forward empty -> backward
      6L -> None))
  }

  test("asOf nearest: exact midpoint ties break backward") {
    val mid = Seq((9L, "a", ts("2024-01-01 13:00:00"))).toDF("id", "key", "t")
    val out = AsOfJoin.asOf(mid, right, "key", "t", "rt", Seq("v"),
        direction = "nearest")
      .select("id", "v").as[(Long, Option[Long])].collect()
    // 12:00 and 14:00 are both 1h away -> the backward match (100) wins
    assert(out === Seq(9L -> Some(100L)))
  }

  test("asOf nearest: per-direction tolerance can flip or null the pick") {
    val one = left.filter(col("id") === 3L) // 13:30: 1.5h back, 0.5h fwd
    val flip = AsOfJoin.asOf(one, right, "key", "t", "rt", Seq("v"),
        toleranceUs = Some(1L * 3600 * 1000000), direction = "nearest")
      .select("id", "v").as[(Long, Option[Long])].collect()
    assert(flip === Seq(3L -> Some(200L)),
      "backward out of tolerance -> forward must win")
    val none = AsOfJoin.asOf(one, right, "key", "t", "rt", Seq("v"),
        toleranceUs = Some(15L * 60 * 1000000), direction = "nearest")
      .select("id", "v").as[(Long, Option[Long])].collect()
    assert(none === Seq(3L -> None),
      "both directions out of tolerance -> null payload, row kept")
  }

  test("asOf: matched right time is exposed when listed as payload") {
    val out = AsOfJoin.asOf(left, right, "key", "t", "rt", Seq("rt"))
      .filter(col("id") === 3L)
      .select("rt").as[Option[Timestamp]].collect()
    assert(out === Seq(Some(ts("2024-01-01 12:00:00"))))
  }

  // intervals: (key, s, e, iid) — one 3h interval (spans >1 one-hour
  // bucket), one zero-length, one inverted, one adjacent-exclusive-end
  private lazy val intervals = Seq(
    ("a", ts("2024-01-01 10:30:00"), ts("2024-01-01 13:30:00"), 10L),
    ("a", ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00"), 11L), // empty
    ("a", ts("2024-01-01 12:00:00"), ts("2024-01-01 11:00:00"), 12L), // inverted
    ("b", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"), 13L)
  ).toDF("key", "s", "e", "iid")

  test("pointInInterval matches the naive theta join, exclusive end") {
    val points = left.select(col("id"), col("key"), col("t"))
    val got = RangeJoin.pointInInterval(points, intervals,
        "key", "t", "s", "e", bucketSeconds = 3600)
      .select("id", "iid").as[(Long, Long)].collect().sorted
    val want = points.as("p")
      .join(intervals.as("i"), expr("p.key = i.key AND p.t >= i.s AND p.t < i.e"))
      .select(col("p.id"), col("iid")).as[(Long, Long)].collect().sorted
    assert(got === want)
    // 10:00 too early for iid=10 (10:30 start); 12:00 and 13:30... 13:30 is
    // the exclusive end -> out; 12:00 in; b@12:30 is the exclusive end -> out
    assert(got === Array(2L -> 10L))
  }

  test("pointInInterval: interval spanning many buckets pairs exactly once") {
    val p = Seq((1L, "k", ts("2024-01-03 00:00:00"))).toDF("id", "key", "t")
    val iv = Seq(("k", ts("2024-01-01 00:00:00"), ts("2024-01-09 00:00:00"), 7L))
      .toDF("key", "s", "e", "iid")
    val got = RangeJoin.pointInInterval(p, iv, "key", "t", "s", "e", 3600)
      .select("id", "iid").as[(Long, Long)].collect()
    assert(got === Array(1L -> 7L))
  }

  test("intervalOverlap matches the naive theta join, one row per pair") {
    // long spans sharing many hour-buckets: the min-shared-bucket rule
    // must still emit each overlapping pair exactly once
    val a = Seq(
      ("k", 1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      ("k", 2L, ts("2024-01-02 12:00:00"), ts("2024-01-02 13:00:00")),
      ("k", 3L, ts("2024-01-05 00:00:00"), ts("2024-01-05 01:00:00"))
    ).toDF("key", "a_id", "a_s", "a_e")
    val b = Seq(
      ("k", 10L, ts("2024-01-01 12:00:00"), ts("2024-01-04 00:00:00")), // hits 1, 2
      ("k", 11L, ts("2024-01-03 00:00:00"), ts("2024-01-03 06:00:00")), // exclusive-end: misses 1
      ("k", 12L, ts("2024-01-04 23:00:00"), ts("2024-01-05 00:30:00"))  // hits 3
    ).toDF("key", "b_id", "b_s", "b_e")
    val got = RangeJoin.intervalOverlap(a, b, "key", "a_s", "a_e", "b_s", "b_e", 3600)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    val want = a.join(b, a("key") === b("key") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    assert(got === want)
    assert(got === Array(1L -> 10L, 2L -> 10L, 3L -> 12L))
  }

  test("resample ffill: aligned grid, forward fill, tolerance gaps") {
    val obs = Seq(
      ("k", ts("2024-01-01 10:15:00"), 1L),
      ("k", ts("2024-01-01 12:30:00"), 2L)
    ).toDF("key", "t", "v")
    val out = Resample.ffill(obs, "key", "t", Seq("v"), stepSeconds = 3600,
        toleranceUs = Some(90L * 60 * 1000000)) // 90 min
      .select("grid_ts", "v")
      .as[(java.sql.Timestamp, Option[Long])].collect().sortBy(_._1.getTime)
    // grid spans trunc(10:15)=10:00 .. trunc(12:30)=12:00
    assert(out.map(_._1) === Array(ts("2024-01-01 10:00:00"),
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")))
    // 10:00 precedes the first obs; 11:00 fills from 10:15 (45 min old);
    // 12:00 would fill from 10:15 but 105 min > 90 min tolerance -> gap
    assert(out.map(_._2) === Array(None, Some(1L), None))
  }

  test("sessionize: gap starts a session; ties never do") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // 30m gap -> same session
      (1L, ts("2024-01-01 10:30:00")), // duplicate ts -> same session
      (1L, ts("2024-01-01 17:00:00")), // 6.5h gap -> new session
      (2L, ts("2024-01-01 00:00:00"))  // other key: own session numbering
    ).toDF("user_id", "t")
    val out = Sessionize.sessions(ev, "user_id", "t", gapUs = 6L * 3600 * 1000000)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().sorted
    assert(out === Array((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("sessionize: session bounds are min/max epoch micros") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "t")
    val row = Sessionize.sessions(ev, "user_id", "t", 6L * 3600 * 1000000)
      .select("start_us", "end_us").as[(Long, Long)].collect().head
    assert(row._2 - row._1 === 3600L * 1000000)
  }
}
