package graft.operators

import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.SparkSpec
import graft.materialize.Scd2

/** Round-8 additions: dbt schema tests (DataQuality), table profiling
  * (Profile), and dbt snapshots (Scd2) — each pinned on crafted fixtures
  * where every arm of the semantics lands at least one row. */
class R8Spec extends SparkSpec {
  import spark.implicits._

  // ---- DataQuality ------------------------------------------------------

  test("DataQuality: all four dbt test kinds count exactly, dbt semantics") {
    val child = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, Option("a"), Option(20L)),   // 'a' duplicated -> ONE unique violation
      (3L, Option("b"), Option(99L)),   // 99 has no parent -> orphan
      (4L, None, None),                 // null flag -> not_null violation;
                                        // null fk passes relationships
      (5L, Option("z"), Option(10L))    // 'z' outside accepted set
    ).toDF("id", "flag", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("pk")

    val got = DataQuality.report(Seq(
      DataQuality.notNull(child, "flag"),
      DataQuality.unique(child, "flag"),
      DataQuality.acceptedValues(child, "flag", Seq("a", "b")),
      DataQuality.relationships(child, "fk", parent, "pk")))
      .as[(String, Long)].collect().toMap

    assert(got("not_null:flag") === 1L)
    // dbt unique counts duplicated VALUES, not rows: 'a' twice -> 1
    assert(got("unique:flag") === 1L)
    // nulls are NOT accepted_values violations (dbt composes with not_null)
    assert(got("accepted_values:flag") === 1L)
    // null fks pass; 99 is the only orphan
    assert(got("relationships:fk->pk") === 1L)
  }

  test("DataQuality: clean table reports zero across the board") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val got = DataQuality.report(Seq(
      DataQuality.notNull(t, "v"),
      DataQuality.unique(t, "id"),
      DataQuality.relationships(t, "id", t, "id")))
      .as[(String, Long)].collect()
    assert(got.forall(_._2 == 0L), s"expected all-zero, got ${got.toSeq}")
  }

  // ---- Profile ----------------------------------------------------------

  test("Profile: exact counts, null accounting, native-type min/max") {
    val t = Seq(
      (Option(3L), Option("b")),
      (Option(1L), None),
      (Option(10L), Option("a")),
      (None, Option("a"))
    ).toDF("n", "s")
    val rows = Profile.profile(t, Seq("n", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("n") === (("n", 4L, 1L, 3L, "1", "10")))  // numeric order: 10 > 3
    assert(rows("s") === (("s", 4L, 1L, 2L, "a", "b")))
  }

  test("Profile: approx variant estimates within rsd and plans WITHOUT Expand") {
    val docs = sf("sf0.01", "documents")
    val exact = Profile.profile(docs, Seq("doc_id", "source", "lang"))
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approxDf = Profile.profileApprox(docs, Seq("doc_id", "source", "lang"), rsd = 0.02)
    val approx = approxDf
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(math.abs(a - e).toDouble / e <= 0.10,
        s"column $c: approx $a vs exact $e drifts past 10%")
    }
    // the at-scale contract: single pass, no Expand replication
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      "profileApprox must not replicate the scan through Expand")
    val exactPlan = Profile.profile(docs, Seq("doc_id", "source", "lang"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct is expected to pay Expand (documented cost)")
  }

  // ---- Scd2 -------------------------------------------------------------

  private val t1 = lit("2026-01-01 00:00:00")
  private val t2 = lit("2026-02-01 00:00:00")
  private val t3 = lit("2026-03-01 00:00:00")
  private val T1 = Timestamp.valueOf("2026-01-01 00:00:00")
  private val T2 = Timestamp.valueOf("2026-02-01 00:00:00")
  private val T3 = Timestamp.valueOf("2026-03-01 00:00:00")

  test("Scd2: every state-machine arm — close-on-change, close-on-delete, carry, open-changed, open-new") {
    val s1 = Seq((1L, "keep"), (2L, "old"), (3L, "gone")).toDF("k", "v")
    val s2 = Seq((1L, "keep"), (2L, "new"), (4L, "fresh")).toDF("k", "v")
    val snap = Scd2.snapshot(Scd2.init(s1, t1), s2,
      Seq("k"), Seq("v"), t2, hardDeletes = true)
      .as[(Long, String, Timestamp, Timestamp)].collect().toSet

    assert(snap === Set(
      (1L, "keep", T1, null),   // carried unchanged, original valid_from
      (2L, "old", T1, T2),      // closed on change
      (2L, "new", T2, null),    // reopened with the new value
      (3L, "gone", T1, T2),     // closed on hard delete
      (4L, "fresh", T2, null))) // brand-new key
  }

  test("Scd2: soft deletes stay current; history is untouched by later folds") {
    val s1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s2 = Seq((1L, "a2")).toDF("k", "v") // 2 vanishes, 1 changes
    val snap2 = Scd2.snapshot(Scd2.init(s1, t1), s2,
      Seq("k"), Seq("v"), t2, hardDeletes = false)
    val got2 = snap2.as[(Long, String, Timestamp, Timestamp)].collect().toSet
    assert(got2 === Set(
      (1L, "a", T1, T2), (1L, "a2", T2, null),
      (2L, "b", T1, null))) // soft delete: still current

    // third state: nothing changes — the closed (1,"a") row must ride
    // through the fold bit-identical, and no new versions appear
    val s3 = Seq((1L, "a2"), (2L, "b")).toDF("k", "v")
    val got3 = Scd2.snapshot(snap2, s3, Seq("k"), Seq("v"), t3)
      .as[(Long, String, Timestamp, Timestamp)].collect().toSet
    assert(got3 === got2, "a no-change fold must be a fixpoint")
  }

  test("Scd2: null-safe change detection — NULL <-> value transitions version") {
    val s1 = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "v")
    val s2 = Seq((1L, Option.empty[String]), (2L, Option("y"))).toDF("k", "v")
    val got = Scd2.snapshot(Scd2.init(s1, t1), s2, Seq("k"), Seq("v"), t2)
      .as[(Long, Option[String], Timestamp, Timestamp)].collect().toSet
    assert(got === Set(
      (1L, Some("x"), T1, T2), (1L, None, T2, null),
      (2L, None, T1, T2), (2L, Some("y"), T2, null)))
  }

  test("Scd2: multi-column keys and ride-along payload columns") {
    val s1 = Seq((1L, "eu", "p1", 100L)).toDF("k", "region", "v", "extra")
    val s2 = Seq((1L, "eu", "p2", 700L)).toDF("k", "region", "v", "extra")
    // only v is checked: extra changing alone must NOT version...
    val sameV = Seq((1L, "eu", "p1", 999L)).toDF("k", "region", "v", "extra")
    val noop = Scd2.snapshot(Scd2.init(s1, t1), sameV,
      Seq("k", "region"), Seq("v"), t2)
      .as[(Long, String, String, Long, Timestamp, Timestamp)].collect().toSet
    assert(noop === Set((1L, "eu", "p1", 100L, T1, null)),
      "un-checked payload drift must not open a version")
    // ...but when v changes, the new version carries the NEW payload
    val versioned = Scd2.snapshot(Scd2.init(s1, t1), s2,
      Seq("k", "region"), Seq("v"), t2)
      .as[(Long, String, String, Long, Timestamp, Timestamp)].collect().toSet
    assert(versioned === Set(
      (1L, "eu", "p1", 100L, T1, T2),
      (1L, "eu", "p2", 700L, T2, null)))
  }

  // ---- RRF fusion -------------------------------------------------------

  private def ranked(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "rank", "doc_id")

  test("rrfFuse: hand-computed integer contributions, cross-list sum, id tie-break") {
    import graft.llm.Retrieval
    val lex = ranked((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 300L))
    val sem = ranked((1L, 1L, 200L), (1L, 2L, 400L))
    val got = Retrieval.rrfFuse(Seq(lex, sem), k = 10)
      .select("query_id", "rank", "doc_id", "score")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    val s = 1000000000000L
    def c(r: Long) = s / (60L + r)
    // 200 is in both lists (rank 2 + rank 1): the fused winner
    val expect = Seq(
      (1L, 1L, 200L, c(2) + c(1)),
      (1L, 2L, 100L, c(1)),
      (1L, 3L, 400L, c(2)),
      (1L, 4L, 300L, c(3)))
    assert(got.toSeq === expect)
  }

  test("rrfFuse: equal scores break ties by lower doc_id") {
    import graft.llm.Retrieval
    val a = ranked((7L, 1L, 900L))
    val b = ranked((7L, 1L, 50L))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .select("rank", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 50L), (2L, 900L)))
  }

  test("rrfFuse: single list preserves its ranking; k truncates") {
    import graft.llm.Retrieval
    val lex = ranked((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (2L, 1L, 40L))
    val got = Retrieval.rrfFuse(Seq(lex), k = 2)
      .select("query_id", "rank", "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 40L)))
  }
}
