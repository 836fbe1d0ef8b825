package graft.llm

import graft.SparkSpec
import graft.operators.{EdgeStore, SampleStore, TopKStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Every store's deletion-marker / drop-set join must survive the
  * SHUFFLED regime: the broadcast hint is a size-guarded optimization
  * (the [[Denylist]] byte ceiling), never a correctness dependency — a
  * takedown set larger than the ceiling costs a shuffle, not a driver
  * OOM, and erases exactly the same rows (the r17 "What's wrong #2"
  * class, closed here on the STORE drop paths: tombstone exclusion,
  * EdgeStore.dropNodes, TopKStore/SampleStore.dropKeys, ChunkStore's
  * tombstone-max and requested-id joins). Each case below forces the
  * guard with a 0-byte ceiling AND kills Spark's automatic broadcast
  * thresholds, so any Broadcast in a plan could only come from an
  * unconditional hint — the defect class under test. */
class DropSizingSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` in the forced-shuffle regime: 0-byte graft ceiling,
    * automatic broadcast thresholds off. */
  private def forced[T](body: => T): T = {
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.denylist.broadcastMaxBytes", "0")
      body
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.denylist.broadcastMaxBytes")
    }
  }

  test("tombstone exclusion: hinted under the ceiling, shuffled past it, identical rows") {
    val p = Files.createTempDirectory("graft_tomb_sz_").toString
    Tombstones.add(Seq(2L, 4L).toDF("id"), "id", p)
    val df = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // control: a tiny marker dir pins the broadcast anti-join
    val hinted = Tombstones.exclude(df, "doc_id", spark, p)
    assert(hinted.queryExecution.sparkPlan.toString.contains("Broadcast"),
      hinted.queryExecution.sparkPlan.toString)
    forced {
      val big = Tombstones.exclude(df, "doc_id", spark, p)
      assert(!big.queryExecution.sparkPlan.toString.contains("Broadcast"),
        big.queryExecution.sparkPlan.toString)
      assert(big.as[Long].collect().sorted === Seq(1L, 3L, 5L))
    }
  }

  test("EdgeStore.dropNodes erases identically in the shuffled regime") {
    val p = Files.createTempDirectory("graft_es_sz_").toString
    EdgeStore.write(Seq((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 7L))
        .toDF("src", "dst", "w"),
      "src", "dst", Some("w"), p, nBuckets = 4)
    EdgeStore.compact(spark, p)
    forced {
      val (_, removed) =
        EdgeStore.dropNodes(spark, p, Seq(2L).toDF("n"), "n")
      assert(removed === 2L, "(1,2) and (2,3) both mention node 2")
    }
    assert(EdgeStore.read(spark, p).as[(Long, Long, Long)].collect().toSet
      === Set((3L, 4L, 7L)))
  }

  test("TopKStore.dropKeys keeps the hand-pinned bound algebra in the shuffled regime") {
    // the TopKStoreSpec fixture: d1 keeps x:5 y:3 (cut 2), d2 keeps
    // x:4 z:4 (cut 1) at m=2 — dropping x must serve z:4..6, y:3..4
    def expand(part: String, vc: (String, Int)*) =
      vc.flatMap { case (v, c) => Seq.fill(c)((part, v)) }
    val p = Files.createTempDirectory("graft_tk_sz_").toString
    TopKStore.write(
      (expand("d1", "x" -> 5, "y" -> 3, "z" -> 2, "w" -> 1) ++
        expand("d2", "x" -> 4, "z" -> 4, "q" -> 1)).toDF("day", "v"),
      Seq.empty, "v", "day", p, m = 2)
    forced {
      TopKStore.dropKeys(spark, p, Seq("x").toDF("v"), "v")
    }
    assert(TopKStore.topK(spark, p, Seq.empty, 3)
      .as[(String, Long, Long, Boolean)].collect().toSeq
      === Seq(("z", 4L, 6L, false), ("y", 3L, 4L, false)))
  }

  test("SampleStore.dropKeys serves the exact surviving bottom-k in the shuffled regime") {
    def docs(part: String, ids: String*) =
      ids.map(id => (part, id)).toDF("day", "doc")
    val all = docs("d1", (1 to 10).map(i => s"a$i"): _*)
    val p = Files.createTempDirectory("graft_smp_sz_").toString
    SampleStore.write(all, Seq.empty, "doc", "day", p, kMax = 20)
    val dropped = Seq("a1", "a2")
    forced {
      SampleStore.dropKeys(spark, p, dropped.toDF("doc"), "doc")
    }
    val got = SampleStore.sample(spark, p, Seq.empty, k = 10)
      .as[(String, String)].collect().toSeq
    val want = all.filter(!col("doc").isin(dropped: _*))
      .select(col("doc").as("key")).distinct()
      .withColumn("hkey", md5(col("key")))
      .orderBy(col("hkey").asc, col("key").asc).limit(10)
      .as[(String, String)].collect().toSeq
    assert(got === want)
  }

  test("ChunkStore: tombstone-max and requested-id joins reconstruct identically shuffled") {
    val p = Files.createTempDirectory("graft_ch_sz_").toString
    ChunkStore.write(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text"),
      "text", "doc_id", p, nBuckets = 4)
    ChunkStore.deleteDocs(Seq(2L).toDF("doc_id"), "doc_id", p)
    forced {
      val got = ChunkStore.reconstructDocs(spark, p,
          Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id")
        .as[(Long, String)].collect().toMap
      assert(got === Map(1L -> "alpha", 3L -> "gamma"),
        "tombstoned doc stays hidden; survivors reconstruct byte-exact")
    }
  }
}
