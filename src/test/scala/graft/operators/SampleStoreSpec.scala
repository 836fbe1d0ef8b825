package graft.operators

import graft.SparkSpec
import graft.llm.RunSlots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SampleStore: maintained bottom-k consistent sample — exactness vs a
  * direct bottom-k over raw rows, consistency across windows, duplicate
  * collapse, run-slot exactly-once, exact pruning fold. */
class SampleStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(part: String, ids: String*) =
    ids.map(id => (part, id)).toDF("day", "doc")

  /** The ground truth the store must reproduce: bottom-k of the window's
    * DISTINCT keys under (md5(key), key). */
  private def direct(df: org.apache.spark.sql.DataFrame, k: Int,
                     parts: Seq[String]): Seq[(String, String)] =
    df.filter(col("day").isin(parts: _*))
      .select(col("doc").as("key")).distinct()
      .withColumn("hkey", md5(col("key")))
      .orderBy(col("hkey").asc, col("key").asc).limit(k)
      .as[(String, String)].collect().toSeq

  test("window serve equals the direct bottom-k over raw rows") {
    val all = docs("d1", (1 to 40).map(i => s"a$i"): _*)
      .union(docs("d2", (1 to 40).map(i => s"b$i"): _*))
      .union(docs("d3", (1 to 40).map(i => s"c$i"): _*))
    val p = Files.createTempDirectory("graft_smp_").toString
    SampleStore.write(all, Seq.empty, "doc", "day", p, kMax = 10)
    for (window <- Seq(Seq("d1"), Seq("d1", "d2"), Seq("d1", "d2", "d3")))
      assert(SampleStore.sample(spark, p, Seq.empty, 10, Some(window))
        .as[(String, String)].collect().toSeq === direct(all, 10, window),
        s"window $window")
    // consistency: a key sampled in a window stays sampled in every
    // window it belongs to (bottom-k under one fixed hash order)
    val s1 = direct(all, 10, Seq("d1")).map(_._1).toSet
    val s12 = direct(all, 10, Seq("d1", "d2")).map(_._1).toSet
    assert((s12.filter(_.startsWith("a")) -- s1).isEmpty,
      "d1 keys in the d1+d2 sample must come from the d1 sample")
  }

  test("duplicate keys collapse: the sample is over the key SET") {
    val dup = docs("d1", "x", "x", "x", "y", "z", "z")
    val p = Files.createTempDirectory("graft_smp_dup_").toString
    SampleStore.write(dup, Seq.empty, "doc", "day", p, kMax = 5)
    val got = SampleStore.sample(spark, p, Seq.empty, 5)
      .as[(String, String)].collect().toSeq
    assert(got.map(_._1).sorted === Seq("x", "y", "z"))
    assert(got === direct(dup, 5, Seq("d1")))
  }

  test("append merges; replay, fold, and folded replay cannot change the sample") {
    val base = docs("d1", (1 to 30).map(i => s"a$i"): _*)
    val batch = docs("d1", (1 to 30).map(i => s"n$i"): _*)
    val p = Files.createTempDirectory("graft_smp_rp_").toString
    SampleStore.write(base, Seq.empty, "doc", "day", p, kMax = 8)
    SampleStore.appendBatch(batch, Seq.empty, "doc", "day", p, 0L)
    val expect = direct(base.union(batch), 8, Seq("d1"))
    def got() = SampleStore.sample(spark, p, Seq.empty, 8)
      .as[(String, String)].collect().toSeq
    assert(got() === expect)
    SampleStore.appendBatch(batch, Seq.empty, "doc", "day", p, 0L)
    assert(got() === expect, "slot replay must overwrite, not add")
    SampleStore.compact(spark, p)
    assert(got() === expect, "pruning fold must not move the sample")
    assert(RunSlots.foldedRuns(spark, s"$p/sample").contains("b0"))
    // fold is a real prune: one instance row set, <= kMax rows per part
    assert(spark.read.parquet(s"$p/sample").count() === 8L)
    SampleStore.appendBatch(batch, Seq.empty, "doc", "day", p, 0L)
    assert(got() === expect, "folded replay must be a no-op")
    // a FRESH batch still shifts the sample
    val fresh = docs("d1", (1 to 30).map(i => s"f$i"): _*)
    SampleStore.appendBatch(fresh, Seq.empty, "doc", "day", p, 1L)
    assert(got() === direct(base.union(batch).union(fresh), 8, Seq("d1")))
  }

  test("grouped sampling ranks within each group") {
    val rows = Seq(("d1", "g1", "a"), ("d1", "g1", "b"), ("d1", "g1", "c"),
      ("d1", "g2", "a"), ("d1", "g2", "d")).toDF("day", "grp", "doc")
    val p = Files.createTempDirectory("graft_smp_g_").toString
    SampleStore.write(rows, Seq("grp"), "doc", "day", p, kMax = 2)
    val got = SampleStore.sample(spark, p, Seq("grp"), 2)
      .select("grp", "key").as[(String, String)].collect().toSet
    val want = rows.select(col("grp"), col("doc").as("key")).distinct()
      .withColumn("hkey", md5(col("key")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("hkey").asc, col("key").asc)))
      .filter(col("rn") <= 2).select("grp", "key")
      .as[(String, String)].collect().toSet
    assert(got === want)
  }

  test("dropKeys removes keys everywhere; complete instances stay exact") {
    val all = docs("d1", (1 to 10).map(i => s"a$i"): _*)
      .union(docs("d2", (1 to 10).map(i => s"b$i"): _*))
    val p = Files.createTempDirectory("graft_smp_drop_").toString
    // kMax covers every instance -> storage is complete, so post-drop
    // serves are the exact bottom-k of the surviving raw key set
    SampleStore.write(all, Seq.empty, "doc", "day", p, kMax = 20)
    val drop = Seq("a1", "a2", "b3", "b9")
    SampleStore.dropKeys(spark, p, drop.toDF("doc"), "doc")
    val got = SampleStore.sample(spark, p, Seq.empty, k = 12)
      .as[(String, String)].collect().toSeq
    assert(got === direct(all.filter(!col("doc").isin(drop: _*)), 12,
      Seq("d1", "d2")))
    assert(got.map(_._1).toSet.intersect(drop.toSet).isEmpty)
    // idempotent
    SampleStore.dropKeys(spark, p, drop.toDF("doc"), "doc")
    assert(SampleStore.sample(spark, p, Seq.empty, k = 12)
      .as[(String, String)].collect().toSeq === got)
  }

  test("dropKeys degraded corner: a survivor beyond stored depth is honestly absent, never substituted") {
    // kMax=2 over 4 keys: only the hash-order bottom-2 are stored.
    // Dropping one of them cannot promote the unstored 3rd key — the
    // serve returns the surviving STORED key only (shallower, unbiased)
    val keys = Seq("k1", "k2", "k3", "k4")
    val byHash = keys.sortBy { k =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (h, k)
    }
    val p = Files.createTempDirectory("graft_smp_deg_").toString
    SampleStore.write(docs("d1", keys: _*), Seq.empty, "doc", "day", p,
      kMax = 2)
    SampleStore.dropKeys(spark, p, Seq(byHash.head).toDF("doc"), "doc")
    val got = SampleStore.sample(spark, p, Seq.empty, k = 2)
      .as[(String, String)].collect().toSeq.map(_._1)
    assert(got === Seq(byHash(1)),
      s"only the surviving stored key serves (order: $byHash), got $got")
  }

  test("kMax is pinned: serve beyond it refuses, appends cannot shrink it") {
    val p = Files.createTempDirectory("graft_smp_k_").toString
    SampleStore.write(docs("d1", "a", "b", "c"), Seq.empty, "doc", "day",
      p, kMax = 2)
    assert(SampleStore.readMeta(spark, p) === 2)
    val e = intercept[IllegalArgumentException] {
      SampleStore.sample(spark, p, Seq.empty, 3)
    }
    assert(e.getMessage.contains("kMax"))
  }
}
