package graft.tools

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Dedup, KMeans, Packing, TextStats}
import graft.operators.{AsOfJoin, RangeJoin, Sessionize}

/** Scaling probe for the round-3 operators at 1x vs 10x input size.
  * Events scale by replicating the month with per-copy time offsets
  * (10x = 10 months — MORE keys and MORE time, not denser data, the
  * realistic growth axis); documents scale like ScaleProbe (id offsets).
  * Linear-ish wall-clock growth here is the evidence the bucketed /
  * union-window / sharded shapes do not hide a quadratic term. */
object ScaleProbeExt {
  private val kClusters = 8

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev0 = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "user_id", "event_type", "ts", "value")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def events(k: Int) = (0 until k).map(i =>
      ev0.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        (col("user_id") + lit(i * 1000L)).as("user_id"), col("event_type"),
        (col("ts") + expr(s"INTERVAL ${i * 31} DAYS")).as("ts"), col("value")))
      .reduce(_ unionByName _)
    def docs(k: Int) = (0 until k).map(i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.1f s   rows=$n")
    }

    for (k <- Seq(1, 10)) {
      val ev = events(k).cache(); val nEv = ev.count()
      val dc = docs(k).cache(); val nDc = dc.count()
      println(s"=== x$k  (events=$nEv docs=$nDc) ===")

      time(s"asof_join x$k") {
        val snaps = ev.filter(col("value") >= 150)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("snap_ts"))
          .agg(count(lit(1)).as("n_snap"))
        AsOfJoin.asOf(ev.select("event_id", "event_type", "ts"), snaps,
          "event_type", "ts", "snap_ts", Seq("n_snap"),
          toleranceUs = Some(6L * 3600 * 1000000)).count()
      }
      time(s"range_join x$k") {
        val alerts = ev.filter(col("value") >= 300)
          .select(col("event_type"), col("ts").as("astart"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("aend"))
        RangeJoin.pointInInterval(ev.select("event_id", "event_type", "ts"),
          alerts, "event_type", "ts", "astart", "aend", 3600).count()
      }
      time(s"sessionize x$k") {
        Sessionize.sessions(ev.select("user_id", "ts"), "user_id", "ts",
          6L * 3600 * 1000000).count()
      }
      time(s"segment_dedup x$k") {
        val prepped = dc.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        Curation.segmentDedup(prepped, "toks", "doc_id",
          t => Curation.wordChunks(t, 10), " ").count()
      }
      time(s"pack_bins x$k") {
        val withN = dc.select(col("doc_id"),
          TextStats.wsTokenCount(col("text")).cast("long").as("n_tokens"))
        Packing.packBins(withN, "doc_id", "n_tokens", 512L, 64).count()
      }
      time(s"components x$k") {
        val pairs = Dedup.minhashNearDupPairs(dc, "text", "doc_id", 0.8)
        graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b").count()
      }
      time(s"decontaminate x$k") {
        Curation.decontaminate(dc,
          dc.filter(pmod(col("doc_id"), lit(20L)) === 0),
          "text", "doc_id", minHits = 5L).count()
      }
      time(s"kmeans_fit_assign x$k") {
        val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        val scaled = (0 until k).map(i =>
          emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
          .reduce(_ unionByName _)
        val cents = KMeans.fit(scaled, "embedding", "vec_id", kClusters, iters = 5,
          corpusRows = Some(2000L * k))
        KMeans.assign(scaled, "embedding", cents).groupBy("cid").count().count()
      }
      ev.unpersist(); dc.unpersist()
    }
    spark.stop()
  }
}
