package graft.tools

import org.apache.spark.sql.functions._

/** 100 TB posture probe for the round-13 stores (SCALING.md):
  *
  * QuantileStore — the claim is that serve cost tracks the SUMMARY
  * (occupied buckets × groups × parts), not the corpus: build the
  * store over N raw rows, then time quantile() vs computing the same
  * quantile from the raw rows, at 1× and 10× N. Also record the
  * summary row count at both scales — occupied buckets saturate (the
  * value domain is what it is), so summary growth flattens while raw
  * rows grow linearly.
  *
  * CmsStore — the claim is constant d×w serve state independent of key
  * cardinality: build over N rows of ~1M distinct keys, record merged
  * cell count (≤ d·w·parts) and estimate() wall for a 100-key probe
  * set vs an exact groupBy count over the raw rows, plus the observed
  * overestimate distribution vs the e/w·N bound.
  *
  * Usage: runMain graft.tools.ProbeQuantCms [nBase] */
object ProbeQuantCms {
  def main(args: Array[String]): Unit = {
    val nBase = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val spark = graft.core.GraftSession.builder("local[32]", Some(32))
      .appName("probe-quant-cms").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // skewed long values (token-count-ish: mostly small, long tail),
    // 20 day-parts, 5 groups
    def corpus(n: Long) = spark.range(n).select(
      concat(lit("day"), (col("id") % 20).cast("string")).as("part"),
      concat(lit("g"), (col("id") % 5).cast("string")).as("grp"),
      (pmod(hash(col("id")), lit(1000)).cast("long") *
        pmod(hash(col("id"), lit(1)), lit(97)).cast("long")).as("v"),
      concat(lit("k"), pmod(hash(col("id"), lit(2)),
        lit(1000000)).cast("string")).as("key"))

    println("[probe] === QuantileStore: serve tracks summary, not corpus ===")
    for (mult <- Seq(1L, 10L)) {
      val n = nBase * mult / 10
      val df = corpus(n)
      val p = java.nio.file.Files.createTempDirectory(s"probe_quant_$mult").toString
      val (_, tBuild) = timed {
        graft.operators.QuantileStore.write(df, Seq("grp"), "v", "part", p,
          width = 100L)
      }
      val summaryRows = spark.read.parquet(s"$p/quant").count()
      val (_, tServe) = timed {
        graft.operators.QuantileStore.quantile(spark, p, Seq("grp"), 1L, 2L)
          .collect()
      }
      val (_, tServe2) = timed {
        graft.operators.QuantileStore.quantile(spark, p, Seq("grp"), 9L, 10L)
          .collect()
      }
      val (_, tDirect) = timed {
        // the serve the store replaces: exact median from raw rows
        df.groupBy("grp").agg(expr("percentile(v, 0.5)")).collect()
      }
      println(f"[probe] quant n=$n%,d summaryRows=$summaryRows%,d " +
        f"build=$tBuild%.1fs serve_p50=$tServe%.2fs serve_p90=$tServe2%.2fs " +
        f"direct_raw_median=$tDirect%.1fs")
    }

    println("[probe] === CmsStore: constant cells, any-key estimates ===")
    val n = nBase
    val df = corpus(n).cache()
    val trueCounts = df.groupBy("key").count()
      .orderBy(desc("count")).limit(100)
      .as[(String, Long)].collect()
    val p = java.nio.file.Files.createTempDirectory("probe_cms_").toString
    val (_, tBuild) = timed {
      graft.operators.CmsStore.write(df, "key", "part", p,
        depth = 4, width = 4096)
    }
    val cells = graft.operators.CmsStore.mergedCells(spark, p).count()
    val probes = trueCounts.map(_._1).toSeq.toDF("k")
    val (est, tServe) = timed {
      graft.operators.CmsStore.estimate(spark, p, probes, "k")
        .as[(String, Long)].collect().toMap
    }
    val (_, tDirect) = timed {
      df.groupBy("key").count().filter(
        col("key").isin(trueCounts.map(_._1).toSeq: _*)).collect()
    }
    val errs = trueCounts.map { case (k, c) => est(k) - c }
    require(errs.forall(_ >= 0), "one-sided guarantee violated")
    val bound = math.E / 4096.0 * n
    println(f"[probe] cms n=$n%,d distinctKeys~1M mergedCells=$cells%,d " +
      f"(d*w*parts bound=${4 * 4096 * 20}%,d) build=$tBuild%.1fs " +
      f"serve100keys=$tServe%.2fs direct_groupBy=$tDirect%.1fs")
    println(f"[probe] cms overestimate: max=${errs.max}%,d " +
      f"mean=${errs.sum / errs.length}%,d eN/w bound=$bound%,.0f " +
      f"(observed max/bound=${errs.max / bound}%.3f)")

    println("[probe] === BloomStore: sparse positions, any-key membership ===")
    // ~1M distinct keys into 2^24 cells x 4 rows: position rows track
    // DISTINCT KEYS (x d), not raw rows — the dedupe the sparse
    // representation buys at build time
    val bp = java.nio.file.Files.createTempDirectory("probe_bloom_").toString
    val (_, tbBuild) = timed {
      graft.operators.BloomStore.write(df, "key", "part", bp,
        depth = 4, width = 1 << 24)
    }
    val posRows = spark.read.parquet(bp).count()
    val presentKeys = trueCounts.map(_._1).toSeq
    val absentKeys = presentKeys.map("zz" + _)
    val (verd, tbServe) = timed {
      graft.operators.BloomStore.mightContain(spark, bp,
        (presentKeys ++ absentKeys).toDF("k"), "k")
        .as[(String, Boolean)].collect().toMap
    }
    require(presentKeys.forall(verd(_)), "bloom false negative")
    val fp = absentKeys.count(verd(_))
    println(f"[probe] bloom n=$n%,d distinctKeys~1M posRows=$posRows%,d " +
      f"(= d x per-part distinct keys, part-pruned; per-part bound " +
      f"min(d*keysInPart, d*w)) build=$tbBuild%.1fs " +
      f"serve200keys=$tbServe%.2fs falsePos=$fp/100 absent")
    spark.stop()
  }
}
