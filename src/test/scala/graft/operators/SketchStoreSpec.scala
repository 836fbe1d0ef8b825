package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SketchStore: daily mergeable HLL sketches — build/append/union-serve
  * semantics. At spec cardinalities the Datasketches HLL is in its
  * exact (coupon) regime, so estimates are checked for equality, not
  * just tolerance. */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_sketch_spec_").toString

  private val rows = (for {
    day <- 1 to 4
    g <- Seq("a", "b")
    u <- 1 to (day * 10) // day d contributes users 1..10d per group
  } yield (s"2024-02-0$day", g, u.toLong)).toSeq

  test("union over all partitions equals the exact distinct count") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    SketchStore.build(df, Seq("grp"), "uid", "day", path)
    val est = SketchStore.estimate(spark, path, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // users overlap across days: distinct = 40 per group
    assert(est === Map("a" -> 40L, "b" -> 40L))
  }

  test("incremental append + pruned window serve") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    // backfill days 1-2, then append days 3-4 (two independent builds)
    SketchStore.build(df.filter(col("day") <= "2024-02-02"), Seq("grp"), "uid", "day", path)
    SketchStore.build(df.filter(col("day") > "2024-02-02"), Seq("grp"), "uid", "day", path)
    val win = SketchStore.estimate(spark, path, Seq("grp"),
        Some(Seq("2024-02-01", "2024-02-02")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(win === Map("a" -> 20L, "b" -> 20L)) // users 1..20 in days 1-2
    val full = SketchStore.estimate(spark, path, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full === Map("a" -> 40L, "b" -> 40L))
  }

  test("lgK is recorded on first write and a mismatched append fails at append time") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    SketchStore.build(df.filter(col("day") <= "2024-02-02"),
      Seq("grp"), "uid", "day", path, lgK = 12)
    assert(SketchStore.storedLgK(spark, path) === Some(12))
    // the failure mode this prevents: hll_union_agg rejects mixed
    // lgConfigK, so an lgK=10 append would poison every later serve
    val e = intercept[IllegalArgumentException](
      SketchStore.append(df.filter(col("day") === "2024-02-03"),
        Seq("grp"), "uid", path, part = "2024-02-03", lgK = 10))
    assert(e.getMessage.contains("lgK=12"))
    // matching append still lands and serves
    SketchStore.append(df.filter(col("day") === "2024-02-03"),
      Seq("grp"), "uid", path, part = "2024-02-03", lgK = 12)
    val est = SketchStore.estimate(spark, path, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 30L, "b" -> 30L))
  }

  test("re-appending the same day cannot inflate the estimate") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    SketchStore.build(df, Seq("grp"), "uid", "day", path)
    // retry lands the same day again — HLL union is duplicate-proof
    SketchStore.append(df.filter(col("day") === "2024-02-03").drop("day"),
      Seq("grp"), "uid", path, part = "2024-02-03")
    val est = SketchStore.estimate(spark, path, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 40L, "b" -> 40L))
  }

  test("a pruned serve carries a planning-time part PartitionFilter") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    SketchStore.build(df, Seq("grp"), "uid", "day", path)
    val served = SketchStore.estimate(spark, path, Seq("grp"),
      Some(Seq("2024-02-01", "2024-02-02")))
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("part") && l.contains("IN") && !l.contains("IN ()")),
      s"expected a part IN (...) PartitionFilter, got: ${pf.mkString(" | ")}")
  }

  test("estimateAudit flags are true at exact-regime cardinalities") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    SketchStore.build(df, Seq("grp"), "uid", "day", path)
    val audit = SketchStore.estimateAudit(df, Seq("grp"), "uid", spark, path)
      .collect()
    assert(audit.length === 2)
    assert(audit.forall(_.getAs[Boolean]("hll_ok")))
    assert(audit.map(_.getAs[Long]("n_exact")).toSet === Set(40L))
  }

  test("compact folds sketch rows to one per (part, group), estimates unchanged, appends still work") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    // 4 appends of the SAME days — 4 sketch rows per (part, group)
    for (_ <- 1 to 4)
      SketchStore.build(df, Seq("grp"), "uid", "day", path)
    val before = SketchStore.estimate(spark, path, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val filesBefore = SketchStore.dataFileCount(spark, path)
    SketchStore.compact(spark, path)
    assert(SketchStore.estimate(spark, path, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === before,
      "compaction must not change estimates")
    val filesAfter = SketchStore.dataFileCount(spark, path)
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    assert(spark.read.parquet(path).groupBy("part", "grp").count()
      .agg(max("count")).first().getLong(0) === 1L,
      "one merged sketch row per (part, group)")
    // lgK sidecar carried: a matching append works, a mismatch refuses
    SketchStore.append(df.filter(col("day") === "2024-02-01"),
      Seq("grp"), "uid", path, "2024-02-05")
    intercept[IllegalArgumentException] {
      SketchStore.append(df, Seq("grp"), "uid", path, "2024-02-06", lgK = 13)
    }
    // a pruned window over the compacted layout still serves
    val win = SketchStore.estimate(spark, path, Seq("grp"),
        Some(Seq("2024-02-01", "2024-02-05")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(win === Map("a" -> 10L, "b" -> 10L))
  }

  test("compact refuses a leftover __compact_old instead of compounding") {
    val df = rows.toDF("day", "grp", "uid")
    val path = tmpDir()
    SketchStore.build(df, Seq("grp"), "uid", "day", path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path + "__compact_old"))
    val e = intercept[IllegalArgumentException](SketchStore.compact(spark, path))
    assert(e.getMessage.contains("interrupted compact"))
  }
}
