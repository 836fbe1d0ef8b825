package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch store: per-partition (per-day) HyperLogLog sketches
  * persisted as binary columns, re-aggregable across any partition range
  * WITHOUT touching raw rows again — the incremental distinct-count
  * pattern every long-running pipeline needs (daily unique users /
  * unique documents / unique urls over arbitrary date windows). The
  * reference library's BigQuery lineage has exactly this in
  * HLL_COUNT.MERGE over pre-aggregated sketches; here it is Spark's
  * Datasketches HLL (`hll_sketch_agg` / `hll_union_agg` — codegen'd,
  * map-side-combinable partial aggregates).
  *
  * Scale posture: the daily build is one pass over that day's rows with
  * constant per-group state (lgK=12 → ≤ ~16 KB per sketch); a served
  * window reads |days × groups| SKETCH ROWS under a planning-time
  * partition filter — serving cost is independent of raw-row count.
  * Appending the same day twice is SAFE for the estimate (HLL union is
  * idempotent on duplicates — re-ingested rows cannot inflate the
  * distinct count), which makes retry semantics trivial.
  *
  * The estimate is approximate by construction, so the correctness gate
  * follows the repo's sketch-audit pattern (`heavy_hitters`,
  * `approx_distinct_users`): exact counts cross the oracle, the sketch
  * crosses as a bounded-relative-error flag. */
object SketchStore {

  // ---- lgK sidecar ------------------------------------------------------
  // hll_union_agg REJECTS mixed lgConfigK by default, so one append
  // with a different lgK would succeed silently and then make every
  // estimate() over a window containing it THROW at serve time. The
  // store records its lgK in a sidecar on first write and every later
  // append must match — the mismatch fails at append (where the caller
  // holds the wrong value), not at an unrelated later read.

  private def lgkPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_sketch_meta.json")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def storedLgK(spark: SparkSession, path: String): Option[Int] = {
    val fs = fsOf(spark, path)
    val p = lgkPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
      """"lgK"\s*:\s*(\d+)""".r.unanchored.findFirstMatchIn(txt)
        .map(_.group(1).toInt)
    }
  }

  private def requireAndRecordLgK(spark: SparkSession, path: String,
                                  lgK: Int): Unit = {
    storedLgK(spark, path) match {
      case Some(stored) =>
        require(stored == lgK,
          s"SketchStore at $path was built with lgK=$stored; appending " +
            s"lgK=$lgK sketches would make every estimate() over a window " +
            "containing them throw at serve time (hll_union_agg rejects " +
            "mixed lgConfigK) — pass the store's lgK or rebuild")
      case None =>
        val fs = fsOf(spark, path)
        val tmp = new org.apache.hadoop.fs.Path(s"$path/_sketch_meta.json__tmp")
        val out = fs.create(tmp, true)
        try out.write(s"""{"lgK":$lgK}""".getBytes("UTF-8"))
        finally out.close()
        org.apache.hadoop.fs.FileContext
          .getFileContext(lgkPath(path).toUri,
            spark.sparkContext.hadoopConfiguration)
          .rename(tmp, lgkPath(path),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Build and APPEND one partition's sketches: one hash-aggregate pass
    * over `df` (which should already be filtered to the partition's
    * rows), written under `part=<part>/`. `lgK` must match the store's
    * recorded precision (sidecar, stamped by the first write). */
  def append(df: DataFrame, groupCols: Seq[String], valueCol: String,
             path: String, part: String, lgK: Int = 12): Unit = {
    require(groupCols.nonEmpty, "SketchStore.append: need group columns")
    requireAndRecordLgK(df.sparkSession, path, lgK)
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
      .withColumn("part", lit(part))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** Build sketches for MANY partitions in one pass (initial backfill):
    * one hash aggregate keyed by (part, groups), one partitioned append
    * write. Daily increments then use [[append]]. */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
            partCol: String, path: String, lgK: Int = 12): Unit = {
    require(groupCols.nonEmpty, "SketchStore.build: need group columns")
    requireAndRecordLgK(df.sparkSession, path, lgK)
    df.groupBy((col(partCol).cast("string").as("part") +: groupCols.map(col)): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** Fold the store to ONE merged sketch row per (part, group) and one
    * file per `part=` directory — the small-file hygiene every other
    * maintained store has (IvfLayout.compact): a daily append lands one
    * file set per batch, so a long-running
    * [[graft.streaming.StreamingIncremental.streamingSketchMaintenance]]
    * stream otherwise grows per-estimate list/open cost with total
    * batch count. HLL union is associative, so merging the stored
    * sketch rows (`hll_union_agg` at the store's pinned lgK) serves
    * identical estimates; group columns are recovered from the schema
    * (everything except `part`/`sketch`). No run slots here — the
    * store's idempotency is HLL union itself — so no fold manifest:
    * a replayed append after a compact double-lands rows that CANNOT
    * change any estimate.
    *
    * Crash contract (the IvfLayout.compact discipline): staged fully
    * beside, installed by backup-rename + move; a leftover
    * `__compact_old` refuses a re-run. */
  def compact(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    graft.warehouse.Warehouse.requireAtomicRename(
      Option(fs.getScheme).getOrElse(""),
      spark.conf.getOption("spark.graft.warehouse.allowNonAtomicRename")
        .exists(_.equalsIgnoreCase("true")))
    require(fs.exists(root), s"SketchStore.compact: no store at $path")
    val lgK = storedLgK(spark, path).getOrElse(throw new IllegalStateException(
      s"SketchStore.compact: no _sketch_meta.json at $path — not a sketch store"))
    val tmp = new Path(path + "__compact_tmp")
    val old = new Path(path + "__compact_old")
    require(!fs.exists(old),
      s"SketchStore.compact: leftover $old from an interrupted compact — " +
        "restore it over the store path (or remove it) before re-running")
    fs.delete(tmp, true)
    val df = spark.read.parquet(path)
    val groups = df.schema.fieldNames.toSeq.filterNot(Set("part", "sketch"))
    df.groupBy((col("part") +: groups.map(col)): _*)
      .agg(hll_union_agg(col("sketch"), allowDifferentLgConfigK = false)
        .as("sketch"))
      .repartition(col("part"))
      .write.partitionBy("part").parquet(tmp.toString)
    // the lgK sidecar is a FILE — carry it into the staged tree
    val metaTmp = new Path(tmp, "_sketch_meta.json")
    val out = fs.create(metaTmp, true)
    try out.write(s"""{"lgK":$lgK}""".getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(root, old), s"SketchStore.compact: backup rename of $path failed")
    require(fs.rename(tmp, root), s"SketchStore.compact: install rename to $path failed")
    fs.delete(old, true)
  }

  /** Data-file count across the store (one recursive listing) — the
    * compaction trigger [[graft.streaming.StreamingIncremental
    * .streamingSketchMaintenance]] checks per batch; kept cheap BY the
    * compaction it triggers (file count stays ≈ parts + threshold). */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, path)
    if (!fs.exists(root)) return 0L
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) n += 1
    }
    n
  }

  /** Union-serve the store over a partition subset (None = all): reads
    * only the named `part=` directories (planning-time PartitionFilter),
    * merges per group, returns (groupCols..., n_approx). */
  def estimate(spark: SparkSession, path: String, groupCols: Seq[String],
               parts: Option[Seq[String]] = None): DataFrame = {
    val base = spark.read.parquet(path)
    val pruned = parts.map(p => base.filter(col("part").isin(p: _*))).getOrElse(base)
    pruned.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_approx"))
  }

  /** Audit a served window against the exact distinct count over the
    * same raw rows: (groupCols..., n_exact, hll_ok) where hll_ok pins
    * |approx − exact| ≤ tolPct% of exact. */
  def estimateAudit(raw: DataFrame, groupCols: Seq[String], valueCol: String,
                    spark: SparkSession, path: String,
                    parts: Option[Seq[String]] = None,
                    tolPct: Double = 5.0): DataFrame = {
    val exact = raw.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    val approx = estimate(spark, path, groupCols, parts)
    exact.join(approx, groupCols)
      .select(groupCols.map(col) :+ col("n_exact") :+
        (abs(col("n_approx") - col("n_exact")) <=
          lit(tolPct / 100.0) * col("n_exact")).as("hll_ok"): _*)
  }
}
