package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.RunSlots

/** Sparse value-bucket summary store — the UNBOUNDED-RANGE distribution
  * member of the maintained-store family, complementing [[HistStore]]:
  * where HistStore pins a dense `[lo, hi) × nBins` layout at seed time
  * (and saturates its overflow bin when the corpus outgrows it), this
  * store keeps one count per OCCUPIED bucket `floor(value / width)` —
  * any Long value, negative or huge, lands in a real bucket, so
  * quantiles never saturate and no range guess is needed up front. The
  * 100 TB question it answers: "exact token-length / score quantiles
  * over the last N days" when the value range is unknown or open-ended,
  * as a |parts × groups × occupied-buckets| summary scan under a
  * planning-time `part` PartitionFilter.
  *
  * The trade vs HistStore is storage SHAPE: nBins is fixed while
  * occupied-bucket count is data-dependent (≤ distinct(value div width)
  * per part-group — for integer telemetry like token counts this is
  * tiny; for near-continuous values pick a width that makes it so, or
  * [[coarsen]] later: widening is EXACT, a from-scratch rebuild is
  * never needed).
  *
  * Exactness contract: counts are exact integers merged by addition;
  * bucketing is exact floor division written with POSITIVE-operand
  * truncating division only (`v div w` / `-((-v + w - 1) div w)`), the
  * one integer-division form Spark `div` and DuckDB `//` agree on for
  * negative values — every serve crosses a DuckDB oracle bit-for-bit
  * (gates `quantile_store`, `quantile_serve`, `quantile_coarsen`,
  * `stream_quantile`). A quantile resolves to its bucket bounds
  * `[b*width, (b+1)*width)` — always finite, unlike HistStore's
  * unbounded under/overflow bins.
  *
  * Delivery: additive counts ⇒ replayed batches would double-count —
  * appends are run-slot scoped ([[graft.llm.RunSlots]]; the
  * [[HistStore]]/[[EdgeStore]] posture): a replay overwrites its own
  * `run=<id>` slot, and after [[compact]] folds slots the fold manifest
  * turns the replay into a write-level no-op. */
object QuantileStore {

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Layout sidecar lives INSIDE the quant tree so [[coarsen]] installs
    * rewritten buckets and the new width in ONE atomic rename (the
    * HistStore r13 lesson, adopted from day one here). */
  private def metaPath(tree: String) =
    new org.apache.hadoop.fs.Path(s"$tree/_quant_meta.json")

  private def writeMetaInto(spark: SparkSession, tree: String,
                            width: Long): Unit = {
    val (fs, _) = fsOf(spark, tree)
    val live = metaPath(tree)
    val tmp = new org.apache.hadoop.fs.Path(s"$tree/_quant_meta.json__tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"width":$width}""".getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(live.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, live, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[graft] def readWidth(spark: SparkSession, path: String): Long = {
    val (fs, _) = fsOf(spark, s"$path/quant")
    val p = metaPath(s"$path/quant")
    require(fs.exists(p),
      s"QuantileStore: no _quant_meta.json at $path — not a quantile store")
    val in = fs.open(p)
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    """"width"\s*:\s*(\d+)""".r.unanchored.findFirstMatchIn(txt)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"QuantileStore: unparseable _quant_meta.json at $path: $txt"))
  }

  /** Exact log2 bucket of a Long — the RELATIVE-error mode's binning:
    * bucket 0 holds v = 0, bucket b ≥ 1 holds [2^(b−1), 2^b) (b =
    * binary digit count = floor(log2 v)+1 — `length(bin(v))`, exact
    * integer in Spark AND DuckDB), negatives land in bucket −1 (out of
    * the mode's domain but never silently mixed with huge positives —
    * bin() of a negative is 64 two's-complement digits). ≤ 65 buckets
    * total, ever. */
  def log2Bucket(v: Column): Column =
    when(v < 0, lit(-1L))
      .when(v === 0, lit(0L))
      .otherwise(length(bin(v)).cast("long"))

  private def readLog2(spark: SparkSession, path: String): Boolean = {
    val (fs, _) = fsOf(spark, s"$path/quant")
    val p = metaPath(s"$path/quant")
    if (!fs.exists(p)) return false
    val in = fs.open(p)
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    txt.contains("\"log2\":true")
  }

  private def writeMetaLog2Into(spark: SparkSession, tree: String): Unit = {
    val (fs, _) = fsOf(spark, tree)
    val live = metaPath(tree)
    val tmp = new org.apache.hadoop.fs.Path(s"$tree/_quant_meta.json__tmp")
    val out = fs.create(tmp, true)
    try out.write("""{"width":1,"log2":true}""".getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(live.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, live, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Exact floor(v / w) using only POSITIVE-operand truncating division
    * — `div` (Spark) and `//` (DuckDB) agree on non-negative operands;
    * they disagree on negatives (truncate vs floor), so negatives are
    * routed through the `-((-v + w - 1) div w)` identity. */
  private def floorDivSql(v: String, w: Long): String =
    s"CASE WHEN $v >= 0L THEN $v div ${w}L " +
      s"ELSE -((-($v) + ${w - 1}L) div ${w}L) END"

  private def rows(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   partCol: String, width: Long): DataFrame =
    df.select((col(partCol).cast("string").as("part") +:
        groupCols.map(col)) :+
        col(valueCol).cast("long").as("__qv"): _*)
      .withColumn("bucket", expr(floorDivSql("__qv", width)))
      .groupBy((col("part") +: groupCols.map(col)) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Seed the store (replaces any existing one): one aggregate pass,
    * counts land under `run=__base__/part=<p>/`. */
  def write(df: DataFrame, groupCols: Seq[String], valueCol: String,
            partCol: String, path: String, width: Long): Unit = {
    require(width > 0, "QuantileStore.write: width must be positive")
    require(groupCols.nonEmpty, "QuantileStore.write: need group columns")
    val spark = df.sparkSession
    RunSlots.reset(spark, s"$path/quant")
    RunSlots.write(
      rows(df, groupCols, valueCol, partCol, width)
        .repartition(col("part")),
      s"$path/quant", "part", Some(RunSlots.Base))
    writeMetaInto(spark, s"$path/quant", width)
  }

  /** Append an ad-hoc/backfill batch's bucket counts in its own run
    * slot (None = plain accumulate under `__adhoc__`). Width comes from
    * the store's meta sidecar — appends can never drift buckets. The
    * `b<digits>` namespace is REJECTED — it belongs to the checkpointed
    * stream ([[appendBatch]]). */
  def append(df: DataFrame, groupCols: Seq[String], valueCol: String,
             partCol: String, path: String,
             runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "QuantileStore.append")
    appendSlot(df, groupCols, valueCol, partCol, path, runId)
  }

  /** [[append]] for the store's single checkpointed stream: mints the
    * reserved `b<batchId>` run id from the foreachBatch micro-batch
    * id (exactly-once under replay via the fold manifest). */
  def appendBatch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  partCol: String, path: String, batchId: Long): Unit =
    appendSlot(df, groupCols, valueCol, partCol, path, Some(s"b$batchId"))

  private def appendSlot(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, partCol: String, path: String,
                         runId: Option[String]): Unit = {
    require(!readLog2(df.sparkSession, path) ||
        valueCol == "__log2b", // the appendLog2 delegation path
      s"QuantileStore.append: store at $path is a LOG2 store — raw " +
        "values appended as bucket indexes would corrupt every " +
        "quantile; append with appendLog2")
    val width = readWidth(df.sparkSession, path)
    RunSlots.write(
      rows(df, groupCols, valueCol, partCol, width)
        .repartition(col("part")),
      s"$path/quant", "part", runId)
  }

  /** Merged (groupCols..., bucket, cnt) over a partition window (None =
    * all): counts summed across slots and parts under a planning-time
    * `part` PartitionFilter. */
  def counts(spark: SparkSession, path: String, groupCols: Seq[String],
             parts: Option[Seq[String]] = None): DataFrame = {
    readWidth(spark, path) // fail loudly on a non-store path
    require(RunSlots.hasParts(spark, s"$path/quant", "part"),
      s"QuantileStore: store at $path holds no data yet — nothing to serve")
    val base = spark.read.parquet(s"$path/quant")
    val pruned = parts.map(p => base.filter(col("part").isin(p: _*)))
      .getOrElse(base)
    pruned.groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per group, the bucket holding the q = qNum/qDen quantile of the
    * merged window, with its ALWAYS-FINITE value bounds: rank = max(1,
    * (total*qNum) div qDen), quantile bucket = first bucket (ascending,
    * negatives first) whose cumulative count reaches rank. Returns
    * (groupCols..., q_bucket, q_lo, q_hi, n_total) with
    * q_lo = bucket*width, q_hi = (bucket+1)*width — the HistStore rank
    * rule minus the NULL-bounded saturation bins. */
  def quantile(spark: SparkSession, path: String, groupCols: Seq[String],
               qNum: Long, qDen: Long,
               parts: Option[Seq[String]] = None): DataFrame = {
    require(!readLog2(spark, path),
      s"QuantileStore.quantile: store at $path is a LOG2 store — its " +
        "buckets are log2 indexes, not value multiples; serve with " +
        "quantileLog2")
    quantileCore(spark, path, groupCols, qNum, qDen, parts)
  }

  private def quantileCore(spark: SparkSession, path: String,
                           groupCols: Seq[String], qNum: Long, qDen: Long,
                           parts: Option[Seq[String]]): DataFrame = {
    require(qNum >= 0 && qDen > 0 && qNum <= qDen,
      "QuantileStore.quantile: need 0 <= qNum/qDen <= 1")
    val width = readWidth(spark, path)
    val c = counts(spark, path, groupCols, parts)
    // per group: |occupied buckets| rows — summary-scale, never raw-row
    // scale; the window sort runs over the merged summary only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    c.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n_total", sum(col("cnt")).over(wAll))
      .withColumn("rank",
        greatest(lit(1L), expr(s"(n_total * ${qNum}L) div ${qDen}L")))
      .filter(col("cum") >= col("rank") &&
        col("cum") - col("cnt") < col("rank"))
      .select(groupCols.map(col) :+
        col("bucket").as("q_bucket") :+
        (col("bucket") * lit(width)).as("q_lo") :+
        ((col("bucket") + 1) * lit(width)).as("q_hi") :+
        col("n_total"): _*)
  }

  /** Seed a RELATIVE-error store: buckets are [[log2Bucket]] values
    * (width 1 over bucket indexes), so the summary is ≤ 65 rows per
    * part-group NO MATTER the value domain — the mode for
    * near-continuous or unknown-range positive values where a linear
    * width either explodes the summary or loses the head. A quantile
    * resolves to [2^(b−1), 2^b): value known within 2×, the classic
    * log-histogram trade. Serve with [[quantileLog2]]; everything else
    * (counts, countBelow over bucket indexes, compact, slots,
    * streaming via a `prepare` that maps the value column through
    * [[log2Bucket]]) is the linear store unchanged. */
  def writeLog2(df: DataFrame, groupCols: Seq[String], valueCol: String,
                partCol: String, path: String): Unit = {
    write(df.withColumn("__log2b",
        log2Bucket(col(valueCol).cast("long"))),
      groupCols, "__log2b", partCol, path, width = 1L)
    writeMetaLog2Into(df.sparkSession, s"$path/quant")
  }

  /** [[append]] for a [[writeLog2]] store — refuses a linear store (the
    * bucket spaces are incompatible; appending raw values as indexes
    * would silently corrupt every quantile). Same `b<digits>`
    * rejection as [[append]] — streams use [[appendBatchLog2]]. */
  def appendLog2(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 partCol: String, path: String,
                 runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "QuantileStore.appendLog2")
    appendLog2Slot(df, groupCols, valueCol, partCol, path, runId)
  }

  /** [[appendLog2]] for the store's single checkpointed stream. */
  def appendBatchLog2(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, partCol: String, path: String,
                      batchId: Long): Unit =
    appendLog2Slot(df, groupCols, valueCol, partCol, path,
      Some(s"b$batchId"))

  private def appendLog2Slot(df: DataFrame, groupCols: Seq[String],
                             valueCol: String, partCol: String,
                             path: String,
                             runId: Option[String]): Unit = {
    require(readLog2(df.sparkSession, path),
      s"QuantileStore.appendLog2: store at $path is a LINEAR store — " +
        "append with append(), or rebuild with writeLog2")
    appendSlot(df.withColumn("__log2b",
        log2Bucket(col(valueCol).cast("long"))),
      groupCols, "__log2b", partCol, path, runId)
  }

  /** [[quantile]] for a [[writeLog2]] store, with bounds mapped back to
    * VALUE space: bucket 0 → [0, 1), bucket b in [1, 62] →
    * [2^(b−1), 2^b), bucket 63 → [2^62, NULL) (2^63 is not a Long),
    * bucket −1 (negatives) → (NULL, 0). Refuses a linear store. */
  def quantileLog2(spark: SparkSession, path: String,
                   groupCols: Seq[String], qNum: Long, qDen: Long,
                   parts: Option[Seq[String]] = None): DataFrame = {
    require(readLog2(spark, path),
      s"QuantileStore.quantileLog2: store at $path is a LINEAR store — " +
        "serve with quantile()")
    quantileCore(spark, path, groupCols, qNum, qDen, parts)
      .withColumn("q_lo",
        when(col("q_bucket") === 0L, lit(0L))
          .when(col("q_bucket") >= 1L && col("q_bucket") <= 63L,
            expr("shiftleft(1L, CAST(q_bucket - 1 AS INT))")))
      .withColumn("q_hi",
        when(col("q_bucket") === 0L, lit(1L))
          .when(col("q_bucket") === -1L, lit(0L))
          .when(col("q_bucket") >= 1L && col("q_bucket") <= 62L,
            expr("shiftleft(1L, CAST(q_bucket AS INT))")))
  }

  /** Exact count of values `< threshold` per group over the window —
    * exact because `threshold` must sit on a bucket boundary (a
    * multiple of width), so no bucket straddles it. Groups whose every
    * value is ≥ threshold report 0 (left-anchored on the group list
    * from the summary itself). */
  def countBelow(spark: SparkSession, path: String, groupCols: Seq[String],
                 threshold: Long,
                 parts: Option[Seq[String]] = None): DataFrame = {
    require(!readLog2(spark, path),
      s"QuantileStore.countBelow: store at $path is a LOG2 store — " +
        "thresholds are value-space here but its buckets are log2 " +
        "indexes; derive boundary counts from counts() at a power of " +
        "two if needed")
    val width = readWidth(spark, path)
    require(threshold % width == 0,
      s"QuantileStore.countBelow: threshold ($threshold) must be a " +
        s"multiple of the store width ($width) — counts below an " +
        "interior point cannot be exact; coarsen your threshold or " +
        "rebuild at a finer width")
    val b = threshold / width // exact: threshold is a multiple
    counts(spark, path, groupCols, parts)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(col("bucket") < lit(b), col("cnt"))
        .otherwise(lit(0L))).as("n_below"))
  }

  /** Distribution drift between two partition windows served FROM the
    * summaries — [[DataQuality.driftFromSummaries]] over this store's
    * buckets, which align across windows by construction (one width —
    * or one log2 space — per store). Returns (groupCols..., drift_pm,
    * n_ref, n_cur) for groups present in both windows. Works in either
    * mode: buckets are compared as opaque aligned categories. */
  def drift(spark: SparkSession, path: String, groupCols: Seq[String],
            refParts: Seq[String], curParts: Seq[String]): DataFrame =
    DataQuality.driftFromSummaries(
      counts(spark, path, groupCols, Some(refParts)),
      counts(spark, path, groupCols, Some(curParts)),
      groupCols, "bucket")

  /** Fold every slot back into one pre-summed `run=__base__` generation;
    * folded batch ids land in the fold manifest so replays stay no-ops
    * ([[graft.llm.RunSlots]]). */
  def compact(spark: SparkSession, path: String): Unit =
    graft.llm.IvfLayout.compact(spark, s"$path/quant", "part",
      transform = df => df.groupBy(
          df.columns.filterNot(Set("cnt", "run")).map(col): _*)
        .agg(sum(col("cnt")).as("cnt")))

  /** WIDEN the store to `newWidth` — the exact migration path when a
    * width picked at seed time turns out too fine (summary rows too
    * many). Exactness: when `newWidth` is a multiple of `width`, every
    * old bucket `[b*w, (b+1)*w)` lies WHOLLY inside one new bucket
    * `floor(b/factor)` (floor division again — negative buckets), so
    * the coarse counts equal a from-scratch build at `newWidth`
    * bit-for-bit (gate `quantile_coarsen`). Narrowing cannot be derived
    * from bucket counts and is refused with the real remedy.
    *
    * Counts and the width sidecar install in ONE compact-swap
    * ([[graft.llm.IvfLayout.compact]] `stageFinalize`): no crash window
    * where rewritten buckets are read under the old width. Folds slots
    * like [[compact]] (manifest recorded). */
  def coarsen(spark: SparkSession, path: String, newWidth: Long): Unit = {
    require(!readLog2(spark, path),
      s"QuantileStore.coarsen: store at $path is a log2 store — its " +
        "bucket space is already ≤ 65 rows per group and widening it " +
        "has no meaning; rebuild with writeLog2 if the domain changed")
    val width = readWidth(spark, path)
    require(newWidth > width && newWidth % width == 0,
      s"QuantileStore.coarsen: can only WIDEN exactly — newWidth " +
        s"($newWidth) must be a multiple of the current width ($width) " +
        "strictly above it. A finer width cannot be derived from bucket " +
        "counts: rebuild the store from raw rows instead")
    val factor = newWidth / width
    graft.llm.IvfLayout.compact(spark, s"$path/quant", "part",
      transform = df0 => {
        val df = df0.withColumn("bucket",
          expr(floorDivSql("bucket", factor)))
        df.groupBy(df.columns.filterNot(Set("cnt", "run")).map(col): _*)
          .agg(sum(col("cnt")).as("cnt"))
      },
      stageFinalize = tmp => writeMetaInto(spark, tmp.toString, newWidth))
  }

  /** Slot count of the summary table — the streaming loop's compaction
    * trigger. */
  def slotCount(spark: SparkSession, path: String): Int =
    RunSlots.slotCount(spark, s"$path/quant")

  /** Store integrity audit over the bucket-count rows:
    *  - `negative_count` (CORRUPTION): counts are row tallies;
    *  - `bucket_out_of_mode` (CORRUPTION, log2 stores only): a bucket
    *    outside [-1, 64] — log2Bucket can never mint one, so its
    *    presence means raw VALUES were appended as indexes (the
    *    mode-mixing failure the meta guards exist to prevent). Linear
    *    stores accept any bucket; the check reports 0 there. */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    readWidth(spark, path) // fail loudly on a non-store path
    val rows = spark.read.parquet(s"$path/quant")
      .select(col("bucket"), col("cnt")).persist()
    val neg = rows.filter(col("cnt") < 0L).count()
    val outOfMode =
      if (readLog2(spark, path))
        rows.filter(col("bucket") < -1L || col("bucket") > 64L).count()
      else 0L
    rows.unpersist()
    import spark.implicits._
    Seq(("bucket_out_of_mode", outOfMode), ("negative_count", neg))
      .toDF("check", "violations")
  }

}
