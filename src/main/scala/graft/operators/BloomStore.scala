package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter membership store — the MEMBERSHIP member of the
  * maintained-store family: per-partition (per-day/per-source) sets of
  * occupied filter positions persisted once, then any partition window
  * answers "was this key seen" with NO false negatives and a bounded
  * false-positive rate, without touching raw keys again. The 100 TB
  * question it answers: "did we already crawl this URL in the last N
  * days" over key sets far too large to materialize, as a
  * |window-distinct positions|-row semi-join under a planning-time
  * `part` PartitionFilter.
  *
  * Representation: SPARSE occupied positions — one (part, r, j) row per
  * distinct (hash row, cell) pair, ≤ min(d·keys, d·w) rows per
  * partition. Sparse rows cost more per bit than a packed bitmap but
  * make the store a plain parquet relation: window union is `DISTINCT`,
  * pruning is a PartitionFilter, and the DuckDB oracle replays every
  * verdict — including the false positives — bit-for-bit (gates
  * `bloom_store`, `stream_bloom`). Hash rows are the repo's fixed
  * cross-engine idiom, md5("i:key") low 60 bits mod w (same as
  * [[CmsStore]]).
  *
  * Guarantees (classic Bloom, Bloom CACM 1970): a key that was added is
  * ALWAYS reported maybe-present (set union never loses a position); a
  * key never added is reported present with probability
  * ≈ (1 − e^(−d·n/w))^d over the hash idiom.
  *
  * Delivery: position-set union is IDEMPOTENT — a replayed batch
  * re-lands rows that cannot change any verdict — so like
  * [[SketchStore]] (and unlike the additive stores) appends need no
  * run slots and no fold manifest; [[compact]] is file-count hygiene
  * (DISTINCT fold, staged beside + backup-rename install). */
object BloomStore {

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  private def metaPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_bloom_meta.json")

  private def writeMeta(spark: SparkSession, path: String,
                        depth: Int, width: Int): Unit = {
    val fs = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_bloom_meta.json__tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"depth":$depth,"width":$width}""".getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(metaPath(path).toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, metaPath(path),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[graft] def readMeta(spark: SparkSession,
                              path: String): (Int, Int) = {
    val fs = fsOf(spark, path)
    require(fs.exists(metaPath(path)),
      s"BloomStore: no _bloom_meta.json at $path — not a bloom store")
    val in = fs.open(metaPath(path))
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    def f(k: String) = (s""""$k"\\s*:\\s*(\\d+)""").r.unanchored
      .findFirstMatchIn(txt).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"BloomStore: unparseable _bloom_meta.json at $path: $txt"))
    (f("depth"), f("width"))
  }

  /** Same fixed hash idiom as [[CmsStore]]: md5("i:key") low 60 bits
    * (15 hex chars, always positive) mod width — replayed verbatim in
    * DuckDB as `CAST('0x' || substr(md5(i || ':' || key), 1, 15) AS
    * BIGINT) % w`. */
  private def hashCell(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(i.toString), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(width.toLong))

  private def positions(df: DataFrame, keyCol: String, partCol: String,
                        depth: Int, width: Int): DataFrame =
    df.select(col(partCol).cast("string").as("part"),
        col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("part"), explode(array(
        (0 until depth).map(i => struct(lit(i).as("r"),
          hashCell(i, col("__k"), width).as("j"))): _*)).as("c"))
      .select(col("part"), col("c.r").as("r"), col("c.j").as("j"))
      .distinct()

  /** Seed the store (replaces any existing one). Geometry is pinned in
    * the meta sidecar — appends can never hash into a different one. */
  def write(df: DataFrame, keyCol: String, partCol: String, path: String,
            depth: Int = 4, width: Int = 1 << 20): Unit = {
    require(depth > 0 && depth <= 16, "BloomStore.write: need 0 < depth <= 16")
    require(width > 0, "BloomStore.write: width must be positive")
    val spark = df.sparkSession
    val fs = fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    positions(df, keyCol, partCol, depth, width)
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(path)
    writeMeta(spark, path, depth, width)
  }

  /** Append a batch's positions — set union is idempotent, so replays
    * are harmless duplicates (no run slots needed; the [[SketchStore]]
    * posture) and duplicates vanish at the next [[compact]]. */
  def append(df: DataFrame, keyCol: String, partCol: String,
             path: String): Unit = {
    val (depth, width) = readMeta(df.sparkSession, path)
    positions(df, keyCol, partCol, depth, width)
      .repartition(col("part"))
      .write.mode("append").partitionBy("part").parquet(path)
  }

  /** Membership verdicts for the keys in `keys(keyCol)` over a
    * partition window (None = all): a key is maybe-present iff ALL
    * `depth` of its positions are occupied somewhere in the window.
    * Returns (key, might_contain) — `false` is DEFINITE absence,
    * `true` is presence up to the false-positive rate. The probe side
    * is |keys × d| rows; the store side is a window-pruned distinct
    * semi-join (positions never leave their partitions un-pruned). */
  def mightContain(spark: SparkSession, path: String, keys: DataFrame,
                   keyCol: String,
                   parts: Option[Seq[String]] = None): DataFrame =
    mightContainImpl(spark, path, keys, keyCol, parts,
      broadcastProbes = true)

  /** [[mightContain]] for CORPUS-SCALE probe sets (every n-gram of a
    * batch, every URL of a crawl dump): same verdicts, but the probe
    * rows shuffle-join the window's positions instead of broadcasting —
    * use when |keys × d| no longer fits a broadcast. */
  def mightContainBulk(spark: SparkSession, path: String, keys: DataFrame,
                       keyCol: String,
                       parts: Option[Seq[String]] = None): DataFrame =
    mightContainImpl(spark, path, keys, keyCol, parts,
      broadcastProbes = false)

  private def mightContainImpl(spark: SparkSession, path: String,
                               keys: DataFrame, keyCol: String,
                               parts: Option[Seq[String]],
                               broadcastProbes: Boolean): DataFrame = {
    val (depth, width) = readMeta(spark, path)
    val base = spark.read.parquet(path)
    val pruned = parts.map(p => base.filter(col("part").isin(p: _*)))
      .getOrElse(base)
      .select("r", "j")
    val probeKeys = keys.select(col(keyCol).cast("string").as("key"))
      .distinct()
    val probes0 = probeKeys
      .select(col("key"), explode(array(
        (0 until depth).map(i => struct(lit(i).as("r"),
          hashCell(i, col("key"), width).as("j"))): _*)).as("c"))
      .select(col("key"), col("c.r").as("r"), col("c.j").as("j"))
    // lookup-sized probe sets broadcast (one position scan, no
    // shuffle); corpus-scale ones shuffle-join. Either way duplicate
    // positions from un-compacted appends can't inflate a verdict —
    // the probe has exactly one j per (key, r), so distinct hash ROWS
    // hit, not hit rows, are counted
    val probes = if (broadcastProbes) broadcast(probes0) else probes0
    val hits = pruned.join(probes, Seq("r", "j"))
      .groupBy("key")
      .agg(countDistinct(col("r")).as("__nhit"))
    probeKeys.join(hits, Seq("key"), "left")
      .select(col("key"),
        (coalesce(col("__nhit"), lit(0L)) === lit(depth.toLong))
          .as("might_contain"))
  }

  /** Crawl-frontier filter: the rows of `batch` whose key is
    * DEFINITELY absent from the window — `might_contain` is one-sided,
    * so nothing already present ever passes, and the price of the
    * bounded state is that a false-positive key is WRONGLY HELD BACK
    * (rate ≈ (1−e^(−d·n/w))^d; size w for the recall you need, or use
    * the exact stateful/incremental dedup operators when every key
    * must survive). Append the batch AFTER filtering. Delivery note:
    * the returned delta is at-least-once under micro-batch replay —
    * pair the downstream sink with [[graft.llm.RunSlots]] (the
    * EdgeStore posture) if it needs exactly-once; the STORE side needs
    * nothing (idempotent union). */
  def filterNew(spark: SparkSession, path: String, batch: DataFrame,
                keyCol: String,
                parts: Option[Seq[String]] = None): DataFrame = {
    // null keys are trivially new: inserts drop them (positions filters
    // isNotNull), so the store can never contain one — but the equality
    // semi-join below never matches NULL, which used to silently drop
    // null-key rows from the delta (ADVICE r13). Route them around the
    // probe and union them back.
    val nonNull = batch.filter(col(keyCol).isNotNull)
    val verdicts = mightContain(spark, path,
      nonNull.select(col(keyCol)), keyCol, parts)
      .filter(!col("might_contain")).select(col("key"))
    nonNull.join(verdicts,
      nonNull(keyCol).cast("string") === verdicts("key"), "left_semi")
      .unionByName(batch.filter(col(keyCol).isNull))
  }

  /** Fill-level report per hash row over a window — the operability
    * serve the no-migration geometry contract requires: occupied cells
    * per row, width, and the exact integer fill per-mille
    * (occupied·1000 div w). The false-positive rate of a window is
    * ≈ Π_r (occupied_r / w); when fill_pm crosses your budget the
    * remedy is a rebuild at larger w (positions cannot re-hash — the
    * store keeps no key material). |d| output rows. */
  def fill(spark: SparkSession, path: String,
           parts: Option[Seq[String]] = None): DataFrame = {
    val (depth, width) = readMeta(spark, path)
    val base = spark.read.parquet(path)
    val pruned = parts.map(p => base.filter(col("part").isin(p: _*)))
      .getOrElse(base)
    spark.range(depth).select(col("id").cast("int").as("r"))
      .join(pruned.select("r", "j").distinct()
          .groupBy("r").agg(count(lit(1)).as("occupied")),
        Seq("r"), "left")
      .select(col("r"),
        coalesce(col("occupied"), lit(0L)).as("occupied"),
        lit(width.toLong).as("width"))
      .withColumn("fill_pm", expr(s"occupied * 1000L div ${width}L"))
  }

  /** Rebuild the store FROM THE RAW CORPUS at a new geometry — the
    * remedy when [[fill]] crosses the false-positive budget (r13
    * verdict "What's missing #3": positions cannot re-hash because the
    * store keeps NO key material, so geometry migration means
    * re-seeding from source; this was the family's last "none —
    * rebuild by hand" row in MIGRATION.md). `df` must be the key
    * corpus the store should represent — at 100 TB that is one pass
    * over the raw table, the same cost as the original seed, while
    * the OLD store keeps serving until the atomic swap.
    *
    * Contract: a key present in `df` verdicts TRUE before and after
    * (no false negatives at any geometry); false-positive verdicts
    * CHANGE with the geometry — that is the point of the rebuild.
    *
    * Crash contract ([[compact]]'s): the new tree is staged fully
    * beside the store (meta inside, so geometry installs atomically
    * with the positions), then installed by backup-rename. A crash
    * leaves either the old store live (before the swap) or a
    * `__rebuild_old` backup to restore; a re-run refuses loudly while
    * the leftover exists. */
  def rebuild(df: DataFrame, keyCol: String, partCol: String, path: String,
              depth: Int = 4, width: Int = 1 << 20): Unit =
    // single-writer ENFORCED at the store root (r14 verdict): two
    // rebuilds would race the same __rebuild_tmp/__rebuild_old renames
    graft.warehouse.Warehouse.withPathLease(df.sparkSession, path,
      what = s"bloom store $path")(
      rebuildLocked(df, keyCol, partCol, path, depth, width))

  private def rebuildLocked(df: DataFrame, keyCol: String, partCol: String,
                            path: String, depth: Int, width: Int): Unit = {
    import org.apache.hadoop.fs.Path
    require(depth > 0 && depth <= 16, "BloomStore.rebuild: need 0 < depth <= 16")
    require(width > 0, "BloomStore.rebuild: width must be positive")
    val spark = df.sparkSession
    val fs = fsOf(spark, path)
    graft.warehouse.Warehouse.requireAtomicRename(
      Option(fs.getScheme).getOrElse(""),
      spark.conf.getOption("spark.graft.warehouse.allowNonAtomicRename")
        .exists(_.equalsIgnoreCase("true")))
    val root = new Path(path)
    val tmp = new Path(path + "__rebuild_tmp")
    val old = new Path(path + "__rebuild_old")
    // leftover check FIRST: after a crash between the two install
    // renames the store path is GONE and only the backup exists —
    // readMeta would throw a misleading "not a bloom store" instead of
    // naming the restore remedy (round-14 review)
    require(!fs.exists(old),
      s"BloomStore.rebuild: leftover $old from an interrupted rebuild — " +
        "restore it over the store path (or remove it) before re-running")
    readMeta(spark, path) // must already BE a bloom store (else: write)
    fs.delete(tmp, true)
    positions(df, keyCol, partCol, depth, width)
      .repartition(col("part"))
      .write.partitionBy("part").parquet(tmp.toString)
    val metaTmp = new Path(tmp, "_bloom_meta.json")
    val out = fs.create(metaTmp, true)
    try out.write(s"""{"depth":$depth,"width":$width}""".getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(root, old),
      s"BloomStore.rebuild: backup rename of $path failed")
    require(fs.rename(tmp, root),
      s"BloomStore.rebuild: install rename to $path failed")
    fs.delete(old, true)
  }

  /** Store integrity audit: `position_out_of_range` (CORRUPTION) — a
    * stored (r, j) outside the pinned geometry. Probes hash into
    * [0, depth) × [0, width), so an out-of-range position can never
    * match one and acts as a SILENTLY LOST insert: the key that wrote
    * it may false-negative, breaking the filter's one guarantee. */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    val (depth, width) = readMeta(spark, path)
    val out = spark.read.parquet(path)
      .filter(col("r") < 0 || col("r") >= depth ||
        col("j") < 0 || col("j") >= width).count()
    import spark.implicits._
    Seq(("position_out_of_range", out)).toDF("check", "violations")
  }

  /** DISTINCT-fold the store back to one file per partition (staged
    * beside, backup-rename install — the [[SketchStore.compact]]
    * crash contract). Replay-idempotence means no fold manifest: a
    * replayed append after a compact re-lands rows that cannot change
    * any verdict. */
  def compact(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = fsOf(spark, path)
    graft.warehouse.Warehouse.requireAtomicRename(
      Option(fs.getScheme).getOrElse(""),
      spark.conf.getOption("spark.graft.warehouse.allowNonAtomicRename")
        .exists(_.equalsIgnoreCase("true")))
    require(fs.exists(root), s"BloomStore.compact: no store at $path")
    val (depth, width) = readMeta(spark, path)
    val tmp = new Path(path + "__compact_tmp")
    val old = new Path(path + "__compact_old")
    require(!fs.exists(old),
      s"BloomStore.compact: leftover $old from an interrupted compact — " +
        "restore it over the store path (or remove it) before re-running")
    fs.delete(tmp, true)
    spark.read.parquet(path).select("part", "r", "j").distinct()
      .repartition(col("part"))
      .write.partitionBy("part").parquet(tmp.toString)
    val metaTmp = new Path(tmp, "_bloom_meta.json")
    val out = fs.create(metaTmp, true)
    try out.write(s"""{"depth":$depth,"width":$width}""".getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(root, old),
      s"BloomStore.compact: backup rename of $path failed")
    require(fs.rename(tmp, root),
      s"BloomStore.compact: install rename to $path failed")
    fs.delete(old, true)
  }

  /** Data-file count — the streaming loop's compaction trigger (same
    * metadata-only check as [[SketchStore.dataFileCount]]). */
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
}
