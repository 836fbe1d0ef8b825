package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.RunSlots

/** Count-min sketch store — the POINT-FREQUENCY member of the
  * maintained-store family, complementing [[TopKStore]]: TopK keeps the
  * m heaviest values per partition and can answer nothing about the
  * tail; a count-min sketch answers "how often did THIS key appear over
  * the window" for ANY key — including keys never seen, which report an
  * honest small overestimate — in `d × w` integer cells per partition,
  * independent of key cardinality (Cormode & Muthukrishnan, J.Alg 2005).
  * The 100 TB question it answers: "frequency of this URL / n-gram /
  * user-agent over the last N days" when the key universe is far too
  * large to store, as a |parts × d × w| cell scan under a planning-time
  * `part` PartitionFilter.
  *
  * Guarantees (classic CMS, one-sided): estimate ≥ true count always;
  * estimate ≤ true count + ε·N with probability 1−δ over hash choice,
  * ε = e/w, δ = e^−d, N = window row count. The hash rows here are
  * FIXED (md5 of `i:key`, 60 low bits mod w) rather than drawn per
  * store: estimates are deterministic and replayable — the DuckDB
  * oracle rebuilds the ENTIRE sketch and the served estimates
  * bit-for-bit (gates `cms_store`, `stream_cms`), trading the
  * per-instance δ re-draw for cross-engine exactness (same trade as
  * [[SampleStore]]'s fixed md5 order).
  *
  * Cells are ADDITIVE (merge = element-wise sum) ⇒ replayed batches
  * would double-count — appends are run-slot scoped
  * ([[graft.llm.RunSlots]]): a replay overwrites its own `run=<id>`
  * slot, and after [[compact]] folds slots the fold manifest turns the
  * replay into a write-level no-op. Unlike every other store in the
  * family, the merged summary size is a CONSTANT `d·w` per partition —
  * compaction exists purely for file-count hygiene. */
object CmsStore {

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def metaPath(tree: String) =
    new org.apache.hadoop.fs.Path(s"$tree/_cms_meta.json")

  private def writeMetaInto(spark: SparkSession, tree: String,
                            depth: Int, width: Int): Unit = {
    val (fs, _) = fsOf(spark, tree)
    val live = metaPath(tree)
    val tmp = new org.apache.hadoop.fs.Path(s"$tree/_cms_meta.json__tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"depth":$depth,"width":$width}""".getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(live.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, live, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[graft] def readMeta(spark: SparkSession,
                              path: String): (Int, Int) = {
    val (fs, _) = fsOf(spark, s"$path/cms")
    val p = metaPath(s"$path/cms")
    require(fs.exists(p),
      s"CmsStore: no _cms_meta.json at $path — not a count-min store")
    val in = fs.open(p)
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    def f(k: String) = (s""""$k"\\s*:\\s*(\\d+)""").r.unanchored
      .findFirstMatchIn(txt).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"CmsStore: unparseable _cms_meta.json at $path: $txt"))
    (f("depth"), f("width"))
  }

  /** Hash row i of `key`: md5("i:key") low 60 bits (15 hex chars —
    * always positive, so `%` agrees across engines) mod width. The
    * exact same expression is written in the DuckDB oracle as
    * `CAST('0x' || substr(md5(i || ':' || key), 1, 15) AS BIGINT) % w`. */
  private def hashCell(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(i.toString), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(width.toLong))

  /** One (part, r, j, cnt) relation from raw rows: each key lands in
    * one cell per hash row. The d-way expansion is a compile-time
    * array literal (d is small and fixed), so the plan stays
    * codegen-friendly — no UDF, no explode over data-driven arrays. */
  private def cells(df: DataFrame, keyCol: String, partCol: String,
                    depth: Int, width: Int): DataFrame =
    df.select(col(partCol).cast("string").as("part"),
        col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("part"), explode(array(
        (0 until depth).map(i => struct(lit(i).as("r"),
          hashCell(i, col("__k"), width).as("j"))): _*)).as("c"))
      .select(col("part"), col("c.r").as("r"), col("c.j").as("j"))
      .groupBy("part", "r", "j")
      .agg(count(lit(1)).as("cnt"))

  /** Seed the store (replaces any existing one). `depth` rows × `width`
    * cells; the layout is pinned in the meta sidecar — appends can
    * never hash into a different geometry. */
  def write(df: DataFrame, keyCol: String, partCol: String, path: String,
            depth: Int = 4, width: Int = 256): Unit = {
    require(depth > 0 && depth <= 16, "CmsStore.write: need 0 < depth <= 16")
    require(width > 0, "CmsStore.write: width must be positive")
    val spark = df.sparkSession
    RunSlots.reset(spark, s"$path/cms")
    RunSlots.write(
      cells(df, keyCol, partCol, depth, width).repartition(col("part")),
      s"$path/cms", "part", Some(RunSlots.Base))
    writeMetaInto(spark, s"$path/cms", depth, width)
  }

  /** Append an ad-hoc/backfill batch's cells in its own run slot (None
    * = plain accumulate under `__adhoc__`; cells are additive). The
    * `b<digits>` namespace is REJECTED — it belongs to the checkpointed
    * stream ([[appendBatch]]). */
  def append(df: DataFrame, keyCol: String, partCol: String, path: String,
             runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "CmsStore.append")
    appendSlot(df, keyCol, partCol, path, runId)
  }

  /** [[append]] for the store's single checkpointed stream: mints the
    * reserved `b<batchId>` run id from the foreachBatch micro-batch
    * id (exactly-once under replay via the fold manifest). */
  def appendBatch(df: DataFrame, keyCol: String, partCol: String,
                  path: String, batchId: Long): Unit =
    appendSlot(df, keyCol, partCol, path, Some(s"b$batchId"))

  private def appendSlot(df: DataFrame, keyCol: String, partCol: String,
                         path: String, runId: Option[String]): Unit = {
    val (depth, width) = readMeta(df.sparkSession, path)
    RunSlots.write(
      cells(df, keyCol, partCol, depth, width).repartition(col("part")),
      s"$path/cms", "part", runId)
  }

  /** Merged (r, j, cnt) cells over a partition window (None = all) —
    * ≤ d·w rows regardless of corpus size or key cardinality. */
  def mergedCells(spark: SparkSession, path: String,
                  parts: Option[Seq[String]] = None): DataFrame = {
    readMeta(spark, path) // fail loudly on a non-store path
    require(RunSlots.hasParts(spark, s"$path/cms", "part"),
      s"CmsStore: store at $path holds no data yet — nothing to serve")
    val base = spark.read.parquet(s"$path/cms")
    val pruned = parts.map(p => base.filter(col("part").isin(p: _*)))
      .getOrElse(base)
    pruned.groupBy("r", "j").agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-frequency estimates for the keys in `keys(keyCol)` over the
    * window: est(key) = min over hash rows of its cell count (0 when a
    * cell is empty). Returns (key, est) with est ≥ the true window
    * count always, ≤ true + e/width · N w.h.p. The join is
    * |keys × d| rows against ≤ d·w merged cells — broadcast-sized on
    * both sides whenever the key list is a lookup (its intended use;
    * for corpus-scale key lists use [[TopKStore]] instead). */
  def estimate(spark: SparkSession, path: String, keys: DataFrame,
               keyCol: String,
               parts: Option[Seq[String]] = None): DataFrame = {
    val (depth, width) = readMeta(spark, path)
    val merged = mergedCells(spark, path, parts)
    val probes = keys.select(col(keyCol).cast("string").as("key"))
      .distinct()
      .select(col("key"), explode(array(
        (0 until depth).map(i => struct(lit(i).as("r"),
          hashCell(i, col("key"), width).as("j"))): _*)).as("c"))
      .select(col("key"), col("c.r").as("r"), col("c.j").as("j"))
    probes.join(broadcast(merged), Seq("r", "j"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Inserted mass of a window — the N in the sketch's e·N/w error
    * bound, served from the cells themselves: every insert adds 1 to
    * every hash row, so each row's cell sum equals the window's total
    * insert count exactly. Returns one row (n_total); asserts the d
    * row sums agree (a mismatch means cell corruption — fail loudly,
    * don't average). Use it to size error budgets and decide when a
    * window needs a wider rebuild. */
  def mass(spark: SparkSession, path: String,
           parts: Option[Seq[String]] = None): DataFrame = {
    val (depth, _) = readMeta(spark, path)
    val sums = mergedCells(spark, path, parts)
      .groupBy("r").agg(sum(col("cnt")).as("n"))
    sums.agg(min(col("n")).as("lo"), max(col("n")).as("hi"),
        count(lit(1)).as("rows"))
      .select(
        when(col("rows") === 0L, lit(0L)) // empty window: zero mass
          .when(col("rows") === depth.toLong && col("lo") === col("hi"),
            col("lo"))
          .otherwise(raise_error(concat(
            lit("CmsStore.mass: hash-row sums disagree (corrupt cells?) "),
            col("lo"), lit(" vs "), col("hi"))).cast("long"))
          .as("n_total"))
  }

  /** Inner-product estimate between two windows' key-frequency vectors
    * — the second classic count-min query (Cormode & Muthukrishnan
    * 2005 §4.2): est = min over hash rows r of Σ_j cellsA[r][j] ·
    * cellsB[r][j]. Always ≥ the true Σ_key fA(key)·fB(key); ≤ true +
    * (e/w)·‖fA‖₁·‖fB‖₁ w.h.p. over the hash idiom. The 100 TB shape:
    * "how similar is today's n-gram/URL traffic to yesterday's" as a
    * join of two ≤ d·w-cell relations — corpus never rescanned, key
    * space never materialized. Deterministic (fixed hashes), so the
    * DuckDB oracle replays the estimate bit-for-bit (gate
    * `cms_inner`). Returns one row (inner_product). */
  def innerProduct(spark: SparkSession, path: String,
                   partsA: Seq[String], partsB: Seq[String]): DataFrame = {
    val (depth, _) = readMeta(spark, path)
    val a = mergedCells(spark, path, Some(partsA))
      .withColumnRenamed("cnt", "ca")
    val b = mergedCells(spark, path, Some(partsB))
      .withColumnRenamed("cnt", "cb")
    // inner join: a cell missing on either side contributes 0 to that
    // row's sum — and a hash row with NO overlapping cells has sum 0,
    // which must stay a min candidate (it proves the true inner
    // product is 0), so anchor on all `depth` rows before the min
    val sums = a.join(b, Seq("r", "j"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("ip"))
    spark.range(depth).select(col("id").cast("int").as("r"))
      .join(sums, Seq("r"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("inner_product"))
  }

  /** Rebuild the store FROM THE RAW CORPUS at a new geometry — the
    * remedy when [[mass]] says the e·N/w error band outgrew the width
    * (r13 verdict "What's missing #3"): cells cannot re-hash (the
    * sketch keeps no key material), so geometry migration re-seeds
    * from source while the OLD store keeps serving until the atomic
    * swap. One corpus pass, same cost as the original [[write]].
    *
    * Exactly-once across the swap: this is an OFFLINE op like the
    * index retrains — it refuses while a PARTIAL batch slot exists
    * (the replay must rewrite that slot first), and it records every
    * COMMITTED slot id in the fold manifest CARRIED into the new tree,
    * so a post-rebuild replay of a pre-rebuild batch (whose rows `df`
    * already represents) is a write-level no-op instead of a double
    * count.
    *
    * Crash contract: staged fully beside (`cms__rebuild_tmp`: cells,
    * meta, manifest — one rename installs all three), backup-rename
    * install, loud refusal on leftovers. */
  def rebuild(df: DataFrame, keyCol: String, partCol: String, path: String,
              depth: Int = 4, width: Int = 256): Unit =
    // single-writer ENFORCED at the store root (r14 verdict): two
    // rebuilds would race the same __rebuild_tmp/__rebuild_old renames
    graft.warehouse.Warehouse.withPathLease(df.sparkSession, path,
      what = s"cms store $path")(
      rebuildLocked(df, keyCol, partCol, path, depth, width))

  private def rebuildLocked(df: DataFrame, keyCol: String, partCol: String,
                            path: String, depth: Int, width: Int): Unit = {
    import org.apache.hadoop.fs.Path
    require(depth > 0 && depth <= 16, "CmsStore.rebuild: need 0 < depth <= 16")
    require(width > 0, "CmsStore.rebuild: width must be positive")
    val spark = df.sparkSession
    val tree = s"$path/cms"
    val (fs, root) = fsOf(spark, tree)
    graft.warehouse.Warehouse.requireAtomicRename(
      Option(fs.getScheme).getOrElse(""),
      spark.conf.getOption("spark.graft.warehouse.allowNonAtomicRename")
        .exists(_.equalsIgnoreCase("true")))
    val tmp = new Path(tree + "__rebuild_tmp")
    val old = new Path(tree + "__rebuild_old")
    // leftover check FIRST: after a crash between the install renames
    // the tree is gone and readMeta/requireNoPartialSlots would throw
    // misleading errors instead of naming the restore remedy
    require(!fs.exists(old),
      s"CmsStore.rebuild: leftover $old from an interrupted rebuild — " +
        "restore it over the store path (or remove it) before re-running")
    readMeta(spark, path) // must already BE a cms store (else: write)
    graft.llm.IvfLayout.requireNoPartialSlots(fs, root, "CmsStore.rebuild")
    val (committed, _) = graft.llm.IvfLayout.replayableSlots(fs, root)
    fs.delete(tmp, true)
    cells(df, keyCol, partCol, depth, width)
      .repartition(col("part"))
      .write.partitionBy("part")
      .parquet(new Path(tmp, s"run=${RunSlots.Base}").toString)
    writeMetaInto(spark, tmp.toString, depth, width)
    val folded = RunSlots.foldedRuns(spark, tree)
      .fold(committed.map(graft.llm.IvfLayout.slotId).toSet)
    if (!folded.isEmpty)
      RunSlots.writeFoldedManifest(spark, tmp.toString, folded)
    require(fs.rename(root, old),
      s"CmsStore.rebuild: backup rename of $tree failed")
    require(fs.rename(tmp, root),
      s"CmsStore.rebuild: install rename to $tree failed")
    fs.delete(old, true)
  }

  /** Fold every slot back into one pre-summed `run=__base__` generation
    * (≤ d·w rows per part — the constant-size fold); folded batch ids
    * land in the fold manifest so replays stay no-ops. */
  def compact(spark: SparkSession, path: String): Unit =
    graft.llm.IvfLayout.compact(spark, s"$path/cms", "part",
      transform = df => df.groupBy(
          df.columns.filterNot(Set("cnt", "run")).map(col): _*)
        .agg(sum(col("cnt")).as("cnt")))

  /** Slot count — the streaming loop's compaction trigger. */
  def slotCount(spark: SparkSession, path: String): Int =
    RunSlots.slotCount(spark, s"$path/cms")

  /** Store integrity audit over the ≤ d·w-per-part cell rows:
    *  - `cell_out_of_range` (CORRUPTION): an (r, j) outside the pinned
    *    geometry — probes can never hit it, so its mass is silently
    *    missing from estimates;
    *  - `negative_cell` (CORRUPTION): counts are insert tallies,
    *    never negative;
    *  - `mass_disagreement` (CORRUPTION): every insert adds exactly 1
    *    to every hash row, so all `depth` rows of a part must sum to
    *    the same total (the [[mass]] invariant); a part whose rows
    *    disagree — or that is missing a row some insert should have
    *    populated — has lost or duplicated cells. */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    val (depth, width) = readMeta(spark, path)
    val cells = spark.read.parquet(s"$path/cms")
      .select(col("part"), col("r"), col("j"), col("cnt")).persist()
    val outOfRange = cells.filter(col("r") < 0 || col("r") >= depth ||
      col("j") < 0 || col("j") >= width).count()
    val negative = cells.filter(col("cnt") < 0).count()
    val disagree = cells.groupBy("part", "r")
      .agg(sum(col("cnt")).as("rowMass"))
      .groupBy("part")
      .agg(countDistinct(col("rowMass")).as("masses"),
        count(lit(1)).as("rowsPresent"))
      .filter(col("masses") > 1 || col("rowsPresent") =!= depth)
      .count()
    cells.unpersist()
    import spark.implicits._
    Seq(("cell_out_of_range", outOfRange),
      ("mass_disagreement", disagree), ("negative_cell", negative))
      .toDF("check", "violations")
  }
}
