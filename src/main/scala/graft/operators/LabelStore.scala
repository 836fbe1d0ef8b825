package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.RunSlots

/** Bucketed, delta-appended (node, label) cluster store — the
  * 100 TB-scale serving form of [[ConnectedComponents.incremental]]
  * (r10 verdict "What's missing #3": the in-memory incremental fold
  * scans the FULL label table per batch; at 1e9+ nodes the per-batch
  * cost must track touched buckets, not the corpus).
  *
  * Layout (two copies of the same rows, one per access path — the
  * MinHashIndex bands/sets discipline):
  *
  *  - `byn/run=<slot>/nb=<b>/…` — bucketed by `pmod(node, nBuckets)`:
  *    "what is this node's label" reads only the batch nodes' buckets;
  *  - `byc/run=<slot>/cb=<b>/…` — bucketed by `pmod(label, nBuckets)`:
  *    "who are this component's members" reads only the touched
  *    components' buckets.
  *
  * Batches append DELTA slots (only rows whose label changed), so the
  * per-batch write is O(touched), and [[RunSlots]] makes a replayed
  * batch overwrite its own slot (exactly-once under foreachBatch
  * at-least-once).
  *
  * Why pruned reads over a delta store are EXACT (no tombstones, no
  * seq column): min-label CC labels only ever DECREASE, and a merge
  * relabels every member of the absorbed component in the same batch.
  * Therefore (a) a node's CURRENT label is the MIN over its stored
  * rows — and all of a node's rows share its `nb` bucket, so pruned
  * min-per-node resolution is latest-wins; (b) if L is anyone's
  * current label, L's component never merged away, so EVERY stored
  * row with label L is current — the member lookup's semi-join on
  * current labels can never resurface a stale member. Stale rows
  * (superseded labels) are dead weight until [[compact]] folds all
  * slots back into `__base__`.
  *
  * Crash contract: a batch writes `byc` then `byn`; the two are not
  * atomic together, but a replayed batch rewrites both slots, and
  * foreachBatch replays a failed batch before admitting the next one
  * (checkpoint ordering) — single-writer, replay-before-next, like
  * every store here. */
object LabelStore {

  private def nbCol(node: Column, n: Int): Column = pmod(node, lit(n.toLong))

  // ---- meta sidecar (appends must agree on the bucket count) ----------

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeMeta(spark: SparkSession, path: String, nBuckets: Int): Unit = {
    val (fs, _) = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_label_meta.json__tmp")
    val live = new org.apache.hadoop.fs.Path(s"$path/_label_meta.json")
    val out = fs.create(tmp, true)
    try out.write(s"""{"nBuckets":$nBuckets}""".getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(live.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, live, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[graft] def readMeta(spark: SparkSession, path: String): Int = {
    val (fs, _) = fsOf(spark, path)
    val live = new org.apache.hadoop.fs.Path(s"$path/_label_meta.json")
    require(fs.exists(live), s"LabelStore: no store metadata at $path")
    val in = fs.open(live)
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    """"nBuckets"\s*:\s*(\d+)""".r.unanchored.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"LabelStore: unparseable _label_meta.json at $path: $txt"))
  }

  // ---- write paths ----------------------------------------------------

  private def writeCopies(rows: DataFrame, path: String, nBuckets: Int,
                          runId: Option[String]): Unit = {
    // byc first, byn second: the full-table read resolves from byn, so
    // the visible table flips only once both copies hold the delta
    RunSlots.write(
      rows.withColumn("cb", nbCol(col("label"), nBuckets))
        .repartition(col("cb")),
      s"$path/byc", "cb", runId)
    RunSlots.write(
      rows.withColumn("nb", nbCol(col("node"), nBuckets))
        .repartition(col("nb")),
      s"$path/byn", "nb", runId)
  }

  /** Seed the store from a [[ConnectedComponents.run]]-style min-id
    * labeling (columns `node`, `label`). Replaces any existing store. */
  def write(labels: DataFrame, path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "LabelStore.write: nBuckets must be positive")
    val spark = labels.sparkSession
    RunSlots.reset(spark, s"$path/byn")
    RunSlots.reset(spark, s"$path/byc")
    writeCopies(labels.select("node", "label"), path, nBuckets,
      Some(RunSlots.Base))
    writeMeta(spark, path, nBuckets)
  }

  /** The full resolved (node, label) table: every slot of the by-node
    * copy, min label per node (labels only decrease — min IS latest). */
  def read(spark: SparkSession, path: String): DataFrame = {
    readMeta(spark, path) // fail loudly on a non-store path
    if (!RunSlots.hasParts(spark, s"$path/byn", "nb"))
      emptyLabels(spark)
    else
      spark.read.parquet(s"$path/byn")
        .groupBy("node").agg(min(col("label")).as("label"))
  }

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.LongType))))

  /** Pruned bucket read that EXCLUDES `excludeRun`'s own slot: a
    * replayed batch must compute its delta against the pre-batch
    * state — with its first delivery visible, the recomputed delta
    * would be empty and the slot overwrite would erase that first
    * delivery instead of reproducing it.
    *
    * The read enumerates the touched `run=<slot>/<partCol>=<b>` leaf
    * directories EXPLICITLY (one listStatus per run slot, intersected
    * with the wanted buckets) instead of reading the table root and
    * relying on partition-filter pruning: root discovery lists EVERY
    * bucket directory of every slot before pruning — a per-batch
    * fixed cost linear in nBuckets that the probe measured at seconds
    * per read on a 4096-bucket store. Explicit paths keep the listing
    * proportional to the touched buckets. `basePath` preserves the
    * partition columns' visibility for the exclude filter. */
  private[graft] def prunedRead(spark: SparkSession, dir: String, partCol: String,
                                buckets: Seq[Long],
                                excludeRun: Option[String]): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return emptyLabels(spark)
    val wanted = buckets.map(b => s"$partCol=$b").toSet
    val paths = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("run=") &&
        !excludeRun.exists(id => s.getPath.getName == s"run=$id"))
      .flatMap(run => fs.listStatus(run.getPath).toSeq
        .filter(b => b.isDirectory && wanted.contains(b.getPath.getName))
        .map(_.getPath.toString))
    if (paths.isEmpty) emptyLabels(spark)
    else spark.read.option("basePath", dir).parquet(paths: _*)
      .select(col("node"), col("label"))
  }

  /** Fold a batch of new pairs into the store — the bucket-pruned
    * [[ConnectedComponents.incremental]]: read the batch nodes'
    * `nb=` buckets for their current labels, the touched components'
    * `cb=` buckets for their members, rerun CC over stars + batch
    * pairs, and append only the CHANGED rows as this batch's delta
    * slot. Per-batch cost tracks the batch and its touched
    * components, never the corpus.
    *
    * @return the changed (node, label) rows this batch produced */
  def applyBatch(spark: SparkSession, path: String, pairs: DataFrame,
                 aCol: String, bCol: String,
                 runId: Option[String] = None,
                 maxIter: Int = 20): DataFrame = {
    val nBuckets = readMeta(spark, path)
    val p = pairs.select(col(aCol).as("u"), col(bCol).as("v")).persist()
    p.count()
    val batchNodes = p.select(col("u"))
      .unionByName(p.select(col("v").as("u"))).distinct().persist()

    // 1. batch nodes' current labels — pruned to their nb= buckets
    val nbs = batchNodes.select(nbCol(col("u"), nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted // <= nBuckets
    val batchCurrent = prunedRead(spark, s"$path/byn", "nb", nbs, runId)
      .join(batchNodes, col("node") === col("u"), "left_semi")
      .groupBy("node").agg(min(col("label")).as("label"))
      .persist()
    val touchedLabels = batchCurrent.select("label").distinct().persist()
    touchedLabels.count()

    // 2. touched components' members — pruned to their cb= buckets;
    //    every row surviving the semi-join on CURRENT labels is itself
    //    current (see the class invariant)
    val cbs = touchedLabels.select(nbCol(col("label"), nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted // <= nBuckets
    val members = prunedRead(spark, s"$path/byc", "cb", cbs, runId)
      .join(touchedLabels, Seq("label"), "left_semi")
      .persist()

    // 3. rerun CC over star edges + batch pairs (the incremental() body)
    val stars = members.filter(col("node") =!= col("label"))
      .select(col("node").as("u"), col("label").as("v"))
    val sub = ConnectedComponents.run(stars.unionByName(p), "u", "v", maxIter)

    // 4. delta = rows whose label actually changed (anti-join against
    //    the old rows of the same touched scope — sub-scale, not corpus)
    val old = members.unionByName(batchCurrent)
    val delta = sub.join(old, Seq("node", "label"), "left_anti")
      .localCheckpoint(true)
    writeCopies(delta, path, nBuckets, runId)
    Seq(p, batchNodes, batchCurrent, touchedLabels, members)
      .foreach(_.unpersist())
    delta
  }

  /** Fold every slot (base + deltas) back into one resolved
    * `run=__base__` generation per copy — min label per node, stale
    * rows dropped, one file per bucket. */
  def compact(spark: SparkSession, path: String): Unit = {
    val nBuckets = readMeta(spark, path)
    val resolved = (df: DataFrame) => df
      .groupBy("node").agg(min(col("label")).as("label"))
    graft.llm.IvfLayout.compact(spark, s"$path/byn", "nb",
      transform = df => resolved(df.select("node", "label"))
        .withColumn("nb", nbCol(col("node"), nBuckets)))
    graft.llm.IvfLayout.compact(spark, s"$path/byc", "cb",
      transform = df => resolved(df.select("node", "label"))
        .withColumn("cb", nbCol(col("label"), nBuckets)))
  }
}
