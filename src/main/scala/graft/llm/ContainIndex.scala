package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Materialized asymmetric-containment index — the incremental serving
  * form of [[Dedup.containmentPairs]], completing the dedup family
  * pattern ([[MinHashIndex]] for Jaccard, this for containment): the
  * corpus is shingled ONCE at index time, and a daily batch's
  * containment pairs are served reading only the gram buckets the
  * batch's own shingles hash into.
  *
  * Containment is DIRECTIONAL, so the index stores three tables:
  *
  *  - `post/pb=<b>/…` — full postings (id, s): the B side of
  *    batch-as-A candidates;
  *  - `pref/pf=<b>/…` — each indexed doc's rarest-first A-PREFIX rows
  *    (id, s): the A side of index-as-A candidates, which
  *    batch-prefix-only serving would MISS (a corpus doc contained in
  *    a new longer doc — the takedown-relevant direction). Prefixes
  *    are frozen at their ingest-time df order; the one-sided prefix
  *    lemma holds for ANY fixed per-doc total order, so frozen order
  *    costs only efficiency, never correctness;
  *  - `sets/ib=<b>/…` — the sorted shingle-hash sets for exact verify
  *    (the [[MinHashIndex]] sets layout).
  *
  * Serve cost tracks the batch: both candidate joins prune their index
  * side to the batch's gram buckets (planning-time PartitionFilters —
  * a stored prefix or posting row can only collide with the batch on a
  * gram the batch contains), and verify reads only the candidates' id
  * buckets. Results are exact: same verify kernel, same threshold
  * semantics as the recompute-everything operator, restricted to pairs
  * touching the batch (never index-vs-index).
  *
  * The index is built FOR a minimum threshold (`_index_meta.json`):
  * stored prefixes carry `n − ceil(t·n) + 1` grams, which is lossless
  * for any serve threshold ≥ the indexed one (higher thresholds need
  * SHORTER prefixes) and refused below it. */
object ContainIndex {

  private def gb(s: Column, n: Int): Column = pmod(s, lit(n.toLong))
  private def ib(id: Column, n: Int): Column = pmod(xxhash64(id), lit(n.toLong))

  // ---- metadata (the ChunkStore discipline: Hadoop FS, atomic) --------

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeMeta(spark: SparkSession, path: String,
                        threshold: Double, shingleN: Int, nBuckets: Int): Unit = {
    val (fs, _) = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_index_meta.json__tmp")
    val live = new org.apache.hadoop.fs.Path(s"$path/_index_meta.json")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"threshold":$threshold,"shingleN":$shingleN,"nBuckets":$nBuckets}"""
        .getBytes("UTF-8"))
    finally out.close()
    // OVERWRITE rename: atomic replace, no missing-meta window (the
    // ChunkStore.writeMeta discipline)
    org.apache.hadoop.fs.FileContext
      .getFileContext(live.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, live, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[llm] def readMeta(spark: SparkSession, path: String): (Double, Int, Int) = {
    val (fs, _) = fsOf(spark, path)
    val live = new org.apache.hadoop.fs.Path(s"$path/_index_meta.json")
    require(fs.exists(live), s"ContainIndex: no index metadata at $path")
    val in = fs.open(live)
    val txt = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8")
    } finally in.close()
    val pat =
      """"threshold"\s*:\s*([0-9.Ee+-]+)\s*,\s*"shingleN"\s*:\s*(\d+)\s*,\s*"nBuckets"\s*:\s*(\d+)""".r.unanchored
    txt match {
      case pat(t, sn, nb) => (t.toDouble, sn.toInt, nb.toInt)
      case _ => throw new IllegalStateException(
        s"ContainIndex: unparseable _index_meta.json at $path: $txt")
    }
  }

  private def typedLits(df: DataFrame, colName: String, vals: Seq[Long]): Seq[Any] =
    df.schema(colName).dataType match {
      case LongType => vals
      case IntegerType => vals.map(_.toInt)
      case _ => vals.map(_.toString)
    }

  /** An index table seeded from an EMPTY corpus has no partition dirs
    * (parquet cannot persist a zero-file schema — the ChunkStore empty-
    * seed case): read it as an empty frame shaped like `like`. */
  private def readBuckets(spark: SparkSession, dir: String, partPrefix: String,
                          vals: Seq[Long], like: DataFrame,
                          cols: Seq[String]): DataFrame = {
    val hasParts = RunSlots.hasParts(spark, dir, partPrefix)
    if (!hasParts) like.select(cols.map(col): _*).limit(0)
    else {
      val raw = spark.read.parquet(dir)
      raw.filter(col(partPrefix).isin(typedLits(raw, partPrefix, vals): _*))
        .select(cols.map(col): _*)
    }
  }

  /** Rarest-first A-prefix rows (id, s) for the given postings under the
    * given df table — the [[Dedup.containmentPairs]] prefix, shared by
    * write/append/serve. */
  private def prefixes(post: DataFrame, freq: DataFrame,
                       threshold: Double): DataFrame =
    post.join(freq, "s")
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)")
        .as("sorted_hs"), count(lit(1)).as("n"))
      .withColumn("plen",
        (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int") + 1))
      .select(col("id"), explode(expr("slice(sorted_hs, 1, plen)")).as("s"))

  /** Build the index: postings, frozen rarest-first prefixes (global
    * write-time df), and verify sets, each bucket-partitioned. */
  def write(docs: DataFrame, textCol: String, idCol: String, path: String,
            threshold: Double = 0.9, shingleN: Int = 3,
            nBuckets: Int = 64): Unit = {
    require(threshold > 0 && threshold <= 1,
      "ContainIndex.write: threshold must be in (0, 1]")
    require(nBuckets > 0, "ContainIndex.write: nBuckets must be positive")
    val spark = docs.sparkSession
    val (fs, root) = fsOf(spark, path)
    if (fs.exists(root)) fs.delete(root, true)
    val sets = Dedup.shingleHashSets(docs, textCol, idCol, shingleN)
      .filter(size(col("hs")) > 0).persist()
    val post = sets.select(col("id"), explode(col("hs")).as("s")).persist()
    val freq = post.groupBy("s").agg(count(lit(1)).as("df"))
    RunSlots.write(
      prefixes(post, freq, threshold)
        .withColumn("pf", gb(col("s"), nBuckets))
        .repartition(col("pf"), col("s")),
      s"$path/pref", "pf", Some(RunSlots.Base))
    RunSlots.write(
      post.withColumn("pb", gb(col("s"), nBuckets))
        .repartition(col("pb"), col("s")),
      s"$path/post", "pb", Some(RunSlots.Base))
    RunSlots.write(
      sets.withColumn("ib", ib(col("id"), nBuckets))
        .repartition(col("ib"), col("id")),
      s"$path/sets", "ib", Some(RunSlots.Base))
    post.unpersist(); sets.unpersist()
    writeMeta(spark, path, threshold, shingleN, nBuckets)
  }

  /** Append a batch: its postings/sets land in the existing buckets and
    * its prefixes freeze at append-time df (index + batch over the
    * batch's own gram buckets — exact for every batch gram). */
  def append(batch: DataFrame, textCol: String, idCol: String,
             path: String, runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "ContainIndex.append")
    appendSlot(batch, textCol, idCol, path, runId)
  }

  /** [[append]] for the index's single checkpointed stream (mints the
    * reserved `b<batchId>` run id). */
  def appendBatch(batch: DataFrame, textCol: String, idCol: String,
                  path: String, batchId: Long): Unit =
    appendSlot(batch, textCol, idCol, path, Some(s"b$batchId"))

  private def appendSlot(batch: DataFrame, textCol: String, idCol: String,
                         path: String, runId: Option[String]): Unit = {
    val spark = batch.sparkSession
    val meta = readMeta(spark, path)
    // standing takedown protection: forgotten ids never re-index
    val kept = Denylist.exclude(batch, idCol, spark, path)
    val bsets = Dedup.shingleHashSets(kept, textCol, idCol, meta._2)
      .filter(size(col("hs")) > 0).persist()
    val bpost = bsets.select(col("id"), explode(col("hs")).as("s")).persist()
    appendFromView(spark, path,
      batchView(spark, path, bsets, bpost, meta._3), meta, runId)
    bpost.unpersist(); bsets.unpersist()
  }

  /** The batch's shared serve/append working set: persisted sets and
    * postings, touched posting buckets, the tombstone-excluded pruned
    * index postings, and the (index ∪ batch) gram df — computed ONCE
    * per batch and consumed by both the serve and append halves. */
  private case class BatchView(bsets: DataFrame, bpost: DataFrame,
                               touched: Seq[Long], idxPost: DataFrame,
                               freq: DataFrame)

  private def batchView(spark: SparkSession, path: String,
                        bsets: DataFrame, bpost: DataFrame,
                        nBuckets: Int): BatchView = {
    val touched = bpost.select(gb(col("s"), nBuckets).as("pb")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // bounded: <= nBuckets
    val idxPost = Tombstones.exclude(
      readBuckets(spark, s"$path/post", "pb", touched, bpost, Seq("id", "s")),
      "id", spark, path)
    val freq = idxPost.unionByName(bpost).groupBy("s").agg(count(lit(1)).as("df"))
    BatchView(bsets, bpost, touched, idxPost, freq)
  }

  private def appendFromView(spark: SparkSession, path: String,
                             v: BatchView, meta: (Double, Int, Int),
                             runId: Option[String] = None): Unit = {
    val (t0, _, nBuckets) = meta
    RunSlots.write(
      prefixes(v.bpost, v.freq, t0)
        .withColumn("pf", gb(col("s"), nBuckets))
        .repartition(col("pf"), col("s")),
      s"$path/pref", "pf", runId)
    RunSlots.write(
      v.bpost.withColumn("pb", gb(col("s"), nBuckets))
        .repartition(col("pb"), col("s")),
      s"$path/post", "pb", runId)
    RunSlots.write(
      v.bsets.withColumn("ib", ib(col("id"), nBuckets))
        .repartition(col("ib"), col("id")),
      s"$path/sets", "ib", runId)
  }

  /** One serve-then-append cycle with the batch SHINGLED ONCE and the
    * bucket reads / gram-df computed once (the
    * [[MinHashIndex.serveThenAppend]] shape the streaming loop runs
    * on — the two-call form pays each twice per micro-batch).
    * `writePairs` receives the EAGER pair result (safe against the
    * index mutating underneath — serving happened against the
    * pre-append state).
    *
    * Delivery contract (as [[MinHashIndex.serveThenAppend]]):
    * foreachBatch is at-least-once. The PAIRS side is idempotent when
    * written to a per-batch overwrite slot; the index-append side is
    * exactly-once when `runId` is passed — the replayed batch
    * OVERWRITES its own `run=<id>` slot ([[RunSlots]]) instead of
    * landing its postings/prefixes/sets twice. Without a runId the
    * append accumulates under the ad-hoc slot (pre-slot behavior). */
  def serveThenAppend(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.9, runId: Option[String] = None)(
      writePairs: DataFrame => Unit): Unit = {
    RunSlots.requireNamedRunId(runId, "ContainIndex.serveThenAppend")
    serveThenAppendSlot(spark, path, batch, textCol, idCol, threshold,
      runId)(writePairs)
  }

  /** [[serveThenAppend]] for the checkpointed stream (mints `b<id>`). */
  def serveThenAppendBatch(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      threshold: Double, batchId: Long)(
      writePairs: DataFrame => Unit): Unit =
    serveThenAppendSlot(spark, path, batch, textCol, idCol, threshold,
      Some(s"b$batchId"))(writePairs)

  private def serveThenAppendSlot(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      threshold: Double, runId: Option[String])(
      writePairs: DataFrame => Unit): Unit = {
    val meta = readMeta(spark, path)
    // standing takedown protection, applied to the WHOLE loop (serve
    // included): a forgotten doc neither pairs nor re-indexes
    val kept = Denylist.exclude(batch, idCol, spark, path)
    val bsets = Dedup.shingleHashSets(kept, textCol, idCol, meta._2)
      .filter(size(col("hs")) > 0).persist()
    val bpost = bsets.select(col("id"), explode(col("hs")).as("s")).persist()
    val v = batchView(spark, path, bsets, bpost, meta._3)
    val freqCached = v.freq.persist() // two consumers: serve bpref + append prefix
    val shared = v.copy(freq = freqCached)
    writePairs(serveFromView(spark, path, shared, threshold, meta))
    appendFromView(spark, path, shared, meta, runId)
    freqCached.unpersist(); bpost.unpersist(); bsets.unpersist()
  }

  /** Containment pairs TOUCHING `batch` — batch-as-A against
    * (index ∪ batch) and index-as-A against batch, never
    * index-vs-index — identical values to [[Dedup.containmentPairs]]
    * over the indexed corpus ∪ batch restricted to batch-touching
    * pairs. Reads only the batch's gram buckets (both candidate joins)
    * and the candidates' id buckets (verify). The result is
    * MATERIALIZED (eager localCheckpoint) and the internal caches
    * released — the [[MinHashIndex.nearDupPairsIncremental]] contract.
    *
    * `threshold` must be ≥ the indexed threshold (stored prefixes are
    * exactly long enough for it; serving looser would be lossy and is
    * refused). */
  def containmentPairsIncremental(
      spark: SparkSession, path: String, batch: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.9): DataFrame = {
    val meta = readMeta(spark, path)
    // standing takedown protection on the serve-only route too (r16
    // review, second pass): a forgotten doc must not emit pairs
    val kept = Denylist.exclude(batch, idCol, spark, path)
    val bsets = Dedup.shingleHashSets(kept, textCol, idCol, meta._2)
      .filter(size(col("hs")) > 0).persist()
    val bpost = bsets.select(col("id"), explode(col("hs")).as("s")).persist()
    val out = serveFromView(spark, path,
      batchView(spark, path, bsets, bpost, meta._3), threshold, meta)
    bpost.unpersist(); bsets.unpersist()
    out
  }

  /** The serve body from a precomputed [[BatchView]]; returns the EAGER
    * checkpointed pair set and releases its own internal candidate
    * cache. */
  private def serveFromView(
      spark: SparkSession, path: String, v: BatchView,
      threshold: Double, meta: (Double, Int, Int)): DataFrame = {
    val (t0, _, nBuckets) = meta
    require(threshold >= t0 - 1e-12,
      s"ContainIndex: index at $path was built for threshold >= $t0; " +
        s"serving at $threshold would miss qualifying pairs — rebuild " +
        "the index at the lower threshold")
    import graft.functions.VectorFunctions.sortedLongIntersectCount
    val bsets = v.bsets; val bpost = v.bpost

    val idxPref = Tombstones.exclude(
      readBuckets(spark, s"$path/pref", "pf", v.touched, bpost, Seq("id", "s")),
      "id", spark, path)

    // batch-as-A: fresh rarest-first prefixes under (index + batch) df —
    // exact for every batch gram, since a gram's postings all live in
    // its (read) bucket
    val bpref = prefixes(bpost, v.freq, threshold)
    val candA = bpref.select(col("id").as("id_a"), col("s"))
      .join(v.idxPost.unionByName(bpost).select(col("id").as("id_b"), col("s")), "s")
    // index-as-A: stored prefixes (pruned to batch gram buckets) against
    // batch postings — the direction batch-only prefixes would miss
    val candB = idxPref.select(col("id").as("id_a"), col("s"))
      .join(bpost.select(col("id").as("id_b"), col("s")), "s")
    val cand = candA.unionByName(candB)
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      .persist()

    val ibs = cand.select(ib(col("id_a"), nBuckets).as("ib"))
      .unionByName(cand.select(ib(col("id_b"), nBuckets).as("ib")))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val idxSets = Tombstones.exclude(
      readBuckets(spark, s"$path/sets", "ib", ibs, bsets, Seq("id", "hs")),
      "id", spark, path)
    val allSets = bsets.unionByName(idxSets)

    val a = allSets.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val b = allSets.select(col("id").as("id_b"), col("hs").as("hs_b"))
    val out = cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        sortedLongIntersectCount(col("hs_a"), col("hs_b"))
          .cast("double").as("inter"),
        size(col("hs_a")).cast("double").as("na"))
      .withColumn("containment", col("inter") / col("na"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
      .localCheckpoint(true)
    cand.unpersist()
    out
  }

  /** Tombstone indexed documents: serving stops pairing against them
    * immediately (no rewrite); [[compact]] reclaims their prefix,
    * posting, and set rows. Same re-ingest trap as every marker store
    * ([[Tombstones]]): compact first or use a fresh id to re-add. */
  def deleteDocs(ids: DataFrame, idCol: String, path: String): Unit =
    Tombstones.add(ids, idCol, path)

  /** One file per bucket directory after N appends (all three tables);
    * tombstoned ids purged, markers cleared. Sub-tables still empty
    * from an empty seed are skipped (nothing to rewrite). */
  def compact(spark: SparkSession, path: String): Unit = {
    // three independent staged rewrites (different lease keys) with
    // bounded overlap (§2.6); markers clear only after ALL folds land
    graft.core.Par.run(3)(
      Seq("pref" -> "pf", "post" -> "pb", "sets" -> "ib").map {
        case (t, pp) => () =>
          if (RunSlots.hasParts(spark, s"$path/$t", pp))
            IvfLayout.compact(spark, s"$path/$t", partCol = pp,
              transform = df => Tombstones.exclude(df, "id", spark, path))
      })
    Tombstones.clear(spark, path)
  }
}
