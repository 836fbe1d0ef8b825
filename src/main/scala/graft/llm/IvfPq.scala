package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.VectorFunctions.{floatVecDot, nearestCodewords}

/** IVF+PQ — the canonical planet-scale ANN index (Jégou et al. 2011,
  * the FAISS `IVFxx,PQyy` shape), composing the two pieces this engine
  * already serves separately:
  *
  *  - [[IvfIndex]]'s INVERTED LISTS ON DISK: the corpus partitioned by
  *    coarse cell, so a query scans nProbe/nCells of the index
  *    (planning-time PartitionFilters);
  *  - [[Pq]]'s CODES-ONLY SCORING: inside a cell, each vector is m
  *    small codes + one norm — a 100 TB float corpus becomes a few TB
  *    of codes — and scoring is m table lookups per pair, never a
  *    vector read.
  *
  * PQ encodes RESIDUALS (vec − its cell centroid), the standard trick:
  * residuals concentrate near zero so a small codebook spends its
  * codewords where the data is, sharpening recall at the same m·k.
  *
  * Serving math (cosine contract, same ranking devices as every other
  * ANN path): with reconstruction x̂ = c_cell + r̂,
  * `dot(q, x̂) = dot(q, c_cell) + Σ_s lut_s[code_s]` — the first term is
  * one per-(query, cell) dot, the second m lookups; `‖x̂‖²` is exact and
  * computed ONCE at index time (cell/codeword cross terms are
  * driver-side lookup tables, nCells·m·k doubles of metadata). Queries
  * never read corpus vectors; the index never stores them.
  */
object IvfPq {

  private case class Meta(
      cents: Seq[(Long, Seq[Float])],       // (cid, centroid) sorted by cid
      books: Seq[Seq[Seq[Double]]]) {       // books(s)(j): residual codebook
    val cidToOrd: Map[Long, Int] = cents.map(_._1).zipWithIndex.toMap
    val centsF: Seq[Seq[Float]] = cents.map(_._2)
    val m: Int = books.size
    val dsub: Int = books.head.head.size
    // ‖c‖², dot(c_sub_s, w_sj), ‖w_sj‖² — index-time lookup tables
    val cNormSq: Seq[Double] =
      centsF.map(c => c.map(x => x.toDouble * x.toDouble).sum)
    val cDot: Seq[Seq[Seq[Double]]] = centsF.map { c =>
      (0 until m).map(s => books(s).map(w =>
        (0 until dsub).map(d => c(s * dsub + d).toDouble * w(d)).sum))
    }
    val pqNormSq: Seq[Seq[Double]] =
      books.map(_.map(w => w.map(x => x * x).sum))
  }

  private def ordOf(meta: Meta): Column =
    element_at(typedLit(meta.cidToOrd), col("cid"))

  /** vec − its cell centroid, in float (the PQ kernel's input type). */
  private def residual(vec: Column, meta: Meta): Column =
    zip_with(vec, element_at(typedLit(meta.centsF), ordOf(meta) + 1),
      (a, b) => a - b)

  /** Exact ‖x̂‖² from codes via the index-time tables. */
  private def xNormSq(codes: Column, meta: Meta): Column = {
    val cn = element_at(typedLit(meta.cNormSq), ordOf(meta) + 1)
    val cross = (0 until meta.m).map(s =>
      element_at(element_at(element_at(typedLit(meta.cDot), ordOf(meta) + 1), s + 1),
        element_at(codes, s + 1) + 1)).reduce(_ + _)
    val rn = (0 until meta.m).map(s =>
      element_at(typedLit(meta.pqNormSq(s)), element_at(codes, s + 1) + 1))
      .reduce(_ + _)
    cn + lit(2.0) * cross + rn
  }

  /** Build and write the index: coarse-assign (zero-shuffle projection),
    * train residual codebooks (one corpus pass per Lloyd iteration),
    * encode, and write `(id, codes, xnormsq)` partitioned by cell, plus
    * `_centroids` / `_codebooks` sidecars — a reader needs nothing else. */
  def write(
      corpus: DataFrame, vecCol: String, idCol: String, path: String,
      nCells: Int = 16, m: Int = 8, k: Int = 16, iters: Int = 3,
      corpusRows: Option[Long] = None,
      trainedCentroids: Option[Seq[Seq[Double]]] = None): Unit = {
    val spark = corpus.sparkSession
    val cents = Similarity
      .centroidsOf(corpus, vecCol, idCol, nCells, corpusRows, trainedCentroids)
      .sortBy(_._1)
    val assigned = Similarity
      .assignCells(corpus, cents, vecCol, idCol, "neighbor", 1)
    // train PQ on residuals: same working-set shape as Pq.fit, input is
    // the residual projection (never materialized to disk)
    val preMeta = Meta(cents, Seq(Seq(Seq(0.0)))) // centroid tables only
    val resid = assigned.select(col("neighbor_id"),
      residual(col("neighbor_vec"), preMeta).as("resid"), col("cid"))
    val books = Pq.fit(resid, "resid", "neighbor_id", m, k, iters, corpusRows)
    val meta = Meta(cents, books)
    val codes = nearestCodewords(col("resid"), books)
    RunSlots.reset(spark, path)
    RunSlots.write(
      resid.select(col("neighbor_id").as("id"), codes.as("codes"), col("cid"))
        .withColumn("xnormsq", xNormSq(col("codes"), meta)),
      path, "cid", Some(RunSlots.Base))
    import spark.implicits._
    // staged install for both sidecars (IvfIndex.write's discipline):
    // absent-or-complete, never torn
    VersionedArtifact.writeStaged(cents.toDF("cid", "c_vec"),
      s"$path/_centroids")
    VersionedArtifact.writeStaged(
      books.zipWithIndex.flatMap { case (book, s) =>
        book.zipWithIndex.map { case (w, j) => (s, j, w) }
      }.toDF("s", "j", "w"),
      s"$path/_codebooks")
  }

  /** Append a batch into the existing layout using the index's OWN
    * sidecar quantizer and codebooks — appended rows land in existing
    * cell directories with codes from the frozen codebooks, so pruned
    * reads and ADC math stay correct without re-indexing (the daily
    * incremental shape, mirroring [[IvfIndex.append]]). Codebook drift
    * under a shifting distribution is a re-index decision, not an
    * append-time one. */
  def append(batch: DataFrame, vecCol: String, idCol: String, path: String,
             runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "IvfPq.append")
    appendSlot(batch, vecCol, idCol, path, runId)
  }

  /** [[append]] for the index's single checkpointed stream (mints the
    * reserved `b<batchId>` run id). */
  def appendBatch(batch: DataFrame, vecCol: String, idCol: String,
                  path: String, batchId: Long): Unit =
    appendSlot(batch, vecCol, idCol, path, Some(s"b$batchId"))

  private def appendSlot(batch: DataFrame, vecCol: String, idCol: String,
                         path: String, runId: Option[String]): Unit = {
    val meta = readMeta(batch.sparkSession, path)
    // standing takedown protection: forgotten ids never re-index
    val kept = Denylist.exclude(batch, idCol, batch.sparkSession, path)
    val assigned = Similarity.assignCells(kept, meta.cents, vecCol, idCol, "neighbor", 1)
    val resid = assigned.select(col("neighbor_id"),
      residual(col("neighbor_vec"), meta).as("resid"), col("cid"))
    RunSlots.write(
      resid.select(col("neighbor_id").as("id"),
          nearestCodewords(col("resid"), meta.books).as("codes"), col("cid"))
        .withColumn("xnormsq", xNormSq(col("codes"), meta)),
      path, "cid", runId)
  }

  /** One-file-per-cell rewrite of an appended-to index; tombstoned rows
    * are purged and the markers cleared. See [[IvfLayout.compact]].
    *
    * NOTE on quantizer drift: unlike [[IvfIndex.retrain]], an IVF+PQ
    * store CANNOT retrain from itself — it holds codes, not vectors
    * (that lossy compression is the point). Repairing centroid/codebook
    * drift here means [[retrainFrom]] over the vector corpus the caller
    * custodies (e.g. the embeddings table or an [[IvfIndex]] twin). */
  def compact(spark: SparkSession, path: String): Unit = {
    IvfLayout.compact(spark, path, "cid",
      df => Tombstones.exclude(df, "id", spark, path))
    Tombstones.clear(spark, path)
  }

  /** RETRAIN quantizer + codebooks from an externally-custodied vector
    * corpus and rebuild the index — [[IvfIndex.retrain]]'s
    * FAISS re-train/re-add lifecycle for the codes-only store, which
    * cannot retrain from itself (see [[compact]]'s drift note). The
    * caller owns vector custody: `corpus` must be the CURRENT corpus
    * the rebuilt index should serve (tombstoned ids are excluded and
    * the markers cleared, like retrain).
    *
    * Crash contract (the [[IvfLayout.compact]] discipline): the new
    * index is STAGED fully beside the live one, then installed by
    * backup-rename + move (atomic on HDFS/POSIX; object stores refuse
    * via requireAtomicRename); a crash mid-swap leaves
    * `<path>__retrain_old` to restore, and a re-run refuses while it
    * exists. The fold manifest carries forward: the rebuilt base holds
    * every live row, so replayed pre-retrain batch ids stay no-ops. */
  def retrainFrom(corpus: DataFrame, vecCol: String, idCol: String,
                  path: String, nCells: Int = 16, m: Int = 8, k: Int = 16,
                  iters: Int = 3): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = corpus.sparkSession
    val root = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    graft.warehouse.Warehouse.requireAtomicRename(
      Option(fs.getScheme).getOrElse(""),
      spark.conf.getOption("spark.graft.warehouse.allowNonAtomicRename")
        .exists(_.equalsIgnoreCase("true")))
    require(fs.exists(root), s"IvfPq.retrainFrom: no index at $path")
    val tmp = new Path(path + "__retrain_tmp")
    val old = new Path(path + "__retrain_old")
    require(!fs.exists(old),
      s"IvfPq.retrainFrom: leftover $old from an interrupted retrain — " +
        "restore it over the index path (or remove it) before re-running")
    IvfLayout.requireNoPartialSlots(fs, root, "IvfPq.retrainFrom")
    fs.delete(tmp, true)
    val vecs = Tombstones.exclude(
      corpus.select(col(idCol), col(vecCol)), idCol, spark, path).persist()
    // precondition, not a late k-means error (IvfIndex.retrain's guard)
    val nVecs = vecs.count()
    require(nVecs >= nCells.toLong,
      s"IvfPq.retrainFrom: corpus holds $nVecs live vector(s) after " +
        s"tombstone exclusion, fewer than nCells=$nCells — delete the " +
        "store or rebuild it (with a smaller nCells) instead of " +
        "retraining")
    // hash-sampled init + Lloyd refinement for the coarse quantizer
    // (id-stride seeds inherit id structure — IvfIndex.retrain's note);
    // residual codebooks retrain inside write() against the new cells
    val cents = KMeans.fit(vecs, vecCol, idCol, nCells,
      iters = 5, init = Some(KMeans.hashSampleInit(vecs, vecCol, idCol, nCells)))
    write(vecs, vecCol, idCol, tmp.toString, nCells, m, k, iters,
      corpusRows = Some(nVecs), trainedCentroids = Some(cents))
    vecs.unpersist()
    val allFolded = RunSlots.foldedRuns(spark, path)
      .fold(IvfLayout.replayableSlots(fs, root)._1.map(IvfLayout.slotId).toSet)
    if (!allFolded.isEmpty)
      RunSlots.writeFoldedManifest(spark, tmp.toString, allFolded)
    require(fs.rename(root, old), s"IvfPq.retrainFrom: backup rename of $path failed")
    require(fs.rename(tmp, root), s"IvfPq.retrainFrom: install rename to $path failed")
    fs.delete(old, true)
    Tombstones.clear(spark, path)
  }

  /** Tombstone vectors by id: [[topK]]/[[topKRerank]] exclude them
    * immediately (no rewrite); [[compact]] reclaims their rows. A marker
    * hides its id even in rows appended AFTER the deletion — to re-add
    * a deleted id, compact first or use a fresh id ([[Tombstones]]
    * re-ingest trap). */
  def deleteDocs(ids: DataFrame, idCol: String, path: String): Unit =
    Tombstones.add(ids, idCol, path)

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val cents = spark.read.parquet(s"$path/_centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq.sortBy(_._1)
    val rows = spark.read.parquet(s"$path/_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    Meta(cents, (0 until m).map(s => (0 until k).map(j => byKey((s, j)))))
  }

  /** ADC top-k against a written index: probed-cell partition-pruned
    * scan of CODES (never vectors), per-(query, cell) centroid dot +
    * per-pair m lookups, ranked by the shared BoundedTopK. */
  def topK(
      spark: SparkSession, path: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val meta = readMeta(spark, path)
    // both ADC halves are native kernels (constant plan size in m·k);
    // the former m×k-node literal-dot LUT array was the documented plan
    // bomb at production codebook sizes — see Pq.topK
    val q = Similarity
      .assignCells(queries, meta.cents, vecCol, idCol, "query", nProbe)
      .withColumn("q_cdot",
        floatVecDot(col("query_vec"), element_at(typedLit(meta.centsF), ordOf(meta) + 1)))
      .withColumn("q_norm", sqrt(floatVecDot(col("query_vec"), col("query_vec"))))
      .withColumn("lut",
        graft.functions.VectorFunctions.adcLut(col("query_vec"), meta.books))
      .drop("query_vec")
    val probed = q.select("cid").distinct().collect().map(_.getLong(0)).toSeq.sorted

    val idx = spark.read.parquet(path)
    // keep the IN-filter a planning-time PartitionFilter (IvfIndex.topK's
    // partition-value typing note)
    val cidLits: Seq[Any] = idx.schema("cid").dataType match {
      case LongType => probed
      case IntegerType => probed.map(_.toInt)
      case _ => probed.map(_.toString)
    }
    val cells = Tombstones.exclude(
      idx.filter(col("cid").isin(cidLits: _*))
        .select(col("id"), col("codes"), col("xnormsq"), col("cid").cast("long").as("cid")),
      "id", spark, path)

    val scored = cells.join(broadcast(q), "cid")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(
          (col("q_cdot") +
            graft.functions.VectorFunctions.adcScore(
              col("codes"), col("lut"), meta.books.head.size))
            / (col("q_norm") * sqrt(col("xnormsq"))), 6).as("c_r"))
    Similarity.rankTopK(scored, k)
  }

  /** Two-stage serving: ADC candidates, then EXACT-cosine refinement
    * (the FAISS `IndexRefineFlat` shape). Stage 1 is [[topK]] at
    * `k·refine` — codes-only, cell-pruned, cheap. Stage 2 fetches the
    * ORIGINAL vectors for only those |queries|·k·refine candidate ids
    * and re-ranks by exact cosine, fixing the ordering errors
    * quantization introduces inside the candidate pool (what ADC cannot
    * fix: a true neighbor outside the probed cells, or ranked below
    * `k·refine` by ADC — both are nProbe/refine tuning knobs, not
    * scoring errors).
    *
    * Scale shape: the candidate list is broadcast into a hash semi-join
    * against the vector table, so the 100 TB corpus is never shuffled —
    * the fetch is one column-pruned scan (id + vector) probing a
    * bounded-size hash relation. Total vector IO per query batch is the
    * scan; total vector COMPUTE is k·refine exact dots per query. In a
    * warehouse whose vector table is bucketed or indexed by id the scan
    * itself prunes too; this operator deliberately takes the vectors as
    * a DataFrame rather than assuming a layout. */
  def topKRerank(
      spark: SparkSession, path: String, queries: DataFrame,
      vectors: DataFrame, vecCol: String, idCol: String, k: Int,
      nProbe: Int = 4, refine: Int = 4): DataFrame = {
    val cand = topK(spark, path, queries, vecCol, idCol, k * refine, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val nv = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"))
    val scored = nv
      .join(broadcast(cand), Seq("neighbor_id")) // corpus-side probe, no shuffle
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("q_vec"), col("n_vec")), 6).as("c_r"))
    Similarity.rankTopK(scored, k)
  }

  /** Store integrity audit over the code rows (codes only — residuals
    * are not stored, so assignment itself is [[IvfIndex.fsck]]'s check
    * on the vector-carrying index):
    *  - `bad_code_length` (CORRUPTION): a code array not of the
    *    codebooks' m subspaces — ADC scoring indexes by subspace;
    *  - `code_out_of_range` (CORRUPTION): a code ≥ k (or negative) —
    *    the LUT lookup would read a foreign codeword. */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, path)
    val rows = spark.read.parquet(path)
      .select(col("codes")).persist()
    val badLen = rows.filter(size(col("codes")) =!= meta.m).count()
    val outOfRange = rows.filter(
      exists(col("codes"), c => c < 0 || c >= meta.books.head.size)).count()
    rows.unpersist()
    import spark.implicits._
    Seq(("bad_code_length", badLen), ("code_out_of_range", outOfRange))
      .toDF("check", "violations")
  }

}
