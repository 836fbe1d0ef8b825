package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over the corpus: an inverted index of term
  * postings with TF-IDF scoring and a bounded top-k rank — the classic
  * quality-filter / data-selection primitive ("find the corpus documents
  * most similar to this reference set") complementing the dense ANN path
  * in [[Similarity]].
  *
  * Numeric design: IDF is FIXED-POINT — `idf = (N * scale) div df` with
  * integer division — so a document score is an exact BIGINT sum
  * `Σ min(tf, tfCap)·idf`. Integer addition is associative: the score is
  * independent of partition merge order (a double-precision Σ tf·log(N/df)
  * would change in the last bits under Spark's nondeterministic
  * partial-agg ordering and break both the cross-engine gate and
  * run-to-run reproducibility at scale). Log-free IDF ranks identically
  * to log IDF for single-term weighting monotonicity.
  *
  * Range safety at scale: the scale ADAPTS to the corpus — by default
  * `scale = max(1, 2^40 / N)`, so `idf ≤ N·scale ≈ 2^40` regardless of
  * corpus size. With the tf saturation cap (`TfCap`, 10^5) a raw
  * per-term contribution is ≤ tfCap·idf ≈ 2^57, so ~64 worst-case terms
  * would overflow Long; each contribution is therefore ALSO saturated at
  * 2^44 (`ContribCap`), pushing overflow out to ≥ 2^19 shared distinct
  * terms all at the cap — which requires a single document of ≥ 5·10^10
  * tokens, beyond any real input. The cap only engages when a df≈1 term
  * repeats ≥ 2^4·(N/scale-adjusted) times in one doc; ranking
  * monotonicity per term is preserved. Ranking uses the LONG-typed
  * bounded heap, so scores are exact at any magnitude (the double heap
  * would round past 2^53 and make near-ties nondeterministic).
  *
  * Scale shape: postings and document frequencies are two hash
  * aggregations on content-uniform keys; the query-term join is an
  * equi-join on `term` where the query side is tiny (AQE broadcasts it);
  * the final rank reuses the bounded top-k aggregate — map-side partials
  * keep ≤ k docs per query per task, never a full per-query score sort.
  */
object Retrieval {

  /** idf ceiling: the adaptive scale targets N·scale ≈ 2^40. */
  private val IdfCeiling = 1L << 40

  /** tf saturation cap (a token repeated beyond this adds nothing). */
  val TfCap = 100000L

  /** Per-term contribution ceiling — overflow guard for the exact LONG
    * score sum (see scaladoc range-safety paragraph). */
  val ContribCap = 1L << 44

  /** The fixed-point scale used for a corpus of `n` docs when none is
    * given explicitly: max(1, 2^40 / n). */
  def adaptiveIdfScale(n: Long): Long =
    math.max(1L, IdfCeiling / math.max(n, 1L))

  /** Term postings: one row per (term, doc) with the term frequency.
    * One explode + one map-side-combinable aggregation. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** BM25 idf ceiling: the adaptive scale targets N·scale ≈ 2^30 —
    * smaller than TF-IDF's 2^40 to leave headroom for the 22000·tf
    * factor inside the exact LONG contribution (see [[bm25TopK]]). */
  private val Bm25IdfCeiling = 1L << 30

  /** BM25 tf saturation cap. */
  val Bm25TfCap = 10000L

  def bm25AdaptiveScale(n: Long): Long =
    math.max(1L, Bm25IdfCeiling / math.max(n, 1L))

  /** Corpus-size ceiling for the BM25 length normalizer: the average-
    * length derivation computes `1000·T` in a Long, so T (total corpus
    * tokens) must stay ≤ 2^63/1000 ≈ 9.2·10^15 — roughly 37 PB of
    * English text, comfortably past the 100 TB regime. Fail loudly at
    * the boundary rather than silently corrupting every score. */
  val Bm25MaxTotalTokens: Long = Long.MaxValue / 1000L

  /** Average document length in MILLI-tokens: `(1000·T) div N`.
    *
    * This is the overflow-safe two-step form of the length normalizer:
    * the naive per-doc `lpm = (1000·dl·N) div T` computes `1000·dl·N`
    * in a Long, which overflows once `dl·N > 9.2·10^15` — e.g. a
    * 10^7-token document in a 10^9-document corpus, squarely inside
    * the 100 TB regime — silently corrupting `lpm` and every score
    * built on it. Deriving `adm` once (bounded by [[Bm25MaxTotalTokens]])
    * and then `lpm = (10^6·dl) div adm` keeps every intermediate
    * ≤ 10^6·dl, safe for any document below ~9.2·10^12 tokens (a
    * single ~37 TB document — not a real input).
    *
    * Precision: truncating `adm` to milli-tokens perturbs `lpm` by at
    * most one part in `1000·avgdl` (≤ 0.1% even at avgdl = 1) relative
    * to the exact rational `1000·dl·N/T` — far below BM25's ranking
    * resolution, and applied identically on both engine sides so the
    * exact cross-engine contract is unchanged. */
  def bm25AvgDocLenMilli(totalTokens: Long, nDocs: Long): Long = {
    require(totalTokens > 0,
      "bm25: corpus has zero tokens (length normalizer undefined)")
    require(totalTokens <= Bm25MaxTotalTokens,
      s"bm25: total corpus tokens $totalTokens exceeds the Long-safe " +
        s"ceiling $Bm25MaxTotalTokens (~37 PB of text); shard the corpus")
    require(nDocs > 0, "bm25: nDocs must be positive")
    val adm = 1000L * totalTokens / nDocs
    require(adm > 0,
      s"bm25: average document length below 0.001 tokens " +
        s"(totalTokens=$totalTokens, nDocs=$nDocs) — degenerate corpus")
    adm
  }

  /** BM25 top-k retrieval (k1 = 1.2, b = 0.75 — the standard Robertson
    * parameters as exact rationals), with every score an exact BIGINT —
    * the same cross-engine / merge-order determinism contract as
    * [[tfidfTopK]], extended with BM25's tf saturation and document-
    * length normalization (long documents stop winning on raw term
    * repetition — the retrieval behavior that matters when mining a
    * crawl whose spam pages repeat keywords thousands of times).
    *
    * Numeric design (all integer, division LAST per term):
    *  - `idf = (N·scale) div df` — log-free fixed point (rank-preserving
    *    per term, the [[tfidfTopK]] precedent), scale targeting 2^30;
    *  - per-doc length in PER-MILLE of the average, computed two-step
    *    to stay Long-safe at corpus scale: `adm = (1000·T) div N`
    *    milli-tokens (T = total corpus tokens), then
    *    `lpm = (10^6·dl) div adm` — one deterministic integer per
    *    document. See [[bm25AvgDocLenMilli]] for the overflow analysis
    *    (the one-step `(1000·dl·N) div T` form overflows once
    *    `dl·N > 9.2·10^15`, i.e. a multi-million-token document in a
    *    billions-of-docs corpus);
    *  - with k1 = 12/10 and b = 3/4,
    *    `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    *    = `22000·tf / (10000·tf + 3000 + 9·lpm)` exactly, so the
    *    contribution is `(idf · 22000 · min(tf, cap)) div den`, capped
    *    at [[ContribCap]].
    *  - Range: idf ≤ 2^30, 22000·tfCap ≤ 2.2·10^8 → the pre-division
    *    product ≤ 2.4·10^17 ≪ 2^63; the denominator's `9·lpm` term is
    *    ≤ 9·10^6·dl/adm-ish — Long-safe for any document shorter than
    *    ~10^14× the corpus average; per-term contribution ≤ ~2^44, so
    *    the overflow argument of [[tfidfTopK]] carries over, with the
    *    length-normalizer products bounded separately by
    *    [[bm25AvgDocLenMilli]].
    *
    * An all-empty corpus (zero total tokens) fails loudly rather than
    * dividing by zero inside the length normalizer. */
  def bm25TopK(
      docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, qTextCol: String, qIdCol: String,
      k: Int = 10, nDocs: Option[Long] = None,
      idfScale: Option[Long] = None): DataFrame = {
    import graft.functions.VectorFunctions.boundedTopKLong
    val n = nDocs.getOrElse(docs.count())
    val scale = idfScale.getOrElse(bm25AdaptiveScale(n))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(Dedup.tokens(col(textCol))).cast("long").as("dl"))
    val totT = dl.agg(sum(col("dl"))).head().getLong(0)
    val adm = bm25AvgDocLenMilli(totT, n)
    val lnorm = dl.select(col("doc_id"),
      expr(s"(1000000L * dl) div ${adm}L").as("lpm"))
    val p = postings(docs, textCol, idCol)
    val idf = p.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), expr(s"${n}L * ${scale}L div df").as("idf"))
    val qTerms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(Dedup.tokens(col(qTextCol)))).as("term"))
    // integer `div`, NOT double '/': the pre-division product reaches
    // ~2.4e17 > 2^53, where double arithmetic would silently lose the
    // low bits and break the exact cross-engine contract
    val scored = qTerms.join(p, "term").join(idf, "term").join(lnorm, "doc_id")
      .withColumn("contrib", expr(
        s"least((idf * 22000L * least(tf, ${Bm25TfCap}L)) div " +
          s"(10000L * least(tf, ${Bm25TfCap}L) + 3000L + 9L * lpm), " +
          s"${ContribCap}L)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
    scored.groupBy("query_id")
      .agg(boundedTopKLong(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("doc_id"), col("e.score").as("score"))
  }

  // -------------------------------------------------------------------
  // Materialized lexical index — the "index once, append daily, serve
  // many" shape for BM25 at corpus scale. Layout mirrors IvfIndex:
  //
  //   <path>/bucket=<b>/…   postings (term, doc_id, tf, dl) partitioned
  //                         by a term-hash bucket — a query reads ONLY
  //                         the buckets its terms hash into (planning-
  //                         time PartitionFilters), never the corpus;
  //   <path>/_stats         append-only delta rows (n_docs, total_tokens)
  //                         — readers SUM them, so appendIndex never
  //                         rewrites shared state (one tiny file per
  //                         batch; compaction-free crash safety).
  //
  // dl is denormalized into the postings row: BM25's length normalizer
  // then needs no doc-length join at serve time — candidate scoring is
  // a pure scan of the pruned buckets. df per term is derived from the
  // pruned postings themselves (a term's postings live entirely in its
  // bucket, so the pruned read sees EVERY posting of a queried term —
  // df is exact, not sampled).
  // -------------------------------------------------------------------

  private def termBucket(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** Build and write the lexical index: postings with denormalized doc
    * length, partitioned by term-hash bucket, plus the stats sidecar. */
  def writeIndex(docs: DataFrame, textCol: String, idCol: String,
                 path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "writeIndex: nBuckets must be positive")
    val spark = docs.sparkSession
    val toks = docs.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("w"))
    val withLen = toks.select(col("doc_id"), col("w"),
      size(col("w")).cast("long").as("dl"))
    val p = withLen.select(col("doc_id"), col("dl"),
        explode(col("w")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucket(col("term"), nBuckets))
    // spread by (bucket, term), not bucket alone: bucket-only would cap
    // the write at nBuckets tasks — a parallelism bottleneck at corpus
    // scale. A term's postings still land in its one bucket directory
    // (bucket is a pure function of term), just across multiple files.
    RunSlots.reset(spark, path)
    RunSlots.write(p.repartition(col("bucket"), col("term")),
      path, "bucket", Some(RunSlots.Base))
    val stats = withLen.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    RunSlots.writeFlat(stats.coalesce(1), s"$path/_stats", Some(RunSlots.Base))
  }

  /** Append a document batch: batch postings land in the existing bucket
    * directories (the bucket function is content-hash, so it never
    * drifts), and the stats sidecar gains ONE delta row — no shared
    * state is rewritten.
    *
    * The two writes are not atomic together, so WRITE ORDER is the
    * crash contract: the stats delta lands FIRST, postings second. A
    * crash between them leaves stats counting docs whose postings are
    * absent — which only scales the idf/length-normalizer derivation
    * slightly (n_docs/total_tokens a batch too high) without touching
    * any served posting; re-running the same batch converges (the
    * duplicate delta row mirrors the duplicate postings a re-run
    * creates anyway). The CONVERSE order would be worse: postings
    * present but uncounted makes df exceed the global n-derived idf
    * assumption and silently diverges served scores from the direct
    * path until the stats row appears. With a `runId`, a re-run is
    * exactly-once end to end: both the stats delta and the postings
    * OVERWRITE their own `run=<id>` slots ([[RunSlots]]); without
    * one, idempotence remains the caller's id-discipline. */
  def appendIndex(batch: DataFrame, textCol: String, idCol: String,
                  path: String, nBuckets: Int = 64,
                  runId: Option[String] = None): Unit = {
    RunSlots.requireNamedRunId(runId, "Retrieval.appendIndex")
    appendIndexSlot(batch, textCol, idCol, path, nBuckets, runId)
  }

  /** [[appendIndex]] for the index's single checkpointed stream (mints
    * the reserved `b<batchId>` run id). */
  def appendIndexBatch(batch: DataFrame, textCol: String, idCol: String,
                       path: String, nBuckets: Int, batchId: Long): Unit =
    appendIndexSlot(batch, textCol, idCol, path, nBuckets,
      Some(s"b$batchId"))

  private def appendIndexSlot(batch: DataFrame, textCol: String,
                              idCol: String, path: String, nBuckets: Int,
                              runId: Option[String]): Unit = {
    // validate BOTH tables' layouts before writing anything: a legacy
    // (pre-slot) store must fail WRITE-FREE — if only the postings
    // guard fired, the _stats delta slot would already have landed,
    // leaving n_docs counting docs whose postings never arrived and a
    // mixed-depth _stats tree that every later read trips over
    val spark = batch.sparkSession
    RunSlots.requireSlotLayout(spark, path, "bucket")
    RunSlots.requireFlatSlotLayout(spark, s"$path/_stats")
    // standing takedown protection — BEFORE the stats delta, so a
    // forgotten doc neither posts nor counts into n_docs/avgdl
    val kept = Denylist.exclude(batch, idCol, spark, path)
    val toks = kept.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("w"))
    val withLen = toks.select(col("doc_id"), col("w"),
      size(col("w")).cast("long").as("dl")).persist()
    RunSlots.writeFlat(
      withLen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
        .coalesce(1),
      s"$path/_stats", runId)
    RunSlots.write(
      withLen.select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .withColumn("bucket", termBucket(col("term"), nBuckets))
        .repartition(col("bucket"), col("term")),
      path, "bucket", runId)
    withLen.unpersist()
  }

  /** Tombstone indexed documents: [[bm25TopKFromIndex]] excludes their
    * postings immediately (df over surviving postings is then exact);
    * the n_docs/avgdl statistics keep counting them until
    * [[compactIndex]] corrects the sidecar — the Lucene posture
    * (deleted docs affect collection stats until segments merge). A
    * marker hides its id even in postings appended AFTER the deletion —
    * to re-add a deleted id, compact first or use a fresh id
    * ([[Tombstones]] re-ingest trap). */
  def deleteIndexDocs(ids: DataFrame, idCol: String, path: String): Unit =
    Tombstones.add(ids, idCol, path)

  /** One-file-per-bucket rewrite of an appended-to lexical index —
    * the same small-file hygiene as [[IvfIndex.compact]] (N daily
    * appends leave N file sets per bucket directory); stats delta rows
    * ride along verbatim inside `_stats` (sidecars are copied as-is,
    * and their SUM is unchanged by construction). Served results are
    * identical; the bucket PartitionFilter survives (same layout).
    *
    * Tombstoned docs are purged: their postings are dropped in the
    * rewrite and a NEGATIVE delta row (−n_docs, −total_tokens, computed
    * from their pre-purge postings) lands in `_stats`, so idf/avgdl
    * reflect the surviving corpus. The delta rides a CONVERGENT staged
    * protocol — a naive compute/purge/append sequence loses the delta
    * forever if the process dies between purge and append, because the
    * postings it would be recomputed from are gone: (1) adopt any
    * `_stats_pending` delta staged by an interrupted run, else compute
    * and stage one; (2) purge; (3) apply by RENAMING the staged part
    * files into `_stats` (the rename is the append, atomic, and
    * empties pending in the same step — exactly-once under any
    * crash-and-rerun); (4) clear the markers. Deleted EMPTY docs have
    * no postings and stay counted in n_docs — a documented drift of at
    * most the empty-doc count. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = new Path(s"$path/_stats_pending")
    def pendingParts(): Seq[Path] =
      if (!fs.exists(pending)) Seq.empty
      else fs.listStatus(pending).map(_.getPath).toSeq
        .filter(_.getName.startsWith("part-"))
    // 1/2: adopt a staged delta from an interrupted run (its postings
    // may already be purged — recomputing would lose it forever), else
    // compute from the pre-purge postings and STAGE it
    if (pendingParts().isEmpty) {
      Tombstones.readOpt(spark, path).foreach { t =>
        val d = spark.read.parquet(path)
          .join(Tombstones.sizedSide(spark, path,
            t.select(col("id").as("doc_id"))), Seq("doc_id"), "left_semi")
          .select("doc_id", "dl").distinct()
          .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
            coalesce(sum(col("dl")), lit(0L)).as("tok"))
          .head()
        if (d.getLong(0) > 0L) {
          import spark.implicits._
          Seq((-d.getLong(0), -d.getLong(1))).toDF("n_docs", "total_tokens")
            .coalesce(1).write.mode("overwrite").parquet(pending.toString)
        }
      }
    }
    // 3: purge (_stats_pending travels with the underscore sidecars)
    IvfLayout.compact(spark, path, partCol = "bucket",
      transform = df => Tombstones.exclude(df, "doc_id", spark, path))
    // 4: APPLY by renaming the staged part files into _stats — the
    // rename IS the append (atomic) and empties pending in the same
    // step, so a crash-and-rerun applies the delta exactly once
    // the _stats table may be run-slotted (RunSlots layout) — renaming a
    // flat delta file into a run-dir tree would mix directory depths and
    // break partition discovery, so target a dedicated deltas slot there
    val statsRoot = new Path(s"$path/_stats")
    val toApply = pendingParts()
    if (toApply.nonEmpty) {
      val slotted = fs.exists(statsRoot) && fs.listStatus(statsRoot)
        .exists(st => st.isDirectory && st.getPath.getName.startsWith("run="))
      val deltaDir = if (slotted) {
        val d = new Path(s"$path/_stats/run=__deltas__")
        fs.mkdirs(d); d
      } else statsRoot
      toApply.zipWithIndex.foreach { case (p, i) =>
        require(fs.rename(p, new Path(deltaDir, s"delta-$i-${p.getName}")),
          s"Retrieval.compactIndex: install rename of stats delta $p failed")
      }
    }
    fs.delete(pending, true)
    // 5: fold the _stats sidecar itself — one delta slot lands per
    // append batch, so a long-running stream otherwise grows the stats
    // read linearly with total batch count; the summed sidecar is ONE
    // row. Folded batch ids are recorded in the _stats fold manifest so
    // a replayed appendIndex stats delta no-ops, matching its postings
    // no-op (the step-3 manifest). A legacy FLAT _stats migrates to the
    // slotted layout here — the upgrade path writeFlat's guard names.
    // Staged + backup-rename, same crash contract as every compact.
    if (fs.exists(statsRoot)) {
      val statsTmp = new Path(s"$path/_stats__compact_tmp")
      val statsOld = new Path(s"$path/_stats__compact_old")
      require(!fs.exists(statsOld),
        s"Retrieval.compactIndex: leftover $statsOld from an interrupted " +
          "compact — restore it over _stats (or remove it) before re-running")
      fs.delete(statsTmp, true)
      // a PARTIAL batch slot (no _SUCCESS — crash mid-writeFlat of the
      // batch about to be replayed) must not be folded or recorded:
      // exclude it from the summed read, carry it verbatim, and let the
      // replay rewrite it whole (the IvfLayout.compact discipline).
      // __deltas__ is compact-internal (tombstone corrections renamed
      // in by step 4, never replayed) — always folded, never recorded.
      val (statsCommitted, statsPartialRaw) =
        IvfLayout.replayableSlots(fs, statsRoot)
      val (deltaSlots, statsPartial) =
        statsPartialRaw.partition(_.getName == "run=__deltas__")
      val statsSrc =
        if (statsPartial.isEmpty) spark.read.parquet(statsRoot.toString)
        else {
          // __adhoc__ must ride along like it does in IvfLayout.compact:
          // an adhoc _stats slot coexisting with a partial slot would
          // otherwise be neither summed nor carried, silently shrinking
          // n_docs/total_tokens (ADVICE r13)
          val reserved = fs.listStatus(statsRoot).toSeq.map(_.getPath)
            .filter(p => p.getName == s"run=${RunSlots.Base}" ||
              p.getName == s"run=${RunSlots.Adhoc}")
          spark.read.option("basePath", statsRoot.toString)
            .parquet((reserved ++ deltaSlots ++
              statsCommitted).map(_.toString): _*)
        }
      statsSrc
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(sum(col("total_tokens")), lit(0L)).as("total_tokens"))
        .coalesce(1).write
        .parquet(new Path(statsTmp, s"run=${RunSlots.Base}").toString)
      statsPartial.foreach(p => org.apache.hadoop.fs.FileUtil.copy(
        fs, p, fs, new Path(statsTmp, p.getName), false,
        spark.sparkContext.hadoopConfiguration))
      val statsFolded = RunSlots.foldedRuns(spark, statsRoot.toString)
        .fold(statsCommitted.map(IvfLayout.slotId).toSet - "__deltas__")
      if (!statsFolded.isEmpty)
        RunSlots.writeFoldedManifest(spark, statsTmp.toString, statsFolded)
      require(fs.rename(statsRoot, statsOld),
        s"Retrieval.compactIndex: backup rename of $statsRoot failed")
      require(fs.rename(statsTmp, statsRoot),
        s"Retrieval.compactIndex: install rename to $statsRoot failed")
      fs.delete(statsOld, true)
    }
    // 6
    Tombstones.clear(spark, path)
  }

  /** BM25 top-k served FROM the index: identical scores to [[bm25TopK]]
    * over the same corpus (same integer arithmetic, same idf scale
    * derivation from the summed stats), reading only the buckets the
    * query terms hash into — at corpus scale the serve cost tracks the
    * query vocabulary, not the corpus. */
  def bm25TopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qTextCol: String, qIdCol: String,
      k: Int = 10, nBuckets: Int = 64,
      idfScale: Option[Long] = None): DataFrame = {
    import graft.functions.VectorFunctions.boundedTopKLong
    val stats = spark.read.parquet(s"$path/_stats")
      .agg(sum(col("n_docs")), sum(col("total_tokens"))).head()
    val n = stats.getLong(0)
    val totT = stats.getLong(1)
    val adm = bm25AvgDocLenMilli(totT, n)
    val scale = idfScale.getOrElse(bm25AdaptiveScale(n))

    val qTerms = queries.select(col(qIdCol).as("query_id"),
        explode(array_distinct(Dedup.tokens(col(qTextCol)))).as("term"))
    // bounded driver metadata: the distinct buckets of the query terms
    val buckets = qTerms
      .select(termBucket(col("term"), nBuckets).as("bucket")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = spark.read.parquet(path)
    // keep the IN-filter a planning-time PartitionFilter (IvfIndex.topK's
    // partition-value typing note)
    val bucketLits: Seq[Any] = idx.schema("bucket").dataType match {
      case org.apache.spark.sql.types.LongType => buckets.toSeq
      case org.apache.spark.sql.types.IntegerType => buckets.toSeq.map(_.toInt)
      case _ => buckets.toSeq.map(_.toString)
    }
    val p = Tombstones.exclude(
      idx.filter(col("bucket").isin(bucketLits: _*))
        .select(col("term"), col("doc_id"), col("tf"), col("dl")),
      "doc_id", spark, path)
    // df from the pruned postings is EXACT: a term's postings all live in
    // its bucket
    val idf = p.join(qTerms.select("term").distinct(), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), expr(s"${n}L * ${scale}L div df").as("idf"))
    val scored = qTerms.join(p, "term").join(idf, "term")
      .withColumn("lpm", expr(s"(1000000L * dl) div ${adm}L"))
      .withColumn("contrib", expr(
        s"least((idf * 22000L * least(tf, ${Bm25TfCap}L)) div " +
          s"(10000L * least(tf, ${Bm25TfCap}L) + 3000L + 9L * lpm), " +
          s"${ContribCap}L)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
    scored.groupBy("query_id")
      .agg(boundedTopKLong(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("doc_id"), col("e.score").as("score"))
  }

  /** TF-IDF top-k retrieval: for each query document, the k corpus
    * documents with the highest exact fixed-point score, ties broken by
    * lower doc id. Queries sharing no term with a corpus doc contribute
    * nothing (score 0 rows are never materialized).
    *
    * `nDocs` is the corpus document count for the IDF numerator; pass it
    * when already known, else one `count()` job derives it. `idfScale`
    * overrides the adaptive fixed-point scale (tests pin it; production
    * leaves it adaptive). */
  def tfidfTopK(
      docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, qTextCol: String, qIdCol: String,
      k: Int = 10, nDocs: Option[Long] = None,
      idfScale: Option[Long] = None): DataFrame = {
    import graft.functions.VectorFunctions.boundedTopKLong
    val n = nDocs.getOrElse(docs.count())
    val scale = idfScale.getOrElse(adaptiveIdfScale(n))
    val p = postings(docs, textCol, idCol)
    // df = postings rows per term (already unique per (term, doc))
    val idf = p.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        expr(s"${n}L * ${scale}L div df").as("idf"))
    val qTerms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(Dedup.tokens(col(qTextCol)))).as("term"))
    val scored = qTerms.join(p, "term").join(idf, "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(least(least(col("tf"), lit(TfCap)) * col("idf"), lit(ContribCap))).as("score"))
    scored.groupBy("query_id")
      .agg(boundedTopKLong(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("doc_id"), col("e.score").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke 2009) of ranked lists —
    * the standard hybrid-retrieval combiner: each list contributes
    * `1/(k0 + rank)` per (query, doc), summed across lists, re-ranked.
    * Rank positions — not scores — are fused, so lexical BM25 integers
    * and semantic cosines need no calibration against each other.
    *
    * Exact-integer contract like every scorer here: the contribution is
    * `scale div (k0 + rank)` in Long arithmetic (identical to DuckDB's
    * floor `//`), so fused scores cross the engine gate bit-for-bit.
    * With the default `scale`=1e12 a doc in L lists scores at most
    * L·scale/(k0+1) — Long-safe beyond any plausible list count.
    *
    * Inputs must carry (query_id, rank, doc_id); extra columns are
    * ignored. Scale shape: each list is already top-k per query, so the
    * union holds |queries|·Σk rows — the fusion groupBy is a shuffle of
    * that small relation, never of a corpus. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10, k0: Long = 60L,
              scale: Long = 1000000000000L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    import graft.functions.VectorFunctions.boundedTopKLong
    val slim = lists.map(_.select(col("query_id"),
      col("rank").cast("long").as("rank"), col("doc_id")))
    val fused = slim.reduce(_ unionByName _)
      .select(col("query_id"), col("doc_id"),
        expr(s"${scale}L div (${k0}L + rank)").as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
    fused.groupBy("query_id")
      .agg(boundedTopKLong(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("doc_id"), col("e.score").as("score"))
  }
}
