package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the ANN playbook:
  *  - `bruteForceTopK` — exact cosine top-k: queries broadcast against the
  *    corpus, per-partition partial top-k, final k-merge. The verification
  *    baseline, and the right answer whenever |queries| is small.
  *  - `lshTopK` — random-hyperplane LSH bucketing: per-vector bit
  *    signature (one projection), chunk-bucket join for candidates, exact
  *    re-rank. Sub-linear candidate sets at corpus scale.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in DOUBLE
    * with left-to-right accumulation (bit-stable across engines). The dot
    * product is the custom codegen'd FloatVecDot kernel — same bits as the
    * zip_with/aggregate HOF form, ~4x less per-pair overhead (no
    * intermediate array, no lambda dispatch). */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions.floatVecDot
    floatVecDot(a, b) / (sqrt(floatVecDot(a, a)) * sqrt(floatVecDot(b, b)))
  }

  /** Exact top-k neighbors for each query vector. The query side is
    * broadcast (bounded: |queries| × dim doubles); the corpus is scanned
    * once, partition-parallel; rank via the BoundedTopK aggregate — each
    * task keeps ≤ k candidates per query (map-side partial agg), the
    * shuffle carries ≤ k × tasks rows per query, the final merge is a
    * k-way heap merge. No stage ever holds all n scores of a query.
    * Ranking is on a rounded score with id tie-break: deterministic under
    * both engine float paths (adjacent-gap >> rounding step, measured). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.boundedTopK
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("c_r"))
    rankTopK(scored, k)
  }

  /** Shared final ranking for every ANN path: bounded top-k aggregate over
    * (query_id, neighbor_id, c_r = rounded cosine) — map-side partials
    * keep ≤ k per query per task; no per-query rank window. Input pairs
    * must be distinct (duplicates would occupy multiple top-k slots). */
  private[llm] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.boundedTopK
    scored.groupBy(col("query_id"))
      .agg(boundedTopK(col("c_r"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("e.id").as("neighbor_id"), col("e.score").as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), broadcast as
    * literals: nPlanes × dim doubles — bounded metadata, never data. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Per-vector LSH bit signature: sign bit of the dot product with each
    * hyperplane — a single projection over literal plane arrays. A vector
    * whose length differs from the plane dimension fails loudly: zip_with
    * would pad with NULLs, silently zeroing signature bits and collapsing
    * buckets (recall loss with no error). */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.size
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, typedLit(p), (v, w) => v.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    // NULL vectors get their own branch: size(NULL) is NULL, so the dim
    // guard would fall through to raise_error(concat(..., NULL)) — a job
    // death with a NULL message. Fail with an actionable message instead.
    when(vec.isNull,
        raise_error(lit("lshSignature: null embedding vector")))
      .when(size(vec) === dim, bits.reduce(_ + _))
      .otherwise(raise_error(concat(
        lit(s"lshSignature: expected $dim-dim vector, got "),
        size(vec).cast("string"))))
  }

  /** Deterministic id-stride centroid sample — the k-means stand-in
    * shared by ivfTopK's default path and KMeans.fit's init. The
    * orderBy matters: the stride filter can match MORE than k ids
    * (e.g. 9 of 500 for k=8), and limit() without an order would keep
    * a scan-order-dependent subset — partition-layout-dependent, which
    * breaks every pinned oracle downstream. */
  private[llm] def strideCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, corpusRows: Option[Long]): DataFrame = {
    val n = corpusRows.getOrElse(corpus.count())
    val stride = math.max(n / k, 1L)
    corpus.select(col(idCol).as("cid"), col(vecCol).as("c_vec"))
      .filter(pmod(col("cid"), lit(stride)) === 0)
      .orderBy(col("cid"))
      .limit(k)
  }

  /** Embedding width from the first row — bounded metadata read (one row of
    * one file), used when the caller does not pass the dimension. */
  def inferDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot infer embedding dim of '$vecCol': empty input"))

  /** IVF-style approximate top-k: a coarse quantizer of `nCells` centroid
    * vectors, every corpus vector assigned to its nearest centroid (one
    * broadcast pass), and each query probing its `nProbe` nearest cells.
    * Candidates = corpus of probed cells, exact re-rank. The
    * inverted-list shape: a 100 TB corpus is partitioned BY CELL on
    * disk, so a query reads nProbe/nCells of the data.
    *
    * @param trainedCentroids optional trained centroids (KMeans.fit
    *        output) replacing the default id-stride sample — must have
    *        exactly nCells vectors. Note the index assigns BOTH sides by
    *        cosine; KMeans trains by squared-L2, so fit on L2-normalized
    *        embeddings (where the two argmins coincide) for the cells to
    *        match the training. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      corpusRows: Option[Long] = None,
      trainedCentroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(trainedCentroids.forall(_.size == nCells),
      "ivfTopK: trainedCentroids must have exactly nCells vectors " +
        "(nProbe/nCells is the promised read fraction)")
    // deterministic coarse centroids: trained when provided, else an
    // id-stride sample (k-means stand-in). Collected to the driver —
    // bounded metadata (nCells × dim floats, like the LSH hyperplanes) —
    // so cell assignment compiles to a PROJECTION over literal centroid
    // arrays: no crossJoin, no window, no Exchange. The stride needs
    // |corpus|: pass `corpusRows` when known to skip the count job.
    val centroidSeqs = centroidsOf(corpus, vecCol, idCol, nCells, corpusRows, trainedCentroids)

    val corpusCells = assignCells(corpus, centroidSeqs, vecCol, idCol, "neighbor", 1)
    val queryCells = assignCells(queries, centroidSeqs, vecCol, idCol, "query", nProbe)
    // (query, neighbor) pairs are distinct BY CONSTRUCTION: each corpus
    // vector lives in exactly one cell (keep=1) and a query's probed cells
    // are distinct — no dedup pass needed before the rank
    val cand = queryCells.join(corpusCells, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("query_vec"), col("neighbor_vec")), 6).as("c_r"))
    rankTopK(cand, k)
  }

  /** Coarse-quantizer centroids as driver-side literals: trained when
    * provided, else the deterministic id-stride sample. Bounded metadata
    * (nCells × dim floats) — the same budget as the LSH hyperplanes. */
  private[llm] def centroidsOf(
      corpus: DataFrame, vecCol: String, idCol: String, nCells: Int,
      corpusRows: Option[Long],
      trainedCentroids: Option[Seq[Seq[Double]]]): Seq[(Long, Seq[Float])] =
    trainedCentroids match {
      case Some(cs) => cs.zipWithIndex.map { case (c, j) => (j.toLong, c.map(_.toFloat)) }
      case None =>
        strideCentroids(corpus, vecCol, idCol, nCells, corpusRows)
          .collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
    }

  /** Nearest-`keep` cell assignment as a ZERO-SHUFFLE projection through
    * the native [[graft.functions.VectorFunctions.nearestCentroids]]
    * kernel — one fused codegen'd loop per row at CONSTANT plan size in
    * nCells. The former Column form (`array` of nCells candidate structs
    * + `array_min` / `array_sort`+`slice`) put O(nCells) expression nodes
    * in the plan: invisible at the 16-cell gates, the measured plan-size
    * bomb at a production 4k-64k-cell coarse quantizer (KMeans.assign:
    * 46 s interpreted → 0.9 s native at k=160). The kernel's arithmetic
    * and (nd, cid) tie-break mirror the struct form bit-for-bit
    * (SimilaritySpec pins the equivalence), so assignments — and every
    * pinned IVF-family oracle — are unchanged. A null embedding now
    * fails loudly (lshSignature/KMeans policy; the struct form silently
    * assigned null vectors to the lowest cell id). */
  private[llm] def assignCells(
      df: DataFrame, cents: Seq[(Long, Seq[Float])],
      vecCol: String, idCol: String, role: String, keep: Int): DataFrame = {
    import graft.functions.VectorFunctions.nearestCentroids
    val sel = df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"))
    val v = col(s"${role}_vec")
    val near = when(v.isNull,
        raise_error(lit("assignCells: null embedding vector")))
      .otherwise(nearestCentroids(v, cents, keep))
    val cid =
      if (keep == 1) near.getItem(0)
      else explode(near)
    sel.withColumn("cid", cid)
  }

  /** Approximate top-k: candidates = corpus vectors sharing at least one
    * signature chunk with the query (bucket join on (chunk, key) — the
    * shuffle is on hash-valued keys, no skew), then exact cosine re-rank.
    * Recall is tunable via nPlanes/nChunks; measured in SimilaritySpec. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nPlanes: Int = 16, nChunks: Int = 4, seed: Long = 42L,
      dim: Option[Int] = None): DataFrame = {
    require(nPlanes % nChunks == 0)
    val bitsPerChunk = nPlanes / nChunks
    val planes = hyperplanes(nPlanes, dim.getOrElse(inferDim(corpus, vecCol)), seed)

    def chunked(df: DataFrame, role: String): DataFrame = {
      val sig = lshSignature(col(vecCol), planes)
      df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"),
        sig.as("sig"))
        .select(col(s"${role}_id"), col(s"${role}_vec"),
          explode(array((0 until nChunks).map { c =>
            struct(lit(c).as("chunk"),
              shiftright(col("sig"), c * bitsPerChunk)
                .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("key"))
          }: _*)).as("ck"))
        .select(col(s"${role}_id"), col(s"${role}_vec"), col("ck.chunk"), col("ck.key"))
    }

    val qc = chunked(queries, "query")
    val cc = chunked(corpus, "neighbor")
    val cand = qc.join(cc, Seq("chunk", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // a pair colliding in several chunks must not occupy several top-k
      // slots — dedup before the bounded rank
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("query_vec"), col("neighbor_vec")), 6).as("c_r"))
    rankTopK(cand, k)
  }

  /** Int8 scalar quantization (SQ8): each vector becomes `dim` int8
    * codes + its code norm — a 4× memory shrink over float32 with ~no
    * recall loss at the near-dup operating point (the standard serving
    * compression one notch lighter than PQ's 32×).
    *
    * code_i = round(127·v_i / max|v|). Cosine is SCALE-INVARIANT, so the
    * per-vector scale cancels and ranking needs only the codes: cos ≈
    * intdot(cq, cd) / (‖cq‖·‖cd‖). The dot is the exact-integer
    * [[graft.functions.VectorFunctions.intVecDot]] kernel (fused codegen
    * loop, LONG accumulate — associative, no float-order sensitivity);
    * only the final normalize is floating point. Encode once at index
    * time; the norm is stored, never recomputed per pair. */
  def sqEncode(df: DataFrame, vecCol: String, idCol: String,
               role: String = "neighbor"): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x)))
    val codes = when(maxAbs > 0,
        transform(v, x => round(x * lit(127.0) / maxAbs).cast("int")))
      .otherwise(transform(v, x => lit(0)))
    df.select(col(idCol).as(s"${role}_id"), codes.as(s"${role}_codes"))
      .withColumn(s"${role}_norm",
        sqrt(graft.functions.VectorFunctions
          .intVecDot(col(s"${role}_codes"), col(s"${role}_codes"))
          .cast("double")))
  }

  /** Top-k over the SQ8 codes: broadcast the encoded queries, scan the
    * encoded corpus once (codes + norm only — the float vectors are
    * never read at query time), rank via the bounded top-k aggregate.
    * Same scale shape as [[bruteForceTopK]] with 4× less data moved. */
  def sqTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.intVecDot
    val c = sqEncode(corpus, vecCol, idCol, "neighbor")
    val q = sqEncode(queries, vecCol, idCol, "query")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .filter(col("query_norm") > 0 && col("neighbor_norm") > 0)
      .select(col("query_id"), col("neighbor_id"),
        round(intVecDot(col("query_codes"), col("neighbor_codes"))
          .cast("double") / (col("query_norm") * col("neighbor_norm")), 6)
          .as("c_r"))
    rankTopK(scored, k)
  }

  /** Hard-negative mining — the training-pair step after dedup: for
    * each query, the MOST similar corpus items that are NOT duplicates
    * (cosine below `dupThreshold`), ranked hardest-first. These are the
    * negatives that actually move a contrastive loss; random negatives
    * ([[Sampling.negativeSample]]) are trivially easy by comparison,
    * and near-duplicates would be false negatives (they're really
    * positives). Exclusion happens BEFORE the bounded top-k, so
    * duplicates never occupy slots.
    *
    * This form scores brute-force (queries broadcast, corpus scanned
    * once — the exact baseline); at corpus scale generate candidates
    * with [[IvfPq.topKRerank]] at k·margin and apply the same
    * dupThreshold filter to its exact reranked cosines. */
  def hardNegatives(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      dupThreshold: Double = 0.95): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("c_r"))
      .filter(col("c_r") < dupThreshold)
    rankTopK(scored, k)
  }

  /** Per-group mean embedding (centroid) in EXACT fixed point — the
    * pooling step behind domain/cluster semantic profiles, per-source
    * diversity audits, and warm-starting a quantizer's codebook. Each
    * float component is scaled to a 10^6-fixed-point BIGINT before
    * aggregation, so the sum (and the integer-division mean) is exact
    * and ORDER-INDEPENDENT — float sums would differ run-to-run with
    * partitioning (non-associative) and could never hash-match a SQL
    * oracle.
    *
    * Shape: posexplode (dim rows per vector) + one hash aggregate on
    * (group, pos) — map-side combinable, #groups × dim result rows, no
    * window, no driver data. Returns long-form rows (group, pos,
    * mean_scaled, n); pivot to arrays with collect_list over a
    * (group)-window only when a consumer needs the vector form. */
  def groupCentroids(df: DataFrame, vecCol: String, groupCol: String,
                     scale: Long = 1000000L): DataFrame = {
    require(scale > 0, "groupCentroids: scale must be positive")
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(groupCol), col("pos").cast("long").as("pos"),
        round(col("v").cast("double") * scale).cast("long").as("sv"))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum(col("sv")).as("sum_scaled"), count(lit(1)).as("n"))
      .select(col(groupCol), col("pos"),
        expr("sum_scaled div n").as("mean_scaled"), col("n"))
  }
}
