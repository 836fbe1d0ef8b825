package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.floatVecDot

/** Product quantization (Jégou et al. 2011) — the memory-bound ANN
  * serving shape that completes the similarity ladder (brute → LSH →
  * IVF → IVF-pruned index → PQ): the corpus keeps only m small codes
  * per vector (m bytes at k=256) instead of dim floats — a 32x shrink
  * for dim=64/m=8 — so a 100 TB float corpus becomes a few TB of codes
  * that fit hot storage, and scoring never touches the original vectors.
  *
  * Spark shape:
  *  - `fit`: joint Lloyd's over all m subspaces in ONE corpus pass per
  *    iteration (explode to (subspace, subvector), argmin against
  *    literal codebooks, per-(s, cid, dim) average) — collect traffic is
  *    m×k×dsub doubles = k×dim per iteration, independent of corpus
  *    size. Same determinism devices as [[KMeans]]: id-stride init,
  *    fixed iterations, 6-decimal centroid rounding.
  *  - `encode`: one projection — m argmins per vector + the
  *    reconstruction norm (exact for the RECONSTRUCTION because
  *    subspaces are orthogonal: ||x̂||² = Σ_s ||c_s||²), stored with the
  *    codes like any serious PQ index.
  *  - `topK`: asymmetric-distance (ADC) scoring — per query ONE
  *    projection builds the m×k lookup table of subspace dot products
  *    (the native AdcLut kernel, constant plan size in m·k); per
  *    (query, doc) the approximate dot is m table lookups (the native
  *    AdcScore kernel), not dim multiplies. Approximate
  *    cosine = Σ lut[s][code_s] / (|q|·||x̂||), ranked by the shared
  *    BoundedTopK aggregate — map-side partials, no rank window, zero
  *    shuffle beyond the bounded top-k merge.
  *
  * Assignment is the native [[graft.functions.VectorExpressions
  * NearestCodewords]] kernel — one fused codegen'd triple loop per row
  * covering every subspace, constant plan size at ANY codebook size
  * (k=256 production codebooks included); its arithmetic mirrors the
  * array_min-over-candidate-structs Column form bit-for-bit (PqSpec
  * pins the equivalence against a driver-side argmin).
  */
object Pq {

  private def nearestCodes(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.VectorFunctions.nearestCodewords(vec, books)

  /** Loud dimension guard (policy of KMeans/lshSignature: silent
    * truncation corrupts assignments with no error). */
  private def guarded(vec: Column, dim: Int, what: String, inner: Column): Column =
    when(vec.isNull, raise_error(lit(s"Pq.$what: null embedding vector")))
      .when(size(vec) === dim, inner)
      .otherwise(raise_error(concat(
        lit(s"Pq.$what: expected $dim-dim vector, got "), size(vec).cast("string"))))

  /** Train m codebooks of k codewords each; returns books(s)(j) =
    * the j-th codeword of subspace s (dsub doubles). */
  def fit(corpus: DataFrame, vecCol: String, idCol: String,
          m: Int = 8, k: Int = 16, iters: Int = 3,
          corpusRows: Option[Long] = None): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && k > 0 && iters > 0)
    val dim = Similarity.inferDim(corpus, vecCol)
    require(dim % m == 0, s"Pq.fit: dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val init = Similarity.strideCentroids(corpus, vecCol, idCol, k, corpusRows)
      .collect().map(_.getSeq[Float](1).map(_.toDouble))
    require(init.nonEmpty, "Pq.fit: empty corpus")
    // a corpus smaller than k seeds fewer codewords — clamp k rather than
    // index past the init sample in the rebuild below
    val kEff = init.length
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map(s =>
      init.toSeq.map(v => v.slice(s * dsub, (s + 1) * dsub).toSeq))
    (0 until iters).foreach { _ =>
      // one corpus pass covers every subspace: the native kernel emits all
      // m codes per row; (subspace, dim-in-subspace) derive from the
      // flat posexplode position
      val means = corpus
        .select(guarded(col(vecCol), dim, "fit",
            nearestCodes(col(vecCol), books)).as("codes"),
          posexplode(col(vecCol)).as(Seq("i", "x")))
        .select((col("i") / dsub).cast("int").as("s"),
          pmod(col("i"), lit(dsub)).cast("int").as("d"),
          element_at(col("codes"), (col("i") / dsub).cast("int") + 1).as("cid"),
          col("x"))
        .groupBy("s", "cid", "d").agg(avg(col("x")).as("mn"))
        .collect() // bounded: m×k×dsub = k×dim rows
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
        .toMap
      books = (0 until m).map(s => (0 until kEff).map(j => (0 until dsub).map(d =>
        // empty codes keep their previous codeword; round like KMeans so
        // partial-agg summation order cannot leak into assignments
        means.get((s, j, d)).map(x => math.rint(x * 1e6) / 1e6)
          .getOrElse(books(s)(j)(d)))))
    }
    books
  }

  /** Encode the corpus: (id, codes array<int> of length m, recon_normsq).
    * One projection; this is the table a PQ index persists. */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
             books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.size
    val dsub = books.head.head.size
    val dim = m * dsub
    val normSqLut = books.map(book => book.map(c => c.map(x => x * x).sum))
    corpus.select(col(idCol).as("id"),
        guarded(col(vecCol), dim, "encode", nearestCodes(col(vecCol), books)).as("codes"))
      .withColumn("recon_normsq", (0 until m).map(s =>
        element_at(typedLit(normSqLut(s)), element_at(col("codes"), s + 1) + 1))
        .reduce(_ + _))
  }

  /** ADC top-k: approximate cosine from codes only (the corpus vectors
    * are never read). Ranking contract matches the other ANN paths:
    * rounded score, id tie-break, BoundedTopK.
    *
    * Both ADC halves are native kernels at CONSTANT plan size in m·k:
    * the per-query table build is [[graft.functions.VectorFunctions
    * adcLut]] (the former m×k-node literal-dot array collapsed codegen
    * at a production m=16/k=256 codebook) and the per-pair m-lookup sum
    * is `adcScore` (replacing a zip_with+aggregate lambda dispatch on
    * the innermost serving loop). Arithmetic is bit-identical to the
    * HOF forms — PqSpec pins the equivalence. */
  def topK(codes: DataFrame, books: Seq[Seq[Seq[Double]]],
           queries: DataFrame, vecCol: String, idCol: String,
           k: Int): DataFrame = {
    import graft.functions.VectorFunctions.{adcLut, adcScore}
    val m = books.size
    val kCw = books.head.size
    val dsub = books.head.head.size
    val dim = m * dsub
    val q = queries.select(col(idCol).as("query_id"),
      guarded(col(vecCol), dim, "topK", adcLut(col(vecCol), books)).as("lut"),
      sqrt(floatVecDot(col(vecCol), col(vecCol))).as("q_norm"))
    val scored = codes.join(broadcast(q), col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(
          adcScore(col("codes"), col("lut"), kCw)
            / (col("q_norm") * sqrt(col("recon_normsq"))), 6).as("c_r"))
    Similarity.rankTopK(scored, k)
  }
}
