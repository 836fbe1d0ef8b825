package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.floatVecDot

/** Deterministic Lloyd's k-means over an `array<float>` embedding column
  * — the trained coarse quantizer an IVF index wants (Similarity.ivfTopK
  * ships with a stride-sample stand-in; `fit` here produces real
  * centroids with the same deterministic contract).
  *
  * Determinism is designed in, not hoped for:
  *  - init = id-stride sample (partitioning-independent, like ivfTopK);
  *  - a FIXED iteration count, no convergence test;
  *  - centroids are rounded to 6 decimals after every update, so the
  *    cross-partition FP summation order of the mean (the one
  *    nondeterministic ingredient) cannot leak into assignments —
  *    ulp-scale noise is quashed three orders of magnitude below the
  *    rounding step.
  *
  * Scale shape: each iteration is one broadcast-literal assignment pass
  * (k×dim doubles to every task — bounded metadata, like the LSH
  * hyperplanes) plus one posexplode + (cid, dim) average — map-side
  * combinable, shuffle rows = k×dim, driver traffic = k×dim doubles.
  * Nothing driver-side grows with the corpus.
  */
object KMeans {

  /** Squared-L2 argmin assignment against literal centroids: per row,
    * array(struct(dist2, cid)) → array_min (ties take the lower cid).
    * A ragged or NULL vector fails loudly: FloatVecDot silently truncates
    * to the shorter input, which would corrupt assignments AND the
    * per-dimension means with no error (same loud-failure policy as
    * Similarity.lshSignature). */
  private def nearest(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dim = centroids.head.size
    centroids.foreach(c =>
      require(c.size == dim, "KMeans: centroids must share one dimension"))
    // One fused argmin loop via the NearestCodewords kernel with a single
    // subspace (m=1): bit-identical arithmetic and tie rule to the former
    // k-wide array_min-over-structs Column tree, but CONSTANT plan size.
    // The Column form scaled its expression tree with k — at the k ∝ n
    // SemDeDup discipline (10⁴+ cells) codegen collapsed and assignment
    // went interpreted (measured 46 s for k=160 over 20k vectors before
    // this change, ~1 s after). The kernel throws on a ragged vector; the
    // null guard stays loud here.
    when(vec.isNull, raise_error(lit("KMeans: null embedding vector")))
      .otherwise(element_at(
        graft.functions.VectorFunctions.nearestCodewords(vec, Seq(centroids)), 1))
  }

  /** Add a `cid` cluster-assignment column for the given centroids. */
  def assign(corpus: DataFrame, vecCol: String,
             centroids: Seq[Seq[Double]]): DataFrame =
    corpus.withColumn("cid", nearest(col(vecCol), centroids))

  /** Train k centroids with `iters` Lloyd iterations. Empty clusters
    * keep their previous centroid. Returns the k centroid vectors.
    * `init` overrides the default deterministic id-stride seed — pass
    * [[hashSampleInit]] when ids carry structure the stride would bias
    * toward (the IvfIndex.retrain lesson: an even-id/odd-id corpus
    * split makes every stride-of-even-length pick land on one side). */
  def fit(corpus: DataFrame, vecCol: String, idCol: String,
          k: Int, iters: Int = 5,
          corpusRows: Option[Long] = None,
          init: Option[Seq[Seq[Double]]] = None): Seq[Seq[Double]] = {
    require(k > 0 && iters > 0)
    // shared with ivfTopK's default quantizer — one deterministic
    // (id-ordered) stride-sample definition for both
    var centroids: Seq[Seq[Double]] = init.getOrElse(Similarity
      .strideCentroids(corpus, vecCol, idCol, k, corpusRows)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
      .toSeq)

    (0 until iters).foreach { _ =>
      val means = assign(corpus.select(col(vecCol)), vecCol, centroids)
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        .toMap
      centroids = centroids.zipWithIndex.map { case (prev, j) =>
        means.get(j)
          .map(_.map(x => math.rint(x * 1e6) / 1e6)) // quash FP-order ulps
          .getOrElse(prev)
      }
    }
    centroids
  }

  /** Deterministic structure-free k-seed: the k vectors whose ids sort
    * first under xxhash64 — id-distribution-independent, unlike the
    * stride sample (which inherits any arithmetic pattern in the ids). */
  def hashSampleInit(corpus: DataFrame, vecCol: String, idCol: String,
                     k: Int): Seq[Seq[Double]] =
    corpus.select(col(idCol).as("cid"), col(vecCol).as("c_vec"))
      .orderBy(xxhash64(col("cid")), col("cid"))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq)
      .toSeq
}
