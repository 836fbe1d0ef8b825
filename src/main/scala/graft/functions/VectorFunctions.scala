package graft.functions

import org.apache.spark.sql.Column

/** Public forwarder for the native vector kernels (see
  * org.apache.spark.sql.graft.VectorExpressions for the Catalyst side). */
object VectorFunctions {
  def floatVecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.floatVecDot(a, b)

  def intVecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.intVecDot(a, b)

  def simhashBits(tokenHashes: Column, bits: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.simhashBits(tokenHashes, bits)

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.sortedLongIntersectCount(a, b)

  def minHashSig(hashes: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    org.apache.spark.sql.graft.VectorExpressions.minHashSig(hashes, a, b, p)

  def boundedTopK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.TopKAggregate.boundedTopK(score, id, k)

  def boundedTopKLong(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.TopKAggregate.boundedTopKLong(score, id, k)

  def bloomMightContainLong(bloom: org.apache.spark.util.sketch.BloomFilter,
                            value: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.bloomMightContainLong(bloom, value)

  def nearestCodewords(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.graft.VectorExpressions.nearestCodewords(vec, books)

  def nearestCentroids(vec: Column, cents: Seq[(Long, Seq[Float])], keep: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.nearestCentroids(vec, cents, keep)

  def adcLut(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    org.apache.spark.sql.graft.VectorExpressions.adcLut(vec, books)

  def adcScore(codes: Column, lut: Column, k: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.adcScore(codes, lut, k)
}
