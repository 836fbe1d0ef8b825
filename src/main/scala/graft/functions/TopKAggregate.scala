// Custom Catalyst aggregate lives under org.apache.spark.sql.* because the
// expression-authoring surface (AbstractDataType, ExpressionUtils.column)
// is private[sql] — the standard pattern for third-party native expressions.
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs in a size-k
  * heap — "best" = higher score, ties broken by LOWER id (the deterministic
  * contract every ANN ranker in this engine uses).
  *
  * Why a custom aggregate (SURVEY "built-in vs custom" preference (b)):
  * the `row_number() OVER (PARTITION BY query)` form shuffles ALL n corpus
  * scores of a query to one reducer before discarding all but k — the
  * single-reducer stage that caps brute-force ANN at one machine's sort
  * rate. As a TypedImperativeAggregate this runs inside ObjectHashAggregate
  * with map-side partial aggregation: each task keeps ≤ k entries per
  * query, the shuffle carries ≤ k × tasks rows per query, and the final
  * merge is a k-way heap merge. Same output, no full-score shuffle.
  *
  * Evaluates to `array<struct<id, score>>` sorted best-first (posexplode
  * for a 1-based rank). NULL scores/ids are skipped, matching row_number
  * over a window that NULL rows cannot win.
  */
case class BoundedTopK(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ExpectsInputTypes {

  require(k > 0, "BoundedTopK: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_top_k"

  /** Max-heap ordering where the TOP element is the WORST kept entry
    * (lowest score; among equals, highest id) — O(log k) insert-evict. */
  private val worstOnTop: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstOnTop)

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstOnTop.compare(e, buf.head) < 0) { // e beats the kept worst
      buf.dequeue(); buf.enqueue(e)
    }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by worstOnTop = best entry first (its "least" is the best)
    val sorted = buf.toArray.sorted(worstOnTop)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))
}

/** [[BoundedTopK]] with an exact LONG score: for fixed-point integer
  * scoring (TF-IDF), where routing through the double-typed heap would
  * silently round scores past 2^53 and make near-ties rank
  * nondeterministically. Same bounded-heap shape, same tie contract
  * (higher score, then LOWER id). */
case class BoundedTopKLong(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with ExpectsInputTypes {

  require(k > 0, "BoundedTopKLong: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_top_k_long"

  private val worstOnTop: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(x: (Long, Long), y: (Long, Long)): Int = {
      val c = java.lang.Long.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](worstOnTop)

  private def offer(
      buf: mutable.PriorityQueue[(Long, Long)], e: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstOnTop.compare(e, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(e)
    }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sorted(worstOnTop)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readLong(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKLong =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggregate {
  /** `array<struct<id, score>>` of the k best (score desc, id asc) pairs. */
  def boundedTopK(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      BoundedTopK(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())

  /** Long-score variant: exact at any magnitude (no 2^53 rounding). */
  def boundedTopKLong(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      BoundedTopKLong(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}
