// Custom Catalyst expressions live under org.apache.spark.sql.* because the
// expression-authoring surface (AbstractDataType, ExpressionUtils.column)
// is private[sql] — the standard pattern for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Dot product of two `array<float>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY "built-in vs custom" preference (b)):
  * the composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and evaluates two lambda closures per
  * ROW; on an O(n²) pair-mining join that's billions of allocations.
  * This kernel is a single fused loop over the two `ArrayData` buffers
  * (no allocation, no virtual calls in the hot loop) and stays inside
  * WholeStageCodegen. Accumulation is left-to-right in DOUBLE — bit-for-
  * bit the same result as the HOF form, so oracles are unaffected.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** SimHash over a pre-hashed token array: bit i of the result is set iff
  * Σ_tokens (2·bit_i(h) − 1) > 0, over `bits` low bits of each hash.
  *
  * Native for the same reason as [[FloatVecDot]]: the HOF form keeps a
  * 60-element accumulator array and rebuilds it per token (zip_with
  * allocates); this kernel keeps the counters in a local int[] and loops —
  * identical integer semantics, so the DuckDB oracle is unaffected. */
case class SimHashBits(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](bits)
    var t = 0
    val n = hs.numElements()
    while (t < n) {
      val h = hs.getLong(t)
      var i = 0
      while (i < bits) {
        counters(i) += (((h >> i) & 1L).toInt << 1) - 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (counters(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("counters")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $c = new int[$bits];
         |int ${t}n = $a.numElements();
         |for (int $t = 0; $t < ${t}n; $t++) {
         |  long $h = $a.getLong($t);
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $c[$i] += ((int)(($h >> $i) & 1L) << 1) - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ($c[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** |a ∩ b| of two SORTED distinct `array<long>` columns via a single merge
  * walk — no per-row hash-set allocation.
  *
  * Native for the same reason as [[FloatVecDot]]: the built-in
  * `array_intersect`/`array_union` pair builds two hash sets and two result
  * arrays per ROW; on the pair-verify join of a near-dup miner that's the
  * entire profile. With both inputs sorted (sorted once per DOCUMENT, not
  * per pair), the count is one allocation-free loop, and jaccard follows as
  * inter / (|a| + |b| − inter) for distinct sets — identical values, so
  * oracles are unaffected. Inputs MUST be sorted ascending and distinct. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** All k minhash permutation minima in ONE pass over the shingle-hash
  * array: `out[j] = min_h (h·a(j) + b(j)) mod p`.
  *
  * Native for the same reason as [[FloatVecDot]]: the HOF form —
  * `array_min(transform(hs, ...))` per permutation — traverses the array
  * k times and allocates k intermediate arrays per DOCUMENT. This kernel
  * keeps the k running minima in a local long[] over a single traversal.
  * Identical integer semantics (same mins), so oracles are unaffected.
  * Empty input returns NULL, matching array_min's empty-array result so
  * downstream concat_ws band keys behave exactly as the HOF form. */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(a.length == b.length && a.nonEmpty, "MinHashSig: need matched a/b coefficients")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // empty arrays produce NULL even though the input itself is non-null
  override def nullable: Boolean = true

  private val k = a.length

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h = hs.getLong(t)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $in.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $t = 0; $t < $n; $t++) {
         |    long $h = $in.getLong($t);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object VectorExpressions {
  def floatVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhashBits(tokenHashes: Column, bits: Int): Column =
    ExpressionUtils.column(
      SimHashBits(ExpressionUtils.expression(tokenHashes), bits))

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedLongIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minHashSig(hashes: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(hashes), a, b, p))

  /** Spark's own codegen'd bloom probe (the expression AQE runtime
    * filters inject), driven by an explicitly-built sketch: probes
    * `mightContainLong(value)` against a BINARY literal of the
    * serialized `util.sketch.BloomFilter`. A Scala-UDF probe would box
    * every value and break whole-stage codegen exactly where the prune
    * is hottest (per exploded gram at 100 TB). */
  def bloomMightContainLong(bloom: org.apache.spark.util.sketch.BloomFilter,
                            value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bos.toByteArray),
        ExpressionUtils.expression(value)))
  }
}
