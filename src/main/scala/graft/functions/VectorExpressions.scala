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

/** Dot product of two `array<int>` columns (int8-quantized codes ride in
  * int arrays) accumulated in LONG — exact integer arithmetic, so scores
  * are associative and engine-portable. Native for the same reason as
  * [[FloatVecDot]]: a fused no-allocation loop inside WholeStageCodegen
  * on the ANN serving hot path. */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
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
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
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

/** All-subspace product-quantization assignment: for an `array<float>`
  * vector of dim = m·dsub, the squared-L2 argmin codeword per subspace
  * against codebooks baked into the expression — returns `array<int>`
  * of length m.
  *
  * Native for the same reason as [[FloatVecDot]], but structural: the
  * Column form is an `array_min` over k candidate structs PER subspace
  * (m·k struct builders in the plan) — fine at k=16, hopeless at a
  * production k=256 codebook (4096 expression nodes and no codegen
  * fusion). This kernel is one fused triple loop, O(m·k·dsub) flops per
  * row with zero allocation beyond the m-int result.
  *
  * Arithmetic mirrors the HOF form EXACTLY so assignments are
  * bit-identical and pinned oracles cannot shift: per codeword
  * `d2 = Σx² − 2.0·Σx·c_f + Σc²`, where Σx² and Σx·c_f accumulate
  * left-to-right in double over float operands (the FloatVecDot
  * contract), c_f is the codeword cast to float, and Σc² is summed in
  * double from the unrounded codebook. Ties keep the lower codeword
  * index (array_min's struct order). A ragged vector fails loudly
  * (KMeans/lshSignature policy). */
case class NearestCodewords(
    child: Expression,
    booksFlat: Array[Float], // [s][j][d] flattened, m·k·dsub
    c2Flat: Array[Double],   // [s][j] flattened, m·k
    m: Int, k: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(booksFlat.length == m * k * dsub && c2Flat.length == m * k,
    "NearestCodewords: codebook shape mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_codewords"

  private def dimCheck(n: Int): Unit =
    if (n != m * dsub) throw new IllegalArgumentException(
      s"nearest_codewords: expected ${m * dsub}-dim vector, got $n")

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    dimCheck(v.numElements())
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var dss = 0.0
      var d = 0
      while (d < dsub) {
        val x = v.getFloat(s * dsub + d).toDouble
        dss += x * x
        d += 1
      }
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < k) {
        var dsc = 0.0
        val base = (s * k + j) * dsub
        var t = 0
        while (t < dsub) {
          dsc += v.getFloat(s * dsub + t).toDouble * booksFlat(base + t).toDouble
          t += 1
        }
        val dist = dss - 2.0 * dsc + c2Flat(s * k + j)
        if (dist < best) { best = dist; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("booksFlat", booksFlat, "float[]")
    val c2Ref = ctx.addReferenceObj("c2Flat", c2Flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val dss = ctx.freshName("dss")
      val dsc = ctx.freshName("dsc")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val base = ctx.freshName("base")
      val x = ctx.freshName("x")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "nearest_codewords: expected ${m * dsub}-dim vector, got " + $v.numElements());
         |}
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $dss = 0.0;
         |  for (int $d = 0; $d < $dsub; $d++) {
         |    double $x = (double) $v.getFloat($s * $dsub + $d);
         |    $dss += $x * $x;
         |  }
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dsc = 0.0;
         |    int $base = ($s * $k + $j) * $dsub;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      $dsc += (double) $v.getFloat($s * $dsub + $t) * (double) $booksRef[$base + $t];
         |    }
         |    double $dist = $dss - 2.0 * $dsc + $c2Ref[$s * $k + $j];
         |    if ($dist < $best) { $best = $dist; $bestJ = $j; }
         |  }
         |  $out[$s] = $bestJ;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCodewords =
    copy(child = newChild)
}

/** Nearest-`keep` coarse cells by COSINE against centroids baked into the
  * expression — returns `array<long>` of the `min(keep, nCells)` nearest
  * cell ids, nearest first.
  *
  * Native for the same structural reason as [[NearestCodewords]]: the
  * Column form — `array(nCells × struct(0.0 − cos, cid))` + `array_min` /
  * `array_sort`+`slice` — puts O(nCells) expression nodes in the PLAN.
  * Fine at the 16-cell gates; at a production 4k-64k-cell coarse
  * quantizer it is the measured plan-size bomb (k=160 k-means assign:
  * 46 s interpreted → 0.9 s once native). This kernel is one fused loop,
  * O(nCells·dim) flops per row at CONSTANT plan size, holding a bounded
  * keep-slot insertion buffer.
  *
  * Arithmetic mirrors the candidate-struct Column form EXACTLY so cell
  * assignments are bit-identical and pinned oracles cannot shift:
  * `nd_j = 0.0 − dot(v,c_j) / (‖v‖·‖c_j‖)` with every dot accumulated
  * left-to-right in double over float operands (the FloatVecDot
  * contract) and ‖c_j‖ precomputed the same way from the float centroid;
  * ordering is (nd asc, cid asc) under Spark's double semantics
  * (`x == y ? 0 : Double.compare` — NaN sorts last, −0.0 equals 0.0), so
  * a zero-norm vector (all-NaN scores) falls to ascending-cid order just
  * as `array_sort` over the structs did. A ragged vector fails loudly
  * (KMeans/lshSignature policy; the array form silently truncated to the
  * shorter length). */
case class NearestCentroids(
    child: Expression,
    centsFlat: Array[Float],  // nCells × dim row-major
    cNorms: Array[Double],    // ‖c_j‖, precomputed with FloatVecDot order
    cids: Array[Long],
    nCells: Int, dim: Int, keep: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(nCells > 0 && keep > 0 && dim > 0, "NearestCentroids: empty shape")
  require(centsFlat.length == nCells * dim && cNorms.length == nCells &&
    cids.length == nCells, "NearestCentroids: centroid shape mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private val kk = math.min(keep, nCells)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"nearest_centroids: expected $dim-dim vector, got ${v.numElements()}")
    var vv = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      vv += x * x
      i += 1
    }
    val vnorm = math.sqrt(vv)
    val bnd = new Array[Double](kk)
    val bid = new Array[Long](kk)
    var cnt = 0
    var j = 0
    while (j < nCells) {
      var dot = 0.0
      val base = j * dim
      var d = 0
      while (d < dim) {
        dot += v.getFloat(d).toDouble * centsFlat(base + d).toDouble
        d += 1
      }
      val nd = 0.0 - dot / (vnorm * cNorms(j))
      val cid = cids(j)
      // insertion position under (nd asc, cid asc), Spark double order
      var p = cnt
      while (p > 0 && {
        val c = if (nd == bnd(p - 1)) 0 else java.lang.Double.compare(nd, bnd(p - 1))
        c < 0 || (c == 0 && cid < bid(p - 1))
      }) p -= 1
      if (p < kk) {
        val last = math.min(cnt, kk - 1)
        var q = last
        while (q > p) { bnd(q) = bnd(q - 1); bid(q) = bid(q - 1); q -= 1 }
        bnd(p) = nd
        bid(p) = cid
        if (cnt < kk) cnt += 1
      }
      j += 1
    }
    val out = new Array[Long](cnt)
    System.arraycopy(bid, 0, out, 0, cnt)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centsFlat", centsFlat, "float[]")
    val cNormsRef = ctx.addReferenceObj("cNorms", cNorms, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val vv = ctx.freshName("vv")
      val vnorm = ctx.freshName("vnorm")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val nd = ctx.freshName("nd")
      val cid = ctx.freshName("cid")
      val bnd = ctx.freshName("bnd")
      val bid = ctx.freshName("bid")
      val cnt = ctx.freshName("cnt")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val c = ctx.freshName("c")
      val last = ctx.freshName("last")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroids: expected $dim-dim vector, got " + $v.numElements());
         |}
         |double $vv = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double $x = (double) $v.getFloat($i);
         |  $vv += $x * $x;
         |}
         |double $vnorm = java.lang.Math.sqrt($vv);
         |double[] $bnd = new double[$kk];
         |long[] $bid = new long[$kk];
         |int $cnt = 0;
         |for (int $j = 0; $j < $nCells; $j++) {
         |  double $dot = 0.0;
         |  int $base = $j * $dim;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    $dot += (double) $v.getFloat($d) * (double) $centsRef[$base + $d];
         |  }
         |  double $nd = 0.0 - $dot / ($vnorm * $cNormsRef[$j]);
         |  long $cid = $cidsRef[$j];
         |  int $p = $cnt;
         |  while ($p > 0) {
         |    int $c = ($nd == $bnd[$p - 1]) ? 0 : java.lang.Double.compare($nd, $bnd[$p - 1]);
         |    if ($c < 0 || ($c == 0 && $cid < $bid[$p - 1])) { $p--; } else { break; }
         |  }
         |  if ($p < $kk) {
         |    int $last = java.lang.Math.min($cnt, $kk - 1);
         |    for (int $q = $last; $q > $p; $q--) { $bnd[$q] = $bnd[$q - 1]; $bid[$q] = $bid[$q - 1]; }
         |    $bnd[$p] = $nd;
         |    $bid[$p] = $cid;
         |    if ($cnt < $kk) $cnt++;
         |  }
         |}
         |long[] $out = new long[$cnt];
         |System.arraycopy($bid, 0, $out, 0, $cnt);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Per-query ADC lookup-table build: for an `array<float>` query of
  * dim = m·dsub, returns the FLAT `array<double>` of length m·k where
  * `lut[s·k + j] = dot(q_sub_s, w_sj)` against codebooks baked into the
  * expression.
  *
  * Native for the same structural reason as [[NearestCodewords]]: the
  * Column form — `array(m × array(k × floatVecDot(slice(q), lit(w))))` —
  * puts O(m·k) expression nodes in the PLAN (128 at the gate m=8/k=16,
  * 4096 at a production m=16/k=256, where codegen collapses). This
  * kernel is one fused triple loop at CONSTANT plan size, O(m·k·dsub)
  * flops per QUERY row (not per pair).
  *
  * Arithmetic mirrors the Column form bit-for-bit: each entry
  * accumulates left-to-right in double over float operands (the
  * FloatVecDot contract over the float-cast codeword), so ADC scores —
  * and the pinned `ann_topk_pq`/`ann_topk_ivfpq` oracles — cannot
  * shift. A ragged query fails loudly. */
case class AdcLut(
    child: Expression,
    booksFlat: Array[Float], // [s][j][d] flattened, m·k·dsub
    m: Int, k: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(booksFlat.length == m * k * dsub, "AdcLut: codebook shape mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "adc_lut"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * dsub) throw new IllegalArgumentException(
      s"adc_lut: expected ${m * dsub}-dim vector, got ${v.numElements()}")
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        var dot = 0.0
        val base = (s * k + j) * dsub
        var d = 0
        while (d < dsub) {
          dot += v.getFloat(s * dsub + d).toDouble * booksFlat(base + d).toDouble
          d += 1
        }
        out(s * k + j) = dot
        j += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("booksFlat", booksFlat, "float[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "adc_lut: expected ${m * dsub}-dim vector, got " + $v.numElements());
         |}
         |double[] $out = new double[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    int $base = ($s * $k + $j) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $dot += (double) $v.getFloat($s * $dsub + $d) * (double) $booksRef[$base + $d];
         |    }
         |    $out[$s * $k + $j] = $dot;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcLut =
    copy(child = newChild)
}

/** ADC score: `Σ_s lut[s·k + codes[s]]` — the per-pair m-table-lookup
  * half of asymmetric-distance scoring, over [[AdcLut]]'s flat table.
  *
  * Native to pair with [[AdcLut]]: the HOF form
  * (`aggregate(zip_with(codes, lut, (c, l) => element_at(l, c + 1)), …)`)
  * allocates a zipped struct array and dispatches two lambdas per PAIR —
  * this is the innermost loop of ADC serving, m adds per (query, doc)
  * candidate. Accumulation is left-to-right in double from 0.0, exactly
  * the aggregate's fold order, so scores are bit-identical. An
  * out-of-range code fails loudly (the ANSI element_at contract the HOF
  * form had). */
case class AdcScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0
    var acc = 0.0
    while (s < m) {
      val c = codes.getInt(s)
      val idx = s * k + c
      if (c < 0 || c >= k || idx >= lut.numElements())
        throw new IllegalArgumentException(
          s"adc_score: code $c out of range [0, $k) at subspace $s")
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $c = $a.getInt($s);
         |  int $idx = $s * $k + $c;
         |  if ($c < 0 || $c >= $k || $idx >= $b.numElements()) {
         |    throw new IllegalArgumentException(
         |      "adc_score: code " + $c + " out of range [0, $k) at subspace " + $s);
         |  }
         |  $acc += $b.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def floatVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def intVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntVecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simhashBits(tokenHashes: Column, bits: Int): Column =
    ExpressionUtils.column(
      SimHashBits(ExpressionUtils.expression(tokenHashes), bits))

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedLongIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minHashSig(hashes: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(hashes), a, b, p))

  /** All-subspace PQ assignment over codebooks books(s)(j) (dsub doubles
    * each); see [[NearestCodewords]]. */
  def nearestCodewords(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val k = books.head.size
    val dsub = books.head.head.size
    require(books.forall(b => b.size == k && b.forall(_.size == dsub)),
      "nearestCodewords: ragged codebooks")
    val flat = books.flatMap(_.flatMap(_.map(_.toFloat))).toArray
    val c2 = books.flatMap(_.map(c => c.map(x => x * x).sum)).toArray
    ExpressionUtils.column(
      NearestCodewords(ExpressionUtils.expression(vec), flat, c2, m, k, dsub))
  }

  /** Flat ADC lookup table for a query vector over codebooks
    * books(s)(j); see [[AdcLut]]. */
  def adcLut(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val k = books.head.size
    val dsub = books.head.head.size
    require(books.forall(b => b.size == k && b.forall(_.size == dsub)),
      "adcLut: ragged codebooks")
    val flat = books.flatMap(_.flatMap(_.map(_.toFloat))).toArray
    ExpressionUtils.column(AdcLut(ExpressionUtils.expression(vec), flat, m, k, dsub))
  }

  /** Σ_s lut[s·k + codes[s]] over [[adcLut]]'s flat table; see
    * [[AdcScore]]. */
  def adcScore(codes: Column, lut: Column, k: Int): Column =
    ExpressionUtils.column(AdcScore(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), k))

  /** Nearest-`keep` cosine cells against literal `(cid, centroid)` pairs;
    * see [[NearestCentroids]]. `cNorms` are precomputed here with the
    * exact FloatVecDot accumulation order so results stay bit-identical
    * to the former candidate-struct Column form. */
  def nearestCentroids(vec: Column, cents: Seq[(Long, Seq[Float])], keep: Int): Column = {
    require(cents.nonEmpty, "nearestCentroids: no centroids")
    val dim = cents.head._2.size
    require(cents.forall(_._2.size == dim), "nearestCentroids: ragged centroids")
    val flat = new Array[Float](cents.size * dim)
    val norms = new Array[Double](cents.size)
    val ids = new Array[Long](cents.size)
    cents.zipWithIndex.foreach { case ((cid, c), j) =>
      var s = 0.0
      var d = 0
      while (d < dim) {
        val x = c(d)
        flat(j * dim + d) = x
        s += x.toDouble * x.toDouble
        d += 1
      }
      norms(j) = math.sqrt(s)
      ids(j) = cid
    }
    ExpressionUtils.column(NearestCentroids(
      ExpressionUtils.expression(vec), flat, norms, ids, cents.size, dim, keep))
  }

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
