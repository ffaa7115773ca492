package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd dot product of two bigint arrays — the hot inner loop of
  * quantized vector similarity (graft.operators.LlmOps.qdot).
  *
  * Why a custom Expression: Spark's higher-order functions (zip_with /
  * aggregate) are CodegenFallback — every element round-trips through the
  * interpreted lambda machinery with boxed accumulators. This expression
  * emits a primitive long loop inside WholeStageCodegen instead (and its
  * interpreted eval is the same tight loop). Arithmetic intentionally wraps
  * like Java long (quantized components are bounded far below overflow —
  * see LlmOps quantization notes — so ANSI overflow checks would only cost
  * cycles in the hot loop).
  *
  * Lives under org.apache.spark.sql because the expression-to-Column bridge
  * (classic.ExpressionUtils) and AbstractDataType are private[sql] — the
  * standard packaging for Spark-native extension libraries. All graft code
  * calls it through VectorExprs only.
  *
  * Semantics: null if either side is null; elements beyond the shorter
  * length are ignored (callers zip equal-length vectors).
  */
case class QuantizedDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product of two float arrays, accumulated in double in
  * array order — bitwise-identical to a sequential driver-side loop (the
  * property MlSpec's kNN reference check relies on). Same rationale and
  * packaging as QuantizedDot.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd minhash signature: numSlots slot values, each the minimum of
  * rotate-xor-mixed token base hashes (same formula as the HOF version it
  * replaced in graft.operators.MinHash — rot_j = (j*19+7)%63+1, mask_j =
  * golden * (2j+1) with Java wrap). The HOF formulation evaluated
  * numSlots x tokens interpreted lambda frames per doc; this is one
  * primitive nested loop.
  */
case class MinHashSlots(child: Expression, numSlots: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_slots"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](numSlots)
    var j = 0
    while (j < numSlots) {
      val r = (j * 19 + 7) % 63 + 1
      val mask = 0x9E3779B97F4A7C15L * (2L * j + 1L)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = java.lang.Long.rotateLeft(a.getLong(i), r) ^ mask
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val mask = ctx.freshName("mask")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$numSlots];
         |for (int $j = 0; $j < $numSlots; $j++) {
         |  final int $r = ($j * 19 + 7) % 63 + 1;
         |  final long $mask = 0x9E3779B97F4A7C15L * (2L * $j + 1L);
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $v = Long.rotateLeft($a.getLong($i), $r) ^ $mask;
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$j] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

/** Codegen'd 64-bit simhash: bit b of the result is the majority vote of
  * bit b across the input hashes (strictly-greater-than-half, matching the
  * HOF formulation it replaced in graft.operators.SimHash).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (2 * counts(b) > n) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |final int $n = $a.numElements();
         |final int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) { $counts[$b] += (int) (($h >>> $b) & 1L); }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) { if (2 * $counts[$b] > $n) $fp |= (1L << $b); }
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Codegen'd sign-LSH band values: numBands longs, bit i of band b is the
  * sign (> 0) of the dot product between the input float vector and
  * deterministic pseudo-random hyperplane j = b*bandBits + i. Planes are
  * generated INSIDE the expression from a splitmix64 finalizer over
  * (j*dim + coord) — no RNG, no fitting, identical on every executor
  * (a bare golden-ratio multiply leaves adjacent planes correlated; see
  * graft.operators.AnnIvf round-2 notes).
  *
  * Why a custom Expression: the Column formulation (numPlanes separate
  * FloatDot calls, each against a 64-float literal array, OR-folded into
  * band values) builds a ~6k-literal expression tree whose analysis +
  * codegen costs seconds PER QUERY regardless of data size (measured 8 s
  * at 2 k vectors). This is one tight loop over one reference-held plane
  * matrix.
  *
  * Coordinates beyond min(dim, input length) are ignored (FloatDot prefix
  * semantics); callers guard exact dimension where silence would be wrong.
  */
case class SignBands(child: Expression, dim: Int, numBands: Int, bandBits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  @transient private lazy val planes: Array[Float] = SignBands.planes(dim, numBands * bandBits)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var bv = 0L
      var k = 0
      while (k < bandBits) {
        val base = (b * bandBits + k) * dim
        var acc = 0.0
        var i = 0
        while (i < n) { acc += a.getFloat(i).toDouble * planes(base + i); i += 1 }
        if (acc > 0.0) bv |= (1L << k)
        k += 1
      }
      out(b) = bv
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("signPlanes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bv = ctx.freshName("bv")
      val base = ctx.freshName("base")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $dim);
         |final long[] $out = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $bv = 0L;
         |  for (int $k = 0; $k < $bandBits; $k++) {
         |    final int $base = ($b * $bandBits + $k) * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ((double) $a.getFloat($i)) * ((double) $planesRef[$base + $i]);
         |    }
         |    if ($acc > 0.0) $bv |= (1L << $k);
         |  }
         |  $out[$b] = $bv;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {
  private def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Flat [nPlanes x dim] plane matrix — the reference formula tests pin. */
  def planes(dim: Int, nPlanes: Int): Array[Float] = {
    val arr = new Array[Float](nPlanes * dim)
    var j = 0
    while (j < nPlanes) {
      var i = 0
      while (i < dim) {
        val h = mix64(j.toLong * dim + i)
        arr(j * dim + i) =
          (((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0).toFloat
        i += 1
      }
      j += 1
    }
    arr
  }
}

/** Codegen'd "how many array elements are in this literal word set"
  * (multiplicity-counting membership — array_intersect/array_except
  * dedupe, so they cannot express it). Backs the stopword counts in
  * graft.functions.TextAnalysis (quality score + language ID), replacing
  * `size(filter(toks, isInCollection(...)))` — a CodegenFallback
  * higher-order function interpreted per element. The word set rides as a
  * reference object (a UTF8String HashSet), one hash probe per element.
  *
  * Null array -> null; null elements count as non-members.
  */
case class CountInSet(child: Expression, words: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) acc += 1L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** Column-API entry points for the custom vector expressions. */
object VectorExprs {
  /** Codegen'd bigint-array dot product (see QuantizedDot). */
  def qdotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(
      QuantizedDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd float-array dot product in double (see FloatDot). */
  def fdotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd minhash signature from per-token base hashes (see MinHashSlots). */
  def minhashSlots(base: Column, numSlots: Int): Column =
    ExpressionUtils.column(MinHashSlots(ExpressionUtils.expression(base), numSlots))

  /** Codegen'd 64-bit majority-vote simhash (see SimHash64). */
  def simhash64(base: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(base)))

  /** Codegen'd sign-LSH band values (see SignBands). */
  def signBands(emb: Column, dim: Int, numBands: Int, bandBits: Int): Column =
    ExpressionUtils.column(
      SignBands(ExpressionUtils.expression(emb), dim, numBands, bandBits))

  /** Spark's builtin bloom-filter expressions, exposed as Columns — they
    * exist in catalyst (BloomFilterAggregate / BloomFilterMightContain,
    * the machinery behind the runtime bloom-join optimization) but are
    * NOT in the SQL function registry, so a Column entry point is the
    * only way to use them from the DataFrame API. Probe contract: the
    * filter side of mightContain must be foldable (a binary literal) or
    * a scalar subquery — Decontam collects the one aggregated row and
    * embeds it as a literal.
    */
  def bloomFilterAgg(hashes: Column, estimatedItems: Column, numBits: Column): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(hashes),
        ExpressionUtils.expression(estimatedItems),
        ExpressionUtils.expression(numBits)).toAggregateExpression())

  def bloomMightContain(bloomBin: Column, hash: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloomBin), ExpressionUtils.expression(hash)))

  /** Codegen'd multiplicity-counting set membership (see CountInSet). */
  def countInSet(arr: Column, words: Seq[String]): Column =
    ExpressionUtils.column(CountInSet(ExpressionUtils.expression(arr), words))
}
