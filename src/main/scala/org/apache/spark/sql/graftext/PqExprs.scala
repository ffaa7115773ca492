package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Product-quantization kernels (encode / query-LUT / asymmetric distance),
  * the compressed-domain scale path for vector similarity: a d-dim float
  * vector (d*4 bytes) becomes numSub sub-codes PACKED INTO ONE BIGINT —
  * 8 bytes regardless of d. At numSub=8, k=256 that is 64-dim f32 -> 8 B,
  * a 32x reduction in the bytes every shuffle, cache, and state store
  * touches, which is the difference between "candidate set fits in executor
  * memory" and "spills" at the 100 TB row counts.
  *
  * Distance is recovered WITHOUT decompression (ADC — asymmetric distance
  * computation): the query side precomputes one lookup table of its dot
  * product against every centroid of every subspace (numSub*k doubles, a
  * few KB), and each candidate's approximate inner product is numSub table
  * reads + adds. The codebook itself is KBs (numSub*k*subDim floats) and
  * rides into codegen as a reference object — never a per-row column.
  *
  * Same packaging rationale as QuantizedDot: Spark's HOFs are
  * CodegenFallback; these emit primitive loops inside WholeStageCodegen,
  * with interpreted eval as the identical loop (PqSpec pins both to a
  * driver-side reference).
  *
  * Layout invariants shared by all three expressions (PqSpec-pinned):
  *   - k is a power of two, bits = log2(k), numSub*bits <= 64;
  *   - codebook is flat [numSub * k * subDim], centroid (i,j) at
  *     (i*k + j)*subDim;
  *   - sub-code i occupies bits [i*bits, (i+1)*bits) of the packed long;
  *   - vector coordinates beyond numSub*subDim are ignored; missing
  *     coordinates read as 0 (callers guard exact dimension where silence
  *     would be wrong — AnnIvf precedent).
  */
object PqExprs {
  /** Validates the (numSub, k) geometry; returns bits per sub-code. */
  private[graftext] def bitsFor(numSub: Int, k: Int): Int = {
    require(k >= 2 && (k & (k - 1)) == 0, s"k must be a power of two, got $k")
    val bits = java.lang.Integer.numberOfTrailingZeros(k)
    require(numSub * bits <= 64, s"numSub=$numSub codes of $bits bits exceed one long")
    bits
  }

  /** Codegen'd PQ encode: nearest centroid per subspace, packed. */
  def pqEncode(vec: Column, subDim: Int, numSub: Int, k: Int, codebook: Seq[Float]): Column =
    ExpressionUtils.column(
      PqEncodePacked(ExpressionUtils.expression(vec), subDim, numSub, k, codebook))

  /** Codegen'd query-side ADC lookup table (numSub*k inner products). */
  def pqLut(vec: Column, subDim: Int, numSub: Int, k: Int, codebook: Seq[Float]): Column =
    ExpressionUtils.column(
      PqLut(ExpressionUtils.expression(vec), subDim, numSub, k, codebook))

  /** Codegen'd ADC inner product: numSub LUT reads + adds per candidate. */
  def pqAdc(codes: Column, lut: Column, numSub: Int, k: Int): Column =
    ExpressionUtils.column(
      PqAdc(ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), numSub, k))

  /** Codegen'd LUT-FREE asymmetric inner product <q, decode(codes)> — for
    * joins where BOTH sides scale (the IVF×PQ kNN join): a per-probe LUT
    * column would replicate numSub*k doubles per assignment row through
    * the list_id shuffle, dwarfing the d-float vector it replaces. Here
    * the probe ships its raw vector and each pair pays numSub*subDim FMAs
    * against the codebook reference object — the same FLOPs as the exact
    * fdot, but the CANDIDATE side is 8 bytes of code instead of d*4 bytes
    * of array, which is what the scan, shuffle, and join row-handling
    * actually price.
    */
  def pqAsymDot(vec: Column, codes: Column, subDim: Int, numSub: Int, k: Int,
                codebook: Seq[Float]): Column =
    ExpressionUtils.column(
      PqAsymDot(ExpressionUtils.expression(vec), ExpressionUtils.expression(codes),
        subDim, numSub, k, codebook))
}

/** Nearest-centroid-per-subspace encoder: argmin_j ||v_i - c_ij||^2 for each
  * subspace i, sub-codes packed little-endian into one long. Ties broken by
  * LOWEST centroid index (strict < in the scan), so encoding is total-order
  * deterministic. Null vector -> null.
  */
case class PqEncodePacked(child: Expression, subDim: Int, numSub: Int, k: Int,
                          codebook: Seq[Float])
  extends UnaryExpression with ExpectsInputTypes {

  private val bits = PqExprs.bitsFor(numSub, k)
  require(codebook.length == numSub * k * subDim,
    s"codebook length ${codebook.length} != numSub*k*subDim = ${numSub * k * subDim}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  @transient private lazy val cb: Array[Float] = codebook.toArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var packed = 0L
    var i = 0
    while (i < numSub) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (i * k + j) * subDim
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val coord = i * subDim + d
          val v = if (coord < n) a.getFloat(coord).toDouble else 0.0
          val diff = v - cb(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      packed |= best.toLong << (i * bits)
      i += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val packed = ctx.freshName("packed")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      val dist = ctx.freshName("dist")
      val coord = ctx.freshName("coord")
      val v = ctx.freshName("v")
      val diff = ctx.freshName("diff")
      s"""
         |final int $n = $a.numElements();
         |long $packed = 0L;
         |for (int $i = 0; $i < $numSub; $i++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    final int $base = ($i * $k + $j) * $subDim;
         |    double $dist = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      final int $coord = $i * $subDim + $d;
         |      final double $v = $coord < $n ? (double) $a.getFloat($coord) : 0.0;
         |      final double $diff = $v - (double) $cbRef[$base + $d];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $j; }
         |  }
         |  $packed |= ((long) $best) << ($i * $bits);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodePacked =
    copy(child = newChild)
}

/** Query-side ADC lookup table: lut[i*k + j] = <q_i, c_ij> (double). One
  * evaluation per PROBE, not per candidate — the numSub*k*subDim work here
  * is what makes PqAdc's per-candidate cost numSub adds.
  */
case class PqLut(child: Expression, subDim: Int, numSub: Int, k: Int,
                 codebook: Seq[Float])
  extends UnaryExpression with ExpectsInputTypes {

  PqExprs.bitsFor(numSub, k) // validate geometry
  require(codebook.length == numSub * k * subDim,
    s"codebook length ${codebook.length} != numSub*k*subDim = ${numSub * k * subDim}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val cb: Array[Float] = codebook.toArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](numSub * k)
    var i = 0
    while (i < numSub) {
      var j = 0
      while (j < k) {
        val base = (i * k + j) * subDim
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val coord = i * subDim + d
          val v = if (coord < n) a.getFloat(coord).toDouble else 0.0
          acc += v * cb(base + d)
          d += 1
        }
        out(i * k + j) = acc
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val coord = ctx.freshName("coord")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final double[] $out = new double[${numSub * k}];
         |for (int $i = 0; $i < $numSub; $i++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    final int $base = ($i * $k + $j) * $subDim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      final int $coord = $i * $subDim + $d;
         |      final double $v = $coord < $n ? (double) $a.getFloat($coord) : 0.0;
         |      $acc += $v * (double) $cbRef[$base + $d];
         |    }
         |    $out[$i * $k + $j] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC approximate inner product: sum over subspaces of
  * lut[i*k + code_i(packed)]. THE hot loop of compressed-domain search —
  * numSub array reads + adds per (probe, candidate) pair, no float vector
  * in sight. Null on either side -> null.
  */
case class PqAdc(left: Expression, right: Expression, numSub: Int, k: Int)
  extends BinaryExpression with ExpectsInputTypes {

  private val bits = PqExprs.bitsFor(numSub, k)
  private val mask = (k - 1).toLong

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val packed = codes.asInstanceOf[Long]
    val t = lut.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < numSub) {
      val code = ((packed >>> (i * bits)) & mask).toInt
      acc += t.getDouble(i * k + code)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $numSub; $i++) {
         |  final int $code = (int) (($codes >>> ($i * $bits)) & ${mask}L);
         |  $acc += $lut.getDouble($i * $k + $code);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** LUT-free asymmetric inner product: <vec, decode(codes)> = sum over
  * subspaces of <vec_i, c_{i, code_i}>. Identical result to
  * PqAdc(codes, PqLut(vec)) — PqSpec pins the equality — but evaluated
  * per pair against the codebook reference object, so no numSub*k-double
  * LUT column ever exists in the plan (see [[PqExprs.pqAsymDot]] for when
  * that trade wins). Missing vector coordinates read as 0, matching the
  * other kernels. Null on either side -> null.
  */
case class PqAsymDot(left: Expression, right: Expression,
                     subDim: Int, numSub: Int, k: Int, codebook: Seq[Float])
  extends BinaryExpression with ExpectsInputTypes {

  private val bits = PqExprs.bitsFor(numSub, k)
  private val mask = (k - 1).toLong
  require(codebook.length == numSub * k * subDim,
    s"codebook length ${codebook.length} != numSub*k*subDim = ${numSub * k * subDim}")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_asym_dot"

  @transient private lazy val cb: Array[Float] = codebook.toArray

  override def nullSafeEval(vec: Any, codes: Any): Any = {
    val a = vec.asInstanceOf[ArrayData]
    val packed = codes.asInstanceOf[Long]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < numSub) {
      val code = ((packed >>> (i * bits)) & mask).toInt
      val base = (i * k + code) * subDim
      var d = 0
      while (d < subDim) {
        val coord = i * subDim + d
        val v = if (coord < n) a.getFloat(coord).toDouble else 0.0
        acc += v * cb(base + d)
        d += 1
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    nullSafeCodeGen(ctx, ev, (vec, codes) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val code = ctx.freshName("code")
      val base = ctx.freshName("base")
      val coord = ctx.freshName("coord")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $vec.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $numSub; $i++) {
         |  final int $code = (int) (($codes >>> ($i * $bits)) & ${mask}L);
         |  final int $base = ($i * $k + $code) * $subDim;
         |  for (int $d = 0; $d < $subDim; $d++) {
         |    final int $coord = $i * $subDim + $d;
         |    final double $v = $coord < $n ? (double) $vec.getFloat($coord) : 0.0;
         |    $acc += $v * (double) $cbRef[$base + $d];
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAsymDot =
    copy(left = newLeft, right = newRight)
}
