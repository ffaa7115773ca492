package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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
}
