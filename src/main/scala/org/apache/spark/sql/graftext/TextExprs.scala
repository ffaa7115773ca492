package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass dedup-normalization of document text:
  *
  *   lowercase → strip non-[a-z0-9 ] → collapse space runs → trim
  *
  * — byte-identical to the expression chain it replaces in
  * graft.operators.LlmOps (`trim(regexp_replace(regexp_replace(
  * lower(text), "[^a-z0-9 ]", ""), " +", " "))`), which evaluated TWO
  * java.util.regex passes over every document. Measured (BENCH_sf10_r15):
  * q_dedup_exact (md5 only) 0.95 s vs q_dedup_exact_norm (normalize +
  * md5) 18.5 s — the regex chain was ~95% of the query.
  *
  * Equivalence argument, per row:
  *   - ASCII input (the corpus case): `lower` on pure-ASCII bytes is the
  *     byte-wise A-Z→a-z map (UTF8String's own ASCII fast path); the
  *     strip regex deletes every byte outside [a-z0-9 ]; " +"→" "
  *     collapses space runs; trim drops leading/trailing spaces. The
  *     single pass below reproduces the composition exactly: a kept
  *     char flushes at most one pending space; spaces before the first
  *     kept char and after the last are never flushed; deleted chars
  *     neither emit nor separate (so spaces adjacent across a deletion
  *     collapse, as they do post-strip).
  *   - Any non-ASCII byte routes the WHOLE row through [[NormText.slow]],
  *     which runs the identical legacy composition via the same
  *     primitives Spark's builtins use (UTF8String.toLowerCase, the two
  *     java.util.regex patterns, UTF8String.trim) — so multi-char
  *     Unicode lowercase expansions (İ → i + U+0307, …) behave exactly
  *     as before.
  *
  * The oracle twin is unchanged ([[graft.operators.LlmOps.normTextSql]]);
  * the three norm-keyed dedup queries stay hash-gated against DuckDB,
  * which is the end-to-end byte-identity proof.
  */
case class NormText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override def nullSafeEval(input: Any): Any =
    NormText.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftext.NormText.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {
  /** Entry point the generated code calls. */
  def norm(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    while (i < n) {
      if (b(i) < 0) return slow(s) // non-ASCII byte: exact legacy path
      i += 1
    }
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      var c = b(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = c
        o += 1
      } else if (c == ' ' && o > 0) {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private val Strip = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val Collapse = java.util.regex.Pattern.compile(" +")

  /** The legacy composition, verbatim, through the same primitives the
    * builtin chain used: Lower(UTF8_BINARY) = UTF8String.toLowerCase;
    * RegExpReplace = java.util.regex over the String form (replacements
    * here carry no $/\ escapes, so replaceAll ≡ Spark's append loop);
    * trim = UTF8String.trim (ASCII space only — the post-strip string
    * contains nothing else trimmable).
    */
  private def slow(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val stripped = Strip.matcher(lowered).replaceAll("")
    val collapsed = Collapse.matcher(stripped).replaceAll(" ")
    UTF8String.fromString(collapsed).trim()
  }
}

/** Column-API entry points for the custom text expressions. */
object TextExprs {
  /** Codegen'd one-pass dedup normalization (see NormText). */
  def normText(c: Column): Column =
    ExpressionUtils.column(NormText(ExpressionUtils.expression(c)))
}
