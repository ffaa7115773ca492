package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE subword segmentation as a codegen'd expression (the encode half of
  * graft.functions.Bpe; the merge list is trained there and embedded here
  * as a reference object — KBs, never a per-row column).
  *
  * Why an Expression and not a UDF: the encode runs over every document of
  * the corpus (the map-only data-sized pass), and a Scala UDF would break
  * the WholeStageCodegen span around the scan + explode + aggregation that
  * consumes it. Here the generated code makes ONE virtual call per row
  * into the serialized [[BpeExprs.Encoder]] (interpreted eval is the same
  * call), with a bounded per-task word->tokens memo — corpus words repeat
  * per Heap's law, so the greedy merge loop runs once per DISTINCT word
  * per task, not once per occurrence.
  *
  * Tokenization contract: words are the non-empty runs between single
  * spaces (this corpus's documents are single-space joined); merges are
  * word-internal only — pairs never span a space.
  */
object BpeExprs {

  /** Greedy lowest-rank-first BPE merge loop over one word; deterministic
    * (public-knowledge formulation: Sennrich et al. 2016, ACL).
    */
  def encodeWord(word: String, ranks: java.util.Map[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) { syms.add(String.valueOf(word.charAt(ci))); ci += 1 }
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Integer.MAX_VALUE
      var bestIdx = -1
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val l = syms.get(bestIdx)
        val rgt = syms.get(bestIdx + 1)
        val out = new java.util.ArrayList[String](syms.size)
        var j = 0
        while (j < syms.size) {
          if (j < syms.size - 1 && syms.get(j) == l && syms.get(j + 1) == rgt) {
            out.add(l + rgt); j += 2
          } else { out.add(syms.get(j)); j += 1 }
        }
        syms = out
      }
    }
    val arr = new Array[String](syms.size)
    syms.toArray(arr)
    arr
  }

  /** Serialized per-task runtime: rank table + bounded distinct-word memo. */
  final class Encoder(merges: Seq[(String, String)]) extends Serializable {
    private val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => ranks.put(l + " " + r, i) }

    // Rebuilt lazily per deserialized task; capped so a pathological
    // vocabulary cannot grow executor memory unboundedly.
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
    private val MemoCap = 1 << 16

    private def tokensOf(word: String): Array[UTF8String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val toks = encodeWord(word, ranks).map(UTF8String.fromString)
      if (memo.size < MemoCap) memo.putIfAbsent(word, toks)
      toks
    }

    def encodeDoc(text: UTF8String): ArrayData = {
      val words = text.toString.split(' ')
      val out = new java.util.ArrayList[AnyRef](words.length * 2)
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          val toks = tokensOf(words(i))
          var j = 0
          while (j < toks.length) { out.add(toks(j)); j += 1 }
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncode(ExpressionUtils.expression(text), merges))
}

/** text -> array of BPE subword tokens under the given trained merge list. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val encoder = new BpeExprs.Encoder(merges)

  override def nullSafeEval(input: Any): Any =
    encoder.encodeDoc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The Encoder (rank table, KBs) rides as a reference object; the hot
    // path stays one call per row inside the codegen span.
    val enc = ctx.addReferenceObj("bpeEncoder", new BpeExprs.Encoder(merges),
      classOf[BpeExprs.Encoder].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $enc.encodeDoc($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
