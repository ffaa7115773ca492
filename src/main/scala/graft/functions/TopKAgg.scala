package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator — the single-pass scale answer for
  * "top k rows per group": the buffer never holds more than k elements, so
  * partial aggregation ships k rows per group per partition instead of the
  * whole group (contrast with a window over the full partition, or even the
  * salted two-phase window used by q_agg_topk_group, which still sorts
  * every row once). Order: value DESC, tiebreak key ASC — identical to the
  * window formulation, asserted equal in TopKAggSpec.
  */
object TopKAgg {
  case class Entry(value: Double, key: Long)

  class TopK(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    // Matches Spark's sort semantics exactly (the equivalence contract with
    // the window formulation): NaN sorts as the LARGEST double (first under
    // DESC) and -0.0 == 0.0 so the key tiebreak applies — a naive
    // Ordering.by(-value) gets both wrong.
    private val ord: Ordering[Entry] = new Ordering[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val av = if (a.value == 0.0) 0.0 else a.value // normalize -0.0 (NaN != 0.0)
        val bv = if (b.value == 0.0) 0.0 else b.value
        val c = java.lang.Double.compare(bv, av) // DESC; compare puts NaN largest
        if (c != 0) c else java.lang.Long.compare(a.key, b.key)
      }
    }

    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], in: Entry): Seq[Entry] =
      // Fast path once full: most rows lose to the current k-th entry.
      // (buf.nonEmpty also keeps the degenerate TopK(0) well-defined.)
      if (buf.nonEmpty && buf.size == k && ord.lteq(buf.last, in)) buf
      else ((buf :+ in).sorted(ord)).take(k)

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      ((a ++ b).sorted(ord)).take(k)

    override def finish(buf: Seq[Entry]): Seq[Entry] = buf.sorted(ord)

    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  def topK(k: Int): TopK = new TopK(k)
}
