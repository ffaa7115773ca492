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
    private def ord: Ordering[Entry] =
      Ordering.by((e: Entry) => (-e.value, e.key))

    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], in: Entry): Seq[Entry] =
      ((buf :+ in).sorted(ord)).take(k)

    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      ((a ++ b).sorted(ord)).take(k)

    override def finish(buf: Seq[Entry]): Seq[Entry] = buf.sorted(ord)

    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  def topK(k: Int): TopK = new TopK(k)
}
