package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch union — the heavy-hitter member of the mergeable-
  * sketch family (HLL = distinct counts, bloom = membership, KLL/approx =
  * quantiles, CMS = per-key frequencies). Spark ships the BUILD aggregate
  * (`count_min_sketch(col, eps, confidence, seed)` — codegen'd, returns
  * the serialized sketch) but no union aggregate, so cross-shard merging
  * needs this typed Aggregator: counters are additive, so merging is
  * cell-wise sum and the union of per-shard partials is BITWISE the
  * sketch a single global pass builds (ApproxSpec asserts byte equality —
  * the mergeability identity, not an approximation gate).
  *
  * At 100 TB this is the hot-key detector that feeds the salting layer
  * (operators.Skew): per-day/per-shard sketches are KBs each, the union
  * tree is a rollup over those KBs, and any key's estimated frequency is
  * readable WITHOUT re-scanning data — estimate >= exact always, and
  * exceeds it by more than eps * N with probability < 1 - confidence.
  *
  * The reduce side unions serialized partials (one per group), not raw
  * rows — build with the codegen'd builtin, union with this; a per-ROW
  * deserialize would be the wrong cost shape.
  */
object CmsSketch {

  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(b))

  private def write(s: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    s.writeTo(bos)
    bos.toByteArray
  }

  /** Empty-buffer-aware pairwise union (geometries must match — Spark's
    * mergeInPlace throws IncompatibleMergeException otherwise, which is
    * the behavior we want: silently mixing eps regimes would corrupt
    * every downstream estimate).
    */
  private def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val sa = read(a)
      sa.mergeInPlace(read(b))
      write(sa)
    }

  class CmsUnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = union2(buf, in)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union2(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private lazy val unionUdaf = udaf(new CmsUnionAgg(), Encoders.BINARY)

  /** Column API: union of serialized count-min sketches. */
  def cmsUnion(sketch: Column): Column = unionUdaf(sketch)

  /** Deserialize a collected sketch for driver-side probing. */
  def fromBytes(b: Array[Byte]): CountMinSketch = read(b)
}
