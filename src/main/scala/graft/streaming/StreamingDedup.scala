package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.MinHash

/** Streaming near-duplicate detection — the incremental twin of the batch
  * MinHash/LSH path (dedup_minhash): an arriving document is checked
  * against everything the stream has ALREADY seen, without ever holding
  * the corpus, by keying per-key streaming state on the LSH band bucket.
  *
  * Same signature family as batch (32 slots, 8 bands × 4 rows, the
  * codegen'd MinHashSlots expression), so a pair that collides here is
  * the same pair the batch banding would bucket. Per bucket, state is a
  * bounded most-recent ring of (doc_id, signature); a new arrival is
  * compared against the ring by minhash slot agreement — the standard
  * unbiased Jaccard estimator (E[agree/32] = J) — and emitted as a
  * candidate pair when the estimate clears the threshold.
  *
  * Scale posture: state shards by (band, bucket-hash) across the state
  * store (RocksDB backend in production — StreamingSpec's restart test
  * already runs it), is BOUNDED at maxPerBucket signatures per occupied
  * bucket regardless of stream length, and the per-arrival work is
  * |bucket ring| signature comparisons, never |corpus|. A pair colliding
  * in several bands emits once per band (exactly like the batch
  * candidate-pair stage) — dedupe downstream, where the batch path does.
  * Production streams add an event-time TTL (EventTimeTimeout) to age
  * buckets out; the cap alone already bounds memory, so the TTL is a
  * freshness knob, not a safety one.
  */
object StreamingDedup {

  case class BandRow(docId: Long, band: Int, bh: Long, sig: Array[Long])
  case class CandPair(aId: Long, bId: Long, band: Int, estSim: Double)
  case class BucketState(entries: List[(Long, Array[Long])])

  /** (docId, band, bandHash, full signature) — one row per band per doc.
    * Streaming-safe (no repartition: the groupByKey below is the stage
    * boundary); token-less docs are excluded for the same reason as the
    * batch path (minhash of an empty set is undefined).
    */
  def bandRows(docs: DataFrame): Dataset[BandRow] = {
    implicit val enc: Encoder[BandRow] = ExpressionEncoder()
    docs
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), MinHash.baseHashes(col("toks")).as("base"))
      .filter(size(col("base")) > 0)
      .select(col("doc_id"), MinHash.signatureFromBase(col("base")).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(MinHash.Bands - 1))).as("band"))
      .select(col("doc_id").as("docId"), col("band").cast("int").as("band"),
        xxhash64(slice(col("sig"),
          col("band") * lit(MinHash.RowsPerBand) + lit(1),
          lit(MinHash.RowsPerBand))).as("bh"),
        col("sig"))
      .as[BandRow]
  }

  /** Candidate near-dup pairs from a streaming (doc_id, text) frame.
    * aId < bId; estSim = minhash slot agreement in [0, 1].
    */
  def candidatePairs(docs: DataFrame, maxPerBucket: Int = 16,
      minEstSim: Double = 0.5): Dataset[CandPair] = {
    implicit val pairEnc: Encoder[CandPair] = ExpressionEncoder()
    implicit val stateEnc: Encoder[BucketState] = ExpressionEncoder()
    implicit val keyEnc: Encoder[(Int, Long)] = ExpressionEncoder()
    bandRows(docs)
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[CandPair]
          rows.foreach { r =>
            if (!entries.exists(_._1 == r.docId)) {
              entries.foreach { case (oid, osig) =>
                val agree = osig.iterator.zip(r.sig.iterator)
                  .count { case (a, b) => a == b }
                val est = agree.toDouble / MinHash.NumHashes
                if (est >= minEstSim)
                  out += CandPair(math.min(oid, r.docId),
                    math.max(oid, r.docId), r.band, est)
              }
              // Most-recent-first ring: the cap is the state bound.
              entries = ((r.docId, r.sig) :: entries).take(maxPerBucket)
            }
          }
          state.update(BucketState(entries))
          out.iterator
      }
  }
}
