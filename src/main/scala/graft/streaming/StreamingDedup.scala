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
  case class BandRowT(docId: Long, band: Int, bh: Long, sig: Array[Long], ts: java.sql.Timestamp)
  case class CandPair(aId: Long, bId: Long, band: Int, estSim: Double)
  /** `newestTs`: max event-time (epoch ms) ever inserted into this bucket.
    * Carried in state so the TTL path can keep the eviction timeout
    * MONOTONE: a late-but-within-watermark arrival older than existing
    * entries must never pull the timeout backward (that would evict the
    * bucket — including its newer entries — before newestTs + ttl, silently
    * missing duplicates inside the advertised window). Long.MinValue for
    * the NoTimeout path, which never reads it.
    */
  case class BucketState(entries: List[(Long, Array[Long])],
                         newestTs: Long = Long.MinValue)

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

  /** Shared per-bucket arrival logic: compare against the ring, emit
    * clearing pairs, append with the cap.
    */
  private def processArrival(docId: Long, sig: Array[Long],
      entries: List[(Long, Array[Long])], maxPerBucket: Int, minEstSim: Double,
      band: Int, out: scala.collection.mutable.ListBuffer[CandPair])
      : List[(Long, Array[Long])] = {
    if (entries.exists(_._1 == docId)) entries
    else {
      entries.foreach { case (oid, osig) =>
        val agree = osig.iterator.zip(sig.iterator).count { case (a, b) => a == b }
        val est = agree.toDouble / MinHash.NumHashes
        if (est >= minEstSim)
          out += CandPair(math.min(oid, docId), math.max(oid, docId), band, est)
      }
      ((docId, sig) :: entries).take(maxPerBucket)
    }
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
            entries = processArrival(r.docId, r.sig, entries, maxPerBucket,
              minEstSim, r.band, out)
          }
          state.update(BucketState(entries))
          out.iterator
      }
  }

  /** As candidatePairs, with the production FRESHNESS knob: the input
    * carries an event-time `ts` column and a watermark, and a bucket whose
    * newest arrival is older than `ttlMs` behind the watermark is EVICTED
    * (EventTimeTimeout) — "only pair against documents seen in the last N
    * hours of stream time". The ring cap still bounds memory; the TTL
    * bounds STALENESS, and makes occupied-bucket count track the active
    * window instead of stream history.
    *
    * Caller contract: `docs` has (doc_id, text, ts) and
    * `.withWatermark("ts", …)` already applied (the watermark delay is the
    * caller's lateness policy; ttlMs is the dedup window — independent
    * knobs).
    */
  def candidatePairsTtl(docs: DataFrame, ttlMs: Long,
      maxPerBucket: Int = 16, minEstSim: Double = 0.5): Dataset[CandPair] = {
    implicit val pairEnc: Encoder[CandPair] = ExpressionEncoder()
    implicit val stateEnc: Encoder[BucketState] = ExpressionEncoder()
    implicit val keyEnc: Encoder[(Int, Long)] = ExpressionEncoder()
    implicit val rowEnc: Encoder[BandRowT] = ExpressionEncoder()
    val banded = docs
      .select(col("doc_id"), col("ts"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), col("ts"), MinHash.baseHashes(col("toks")).as("base"))
      .filter(size(col("base")) > 0)
      .select(col("doc_id"), col("ts"),
        MinHash.signatureFromBase(col("base")).as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(sequence(lit(0), lit(MinHash.Bands - 1))).as("band"))
      .select(col("doc_id").as("docId"), col("band").cast("int").as("band"),
        xxhash64(slice(col("sig"),
          col("band") * lit(MinHash.RowsPerBand) + lit(1),
          lit(MinHash.RowsPerBand))).as("bh"),
        col("sig"),
        col("ts"))
      .as[BandRowT]
    banded
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), rows: Iterator[BandRowT], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption
            var entries = prior.map(_.entries).getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[CandPair]
            var maxTs = prior.map(_.newestTs).getOrElse(Long.MinValue)
            rows.foreach { r =>
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
              entries = processArrival(r.docId, r.sig, entries, maxPerBucket,
                minEstSim, r.band, out)
            }
            // maxTs folds in the PRIOR newest arrival, so a late batch whose
            // rows are all older than the bucket can only extend the
            // timeout, never shorten it — eviction happens exactly when the
            // bucket's newest arrival falls ttl behind the watermark.
            state.update(BucketState(entries, maxTs))
            state.setTimeoutTimestamp(maxTs + ttlMs)
            out.iterator
          }
      }
  }
}
