package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Multimodal columns: image/audio/video as opaque binary payloads with
  * typed metadata, plus the decode / feature-extract / resize / frame-sample
  * operations a training-data pipeline runs over them.
  *
  * The DECODE step is a deliberate, clearly-marked STUB (no image/audio
  * codecs exist in this environment): `decodeStub` derives a deterministic
  * fake feature vector from the payload bytes. Everything AROUND the stub is
  * the real at-scale plumbing and is tested: typed schema (binary payload +
  * metadata struct), encoder-based Dataset records, batched partition-local
  * decoding (the JVM twin of a batched pandas UDF: one decoder
  * initialization per batch, no shuffle, partitioning preserved), and
  * expression-only metadata transforms that never touch the payload.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  val FeatureDim = 8
  val DecodeBatchSize = 64

  /** Deterministic synthetic media table derived from the documents corpus
    * (payload = utf8 text bytes; dims derived from n_chars) — the corpus
    * ships no real binaries, the SHAPE is what matters.
    */
  def syntheticMedia(s: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import s.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("n_chars"), lit(640)) + 64).cast(IntegerType).as("width"),
        (pmod(col("n_chars"), lit(480)) + 48).cast(IntegerType).as("height"),
        lit(16000).as("sampleRate"),
        (pmod(col("n_chars"), lit(240)) + 1).cast(IntegerType).as("nFrames")).as("meta"))
      .as[MediaRecord]
  }

  /** Ingest raw media FILES through Spark's built-in binaryFile source — the
    * real on-disk ingestion path for an image/audio directory tree (the
    * corpus ships no binaries, so MultimodalSpec writes a temp dir to drive
    * this). `pathGlobFilter` prunes at FILE-LISTING time: a "*.png" ingest
    * never opens non-matching files. Metadata dims are zeroed — width/
    * sample-rate extraction belongs to the (stubbed) decode step, which
    * [[decodeFeatures]] runs over these records unchanged.
    */
  def binaryFiles(s: SparkSession, dir: String,
                  glob: String = "*"): Dataset[MediaRecord] = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("ext"),
        col("content").as("payload"))
      .select(
        col("media_id"),
        when(col("ext").isin("png", "jpg", "jpeg", "gif"), "image")
          .when(col("ext").isin("wav", "mp3", "flac"), "audio")
          .when(col("ext").isin("mp4", "mkv", "webm"), "video")
          .otherwise("binary").as("kind"),
        col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sampleRate"), lit(0).as("nFrames")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real pipeline would decode the payload with an image /
    * audio codec here. This fake is deterministic in the payload bytes so
    * the surrounding plumbing stays testable.
    */
  private[sources] def decodeStub(payload: Array[Byte]): Array[Float] = {
    import scala.util.hashing.MurmurHash3
    Array.tabulate(FeatureDim) { slot =>
      val h = MurmurHash3.bytesHash(payload, slot)
      (h.toFloat / Int.MaxValue.toFloat)
    }
  }

  /** Batched partition-local decode — the mapInPandas shape on the JVM:
    * records stream through in fixed-size batches (one decoder init per
    * batch in a real pipeline), no shuffle, input partitioning preserved.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // real pipeline: decoder/codec initialized HERE, once per batch
        batch.iterator.map(r => MediaFeature(r.media_id, r.kind, decodeStub(r.payload)))
      }
    }
  }

  /** Metadata-only resize: clamps dims to a bounding box, payload untouched
    * (pure expressions — a real resize would be another batched decode step).
    */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta", struct(
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height"),
      col("meta.sampleRate").as("sampleRate"),
      col("meta.nFrames").as("nFrames")))

  /** Frame sampling for video rows: one output row per sampled frame index
    * (0, step, 2*step, ...) — sequence+explode, no payload duplication
    * beyond the sampled slice stub.
    */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.nFrames").as("n_frames"),
        explode(sequence(lit(0), col("meta.nFrames") - 1, lit(step))).as("frame_idx"))
}
