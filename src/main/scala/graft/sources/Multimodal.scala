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
        when(col("ext").isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
          .when(col("ext").isin("wav", "mp3", "flac"), "audio")
          .when(col("ext").isin("mp4", "mkv", "webm"), "video")
          .otherwise("binary").as("kind"),
        col("payload"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sampleRate"), lit(0).as("nFrames")).as("meta"))
      .as[MediaRecord]
  }

  /** REAL container-header metadata decode — pure byte-slicing, no codec
    * dependency. Recognizes:
    *
    *   - PNG: 8-byte signature then the mandatory first IHDR chunk;
    *     width/height are big-endian u32 at offsets 16/20.
    *   - BMP: "BM" magic + BITMAPINFOHEADER; width/height are
    *     little-endian i32 at offsets 18/22 (height negative = top-down
    *     row order, so |height|).
    *   - WAV: "RIFF"...."WAVE", then a chunk walk (word-aligned) for
    *     "fmt " (sampleRate = LE u32 at chunk offset +4, blockAlign = LE
    *     u16 at +12) and "data" (size / blockAlign = frame count).
    *
    * Returns None for unrecognized or truncated payloads — PIXEL/SAMPLE
    * decode still needs a codec (decodeStub below); header metadata does
    * not, so this part is real and golden-tested on hand-built byte
    * fixtures (MultimodalSpec).
    */
  private[graft] def parseHeader(p: Array[Byte]): Option[MediaMeta] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Long =
      (u8(i + 3).toLong << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    def le16(i: Int): Int = (u8(i + 1) << 8) | u8(i)
    def ascii(i: Int, n: Int): String =
      new String(p, i, n, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length >= 24 && be32(0) == 0x89504e47L && be32(4) == 0x0d0a1a0aL &&
        ascii(12, 4) == "IHDR")
      Some(MediaMeta(be32(16).toInt, be32(20).toInt, 0, 1))
    else if (p.length >= 26 && ascii(0, 2) == "BM")
      Some(MediaMeta(le32(18).toInt, math.abs(le32(22).toInt), 0, 1))
    else if (p.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      var off = 12
      var rate = 0
      var block = 0
      var dataLen = -1L
      while (off + 8 <= p.length && (rate == 0 || dataLen < 0)) {
        val id = ascii(off, 4)
        val sz = le32(off + 4)
        if (id == "fmt " && off + 8 + 14 <= p.length) {
          rate = le32(off + 12).toInt   // fmt data +4: sample rate
          block = le16(off + 20)        // fmt data +12: block align
        } else if (id == "data") dataLen = sz
        off += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
      if (rate > 0)
        Some(MediaMeta(0, 0, rate,
          if (block > 0 && dataLen >= 0) (dataLen / block).toInt else 0))
      else None
    } else None
  }

  /** Metadata decode over a media set: fills the meta struct from the
    * payload's container header where recognized (the binaryFiles ingest
    * zeroes it), leaves it untouched otherwise. Partition-local map — no
    * shuffle, partitioning preserved, payload never copied.
    */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      parseHeader(r.payload).map(m => r.copy(meta = m)).getOrElse(r)))
  }

  /** STUB decoder: a real pipeline would decode the payload with an image /
    * audio codec here. This fake is deterministic in the payload bytes so
    * the surrounding plumbing stays testable. (Container-level metadata is
    * NOT stubbed — see [[parseHeader]]/[[decodeMeta]].)
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
