package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Multimodal columns: image/audio/video as opaque binary payloads with
  * typed metadata, plus the decode / feature-extract / resize / frame-sample
  * operations a training-data pipeline runs over them.
  *
  * The DECODE step is REAL for every format a stock JVM can decode:
  * image pixels through the JDK's own `javax.imageio` codecs (PNG/BMP/
  * GIF/JPEG — no external library), WAV audio samples through direct
  * 16-bit PCM slicing (WAV PCM is bytes, not a codec). Only formats with
  * NO JDK decoder (video containers; unrecognized bytes) fall back to
  * the clearly-marked `decodeStub`, deterministic in the payload so the
  * plumbing stays testable. The at-scale plumbing is the same either
  * way: typed schema (binary payload + metadata struct), encoder-based
  * Dataset records, batched partition-local decoding (the JVM twin of a
  * batched pandas UDF: one decoder initialization per batch, no shuffle,
  * partitioning preserved), and expression-only metadata transforms that
  * never touch the payload.
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
      // The chunk walk advances in LONG arithmetic: le32 sizes are
      // UNSIGNED 32-bit values from untrusted bytes — truncating to Int
      // turns >2 GiB claims negative, which either stalls the walk (an
      // executor task spinning forever) or wraps `off` negative into an
      // uncaught ArrayIndexOutOfBoundsException. As a Long the size is
      // always >= 0, so `off` strictly increases by >= 8 and the loop
      // provably terminates on any byte string (ADVICE r13).
      var off = 12L
      var rate = 0
      var block = 0
      var dataLen = -1L
      var dataOff = -1L
      while (off + 8 <= p.length && (rate == 0 || dataLen < 0)) {
        val o = off.toInt // off + 8 <= length keeps this exact
        val id = ascii(o, 4)
        val sz = le32(o + 4)
        if (id == "fmt " && off + 8 + 14 <= p.length) {
          rate = le32(o + 12).toInt   // fmt data +4: sample rate
          block = le16(o + 20)        // fmt data +12: block align
        } else if (id == "data") { dataLen = sz; dataOff = off + 8 }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      if (rate > 0) {
        // A hostile header can claim dataLen up to ~4.29e9 (u32) with
        // block 1: the quotient itself can overflow Int. Clamp the claim
        // to the payload bytes actually present AFTER the data chunk's
        // own offset — clamping to the whole file length would still let
        // a lying dataLen overstate frames by ~headerBytes/block, since
        // the RIFF header and fmt chunk are not sample data (ADVICE r15).
        val avail = if (dataOff >= 0) p.length.toLong - dataOff else 0L
        val claimed = math.min(dataLen, avail)
        Some(MediaMeta(0, 0, rate,
          if (block > 0 && claimed >= 0) (claimed / block).toInt else 0))
      } else None
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

  /** REAL image pixel decode through the JDK's OWN codecs — `javax.imageio`
    * ships PNG/BMP/GIF/JPEG readers with every JVM, no external library.
    * Feature = FeatureDim-column mean-luminance grid (the classic cheap
    * pooling embedding: Rec.601 luma per pixel, averaged per vertical
    * stripe, normalized to [0,1]). Deterministic in the pixel content.
    * None for payloads no installed reader recognizes.
    */
  private[graft] def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    // NonFatal, not just IOException: ImageIO plugins throw RuntimeExceptions
    // (CMMException, IndexOutOfBounds) on corrupt/truncated payloads — a bad
    // image must degrade to the stub, not fail the Spark task (ADVICE r13).
    val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => null }
    Option(img).filter(i => i.getWidth > 0 && i.getHeight > 0).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val acc = new Array[Double](FeatureDim)
      val cnt = new Array[Long](FeatureDim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0
          val c = math.min(FeatureDim - 1, x * FeatureDim / w)
          acc(c) += lum; cnt(c) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(FeatureDim)(i =>
        if (cnt(i) == 0) 0f else (acc(i) / cnt(i) / 255.0).toFloat)
    }
  }

  /** REAL audio sample decode for PCM WAV — 16-bit LE samples sliced
    * straight off the data chunk (WAV PCM is bytes, not a codec; the
    * chunk walk is [[parseHeader]]'s). Feature = mean |amplitude| per
    * FeatureDim time bucket, normalized to [0,1] — the energy-envelope
    * embedding. First channel only (channel 0 of each frame). None for
    * non-WAV or non-16-bit payloads.
    */
  private[graft] def decodeWavPcm(payload: Array[Byte]): Option[Array[Float]] = {
    def u8(i: Int) = payload(i) & 0xff
    def le32(i: Int): Long =
      (u8(i + 3).toLong << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    def le16(i: Int): Int = (u8(i + 1) << 8) | u8(i)
    def ascii(i: Int, n: Int) =
      new String(payload, i, n, java.nio.charset.StandardCharsets.US_ASCII)
    if (payload.length < 12 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      return None
    // Long-arithmetic chunk walk — same untrusted-size hardening as
    // parseHeader (a u32 size truncated to Int goes negative: infinite
    // loop or negative-index crash; as a Long, off strictly increases).
    var off = 12L
    var bits = 0; var block = 0
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= payload.length && (bits == 0 || dataOff < 0)) {
      val o = off.toInt // off + 8 <= length keeps this exact
      val id = ascii(o, 4); val sz = le32(o + 4)
      if (id == "fmt " && off + 8 + 16 <= payload.length) {
        block = le16(o + 20)   // fmt +12: block align (bytes per frame)
        bits = le16(o + 22)    // fmt +14: bits per sample
      } else if (id == "data") { dataOff = o + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (bits != 16 || block < 2 || dataOff < 0) return None
    // A data chunk may CLAIM more bytes than the payload carries
    // (truncated file); decode what is actually present.
    val nFrames = (math.min(dataLen, (payload.length - dataOff).toLong) / block).toInt
    if (nFrames == 0) return Some(new Array[Float](FeatureDim))
    val acc = new Array[Double](FeatureDim)
    val cnt = new Array[Long](FeatureDim)
    var f = 0
    while (f < nFrames) {
      val i = dataOff + f * block
      val s = ((payload(i + 1) << 8) | u8(i)).toShort
      val b = math.min(FeatureDim - 1, f * FeatureDim / nFrames)
      acc(b) += math.abs(s.toInt); cnt(b) += 1
      f += 1
    }
    Some(Array.tabulate(FeatureDim)(i =>
      if (cnt(i) == 0) 0f else (acc(i) / cnt(i) / 32768.0).toFloat))
  }

  /** Fallback feature for payloads no installed decoder recognizes (the
    * synthetic corpus's text-byte payloads, video containers — the JDK
    * ships no video codec): deterministic in the payload bytes so the
    * plumbing stays testable end-to-end. Real decodes never reach this.
    */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Float] = {
    import scala.util.hashing.MurmurHash3
    Array.tabulate(FeatureDim) { slot =>
      val h = MurmurHash3.bytesHash(payload, slot)
      (h.toFloat / Int.MaxValue.toFloat)
    }
  }

  /** One record's feature: REAL decode first (JDK ImageIO pixels for
    * images, PCM slicing for WAV audio), stub only where no codec exists
    * on a stock JVM (video; unrecognized bytes).
    */
  private[graft] def decodeOne(kind: String, payload: Array[Byte]): Array[Float] =
    // Belt over the per-format hardening: NO payload may fail (or hang)
    // the whole decode task — one corrupt record degrades to the stub and
    // the batch keeps flowing, the per-record error-isolation contract of
    // a production media pipeline.
    (try kind match {
      case "image" => decodeImage(payload)
      case "audio" => decodeWavPcm(payload)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None })
      .getOrElse(decodeStub(payload))

  /** Batched partition-local decode — the mapInPandas shape on the JVM:
    * records stream through in fixed-size batches (one decoder init per
    * batch in a real pipeline), no shuffle, input partitioning preserved.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // ImageIO's default scratch is a TEMP FILE per read; keep executor
      // decode purely in-memory (thread-local safe: a static flag read at
      // stream-open time).
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map(r =>
          MediaFeature(r.media_id, r.kind, decodeOne(r.kind, r.payload)))
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
