package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Multimodal

/** The multimodal plumbing gate: typed binary schema, batched
  * partition-local decode (no shuffle, partitioning preserved),
  * deterministic stub features, metadata transforms, frame sampling.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = Multimodal.syntheticMedia(
    spark, Tables.documents(spark, TestSpark.sf0001))

  test("schema: binary payload + typed metadata struct") {
    val sch = media.toDF().schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
  }

  test("decode: deterministic features, fixed dim, partitioning preserved") {
    val m = media.repartition(4)
    val f1 = Multimodal.decodeFeatures(m)
    assert(f1.rdd.getNumPartitions == 4, "decode must not shuffle")
    val a = f1.collect().map(r => r.media_id -> r.feature.toSeq).toMap
    val b = Multimodal.decodeFeatures(m).collect().map(r => r.media_id -> r.feature.toSeq).toMap
    assert(a == b, "stub decode must be deterministic")
    assert(a.values.forall(_.length == Multimodal.FeatureDim))
    assert(a.values.flatten.forall(v => v >= -1.0f && v <= 1.0f))
    // different payloads -> different features (no constant stub):
    assert(a.values.toSeq.distinct.size > 400)
  }

  test("binaryFile ingestion: kind from extension, glob prunes the listing, decode runs end-to-end") {
    import java.nio.file.{Files, Paths}
    val base = Paths.get("target/graft-scratch")
    Files.createDirectories(base)
    val dir = Files.createTempDirectory(base, "graft_media_")
    val files = Seq("cat.png" -> Array[Byte](1, 2, 3), "dog.jpg" -> Array[Byte](4, 5),
      "song.wav" -> Array[Byte](6), "clip.mp4" -> Array[Byte](7, 8), "blob.xyz" -> Array[Byte](9))
    files.foreach { case (n, bytes) => Files.write(dir.resolve(n), bytes) }

    val all = Multimodal.binaryFiles(spark, dir.toString)
    val byKind = all.collect().groupBy(_.kind).view.mapValues(_.length).toMap
    assert(byKind == Map("image" -> 2, "audio" -> 1, "video" -> 1, "binary" -> 1), byKind.toString)

    val png = Multimodal.binaryFiles(spark, dir.toString, glob = "*.png").collect()
    assert(png.length == 1 && png.head.kind == "image" && png.head.payload.toSeq == Seq[Byte](1, 2, 3))

    // ingested records run the decode pipeline unchanged, ids are stable
    val feats = Multimodal.decodeFeatures(Multimodal.binaryFiles(spark, dir.toString))
    assert(feats.count() == 5)
    assert(feats.collect().forall(_.feature.length == Multimodal.FeatureDim))
    val ids1 = all.collect().map(_.media_id).sorted.toSeq
    val ids2 = Multimodal.binaryFiles(spark, dir.toString).collect().map(_.media_id).sorted.toSeq
    assert(ids1 == ids2 && ids1.distinct.size == 5)
  }

  test("resize clamps metadata, payload untouched") {
    val before = media.toDF()
    val after = Multimodal.resizeMeta(before, maxW = 128, maxH = 96)
    val dims = after.select(max(col("meta.width")), max(col("meta.height"))).head()
    assert(dims.getInt(0) <= 128 && dims.getInt(1) <= 96)
    assert(after.select(md5(col("payload"))).collect().toSeq ==
      before.select(md5(col("payload"))).collect().toSeq)
  }

  test("frame sampling: ceil(nFrames/step) rows per video") {
    val sampled = Multimodal.sampleFrames(media.toDF(), step = 10)
    val perVideo = sampled.groupBy(col("media_id"), col("n_frames"))
      .agg(count(lit(1)).as("n")).collect()
    assert(perVideo.nonEmpty)
    perVideo.foreach { r =>
      val expect = (r.getInt(1) + 9) / 10
      assert(r.getLong(2) == expect, s"media ${r.getLong(0)}: ${r.getLong(2)} vs $expect")
    }
    // only video rows sampled
    val kinds = media.toDF().filter(col("kind") === "video").count()
    assert(sampled.select(col("media_id")).distinct().count() == kinds)
  }
}
