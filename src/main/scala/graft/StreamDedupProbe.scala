package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Measurement main for StreamingDedup: end-to-end throughput of the
  * incremental LSH near-dup detector over the real documents corpus,
  * driven as a FILE STREAM in bounded micro-batches (the corpus parquet is
  * re-chunked to SPARK_GRAFT_CHUNKS files and consumed one file per
  * trigger, so the detector exercises cross-batch state exactly as it
  * would against a live feed — not one giant batch).
  *
  * Prints docs/sec and the candidate-emission count; recorded in
  * BASELINE.md. The emission count is bounded by arrivals × maxPerBucket
  * × bands by construction (the ring cap), which is the number to check
  * against: this corpus's 30-word vocabulary makes most docs near-dup
  * (the batch path measured ~34% of ALL pairs at J >= 0.75), so the
  * detector runs at its worst-case emission regime here.
  */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "8").toInt
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-stream-dedup-probe")

    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target/graft-scratch"), "sdp").toFile.getAbsolutePath
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    docs.repartition(chunks).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val pairs = graft.streaming.StreamingDedup.candidatePairs(stream)

    var emissions = 0L
    var batches = 0
    val t0 = System.nanoTime()
    val q = pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.StreamingDedup.CandPair], _: Long) =>
        emissions += df.count(); batches += 1
      }
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stream-dedup-probe] sfDir=$sfDir docs=$nDocs chunks=$chunks batches=$batches " +
      f"wall=$secs%.1f s throughput=${nDocs / secs}%.0f docs/s emissions=$emissions")
    spark.stop()
  }
}
