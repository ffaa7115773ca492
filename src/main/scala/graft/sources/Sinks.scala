package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output layout levers for the 100 TB posture (SURVEY §7.4: "writes
  * partitioned by date key"). Hive-style partition directories turn date
  * predicates into partition PRUNING on every later read — the scan never
  * opens non-matching files, which is the difference between reading one
  * day and reading three years.
  */
object Sinks {

  /** Write parquet partitioned by the date of `dateCol` (directory per day). */
  def writePartitionedByDate(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

  /** Write parquet partitioned by an arbitrary existing column. */
  def writePartitionedBy(df: DataFrame, partCol: String, path: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Save as a BUCKETED catalog table: rows are hash-distributed into
    * `numBuckets` files by `bucketCol` and sorted within each bucket. Two
    * tables bucketed the same way join WITHOUT any shuffle — at 100 TB this
    * turns the nightly fact-fact join from the dominant exchange into a
    * zip of pre-sorted files (SinkSpec proves the exchange-free plan).
    */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction — the maintenance job every long-lived 100 TB
    * dataset needs: streaming/micro-batch ingestion leaves thousands of
    * KB-sized files per partition, and file-open overhead (listing, footer
    * reads, one task per tiny split) comes to dominate scans. Rewrite to
    * `targetFiles` outputs; `sortCols` optionally sorts WITHIN each output
    * file so later range predicates skip whole row groups via parquet
    * min/max stats. repartition (not coalesce): coalesce would chain the
    * upstream read parallelism to the output file count, and compaction
    * wants a full shuffle anyway for even file sizes.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFiles: Int, sortCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(path)
    val re = df.repartition(targetFiles)
    val out = if (sortCols.isEmpty) re
      else re.sortWithinPartitions(sortCols.map(col): _*)
    // parquet reads resolve splits eagerly at plan time, so the rewrite can
    // target a sibling dir and swap via overwrite-read ordering… at this
    // layer we keep it simple and explicit: write to `path + ".compact"`,
    // leaving the atomic swap to the caller's table format / orchestrator.
    out.write.mode("overwrite").parquet(path + ".compact")
  }
}
