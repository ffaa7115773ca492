package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
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

  /** MERGE-style keyed upsert into a hive-partitioned parquet table —
    * the batch dimension-refresh pattern a transactional format's MERGE
    * INTO provides, expressed with dynamic partition overwrite (no Delta/
    * Iceberg on this classpath; this is the stock-Spark equivalent and
    * its real-world precursor).
    *
    * Shape: (1) the update set names its affected partitions (a distinct
    * over the KB-sized partition column values, broadcast); (2) ONLY
    * those partitions of the target are read back (left-semi on the
    * partition key → partition pruning; untouched partitions are never
    * opened); (3) surviving rows = affected-partition rows whose key is
    * NOT updated (left-anti); (4) survivors ∪ updates rewrite with
    * partitionOverwriteMode=dynamic, which replaces exactly the affected
    * partition directories and leaves every other directory's files
    * physically untouched (SinkSpec asserts byte-identical mtimes).
    *
    * At 100 TB the cost is proportional to the touched partitions, not
    * the table — the same contract MERGE INTO gives, minus snapshot
    * isolation (readers racing the swap can see a partial partition; a
    * table format adds the atomic commit on top of this exact layout).
    * The localCheckpoint materializes the merged partitions BEFORE the
    * overwrite (Spark refuses a write whose plan still scans the
    * destination); it holds only the affected-partition slice.
    *
    * CONTRACT (narrower than MERGE INTO): a key may NOT change partition.
    * Survivors are anti-joined only within the updates' partition values,
    * so an update row whose key currently lives in a DIFFERENT partition
    * would leave the old row untouched → duplicate key. Real MERGE pays a
    * full-target key scan to handle that; partitioned upserts (Hive-style
    * date/region dims) don't need it because the partition value is part
    * of the key's identity. `validateKeyPartition = true` opts into the
    * check — a 2-column (key, partition) scan of the FULL target that
    * throws on any partition-crossing update. Off by default because the
    * scan is table-sized; turn it on for dim-table refreshes, leave it off
    * when the writer pipeline guarantees partition stability.
    */
  def mergeIntoPartitioned(spark: org.apache.spark.sql.SparkSession,
                           path: String, updates: DataFrame,
                           keyCol: String, partCol: String,
                           validateKeyPartition: Boolean = false): Unit = {
    val target = spark.read.parquet(path)
    val cols = target.columns.map(col).toSeq
    if (validateKeyPartition) {
      val crossers = target.select(col(keyCol), col(partCol).as("__old_part"))
        .join(broadcast(updates.select(col(keyCol), col(partCol))), Seq(keyCol))
        .filter(col("__old_part") =!= col(partCol))
        .limit(1).collect()
      require(crossers.isEmpty,
        s"mergeIntoPartitioned: update moves key ${crossers.head.get(0)} " +
          s"from partition ${crossers.head.get(1)} to ${crossers.head.get(2)}; " +
          "partition-crossing updates are outside this sink's contract")
    }
    val parts = updates.select(col(partCol)).distinct()
    val affected = target.join(broadcast(parts), Seq(partCol), "left_semi")
    val survivors = affected
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
    val merged = survivors.select(cols: _*)
      .unionByName(updates.select(cols: _*))
      .localCheckpoint(true)
    // per-write option, NOT a session-conf mutation: a concurrent write in
    // the same session must not inherit dynamic overwrite from this merge.
    merged.write.partitionBy(partCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
  }

  /** Spread the low 16 bits of a non-negative long across the even bit
    * positions (the classic Morton magic-mask cascade) — 5 codegen'd
    * bitwise ops, no UDF.
    */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit bucket ids: bit 2i is a's bit i, bit
    * 2i+1 is b's bit i. Adjacent z values stay adjacent in BOTH key
    * dimensions, which is what gives every output file a narrow min/max
    * range on each column simultaneously.
    */
  def zorderKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** How many bits of each of `n` interleaved keys fit a positive long:
    * 16 for the 2-ary fast path, 63/n beyond (e.g. 3 cols → 21 bits each,
    * finer than the 2-ary grid; 4 → 15). The bucket quantization uses the
    * SAME width, so every bit the key carries is a real locality bit.
    */
  private[graft] def zorderBits(n: Int): Int =
    if (n == 2) 16 else 63 / n

  /** k-ary Morton key: bit j of column i lands at position j*n + i — the
    * round-robin interleave, reducing to [[zorderKey]]'s layout at n = 2
    * (which stays on the 5-op magic-mask cascade; the general form is a
    * bits×n tree of codegen'd shifts/ors, still zero UDFs). Inputs are
    * bucket ids in [0, 2^zorderBits(n)).
    */
  def zorderKeyN(cols: Seq[Column]): Column = {
    require(cols.length >= 2, "zorderKeyN needs at least two columns")
    if (cols.length == 2) zorderKey(cols.head, cols(1))
    else {
      val n = cols.length
      val bits = zorderBits(n)
      cols.zipWithIndex.map { case (c, i) =>
        (0 until bits).map { j =>
          shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i): Column
        }.reduce(_.bitwiseOR(_))
      }.reduce(_.bitwiseOR(_))
    }
  }

  /** Z-ORDER clustered write — the multi-column locality layout (the
    * lakehouse OPTIMIZE ZORDER BY): rows are range-partitioned and sorted
    * by the Morton interleave of both keys' 16-bit quantile buckets, so
    * EVERY output file carries a narrow parquet min/max range on EACH
    * column. A single-key sort gives perfect pruning on that key and none
    * on the second; z-order gives ~sqrt-grid pruning on both — at 100 TB
    * this is the difference between a secondary-key point lookup scanning
    * every row group and scanning a few percent (SinkSpec measures the
    * candidate-file shrink on real data; partition-level DPP and this are
    * complementary layers: directories prune first, then file/row-group
    * stats).
    *
    * The per-column max for bucketing comes from one tiny stats aggregate
    * (driver-controlled single-row action — the layout job is offline by
    * definition, the AnnIvf build precedent). Keys must be non-negative.
    */
  def writeZordered(df: DataFrame, colA: String, colB: String, path: String,
                    numFiles: Int): Unit = {
    val r = df.agg(max(col(colA)).cast("long").as("ma"),
      max(col(colB)).cast("long").as("mb")).head()
    val (ma, mb) = (r.getLong(0), r.getLong(1))
    val bucketA = (col(colA).cast("long") * 65536L / (ma + 1L)).cast("long")
    val bucketB = (col(colB).cast("long") * 65536L / (mb + 1L)).cast("long")
    df.withColumn("_z", zorderKey(bucketA, bucketB))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
