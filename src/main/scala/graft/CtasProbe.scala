package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Streamed-overwrite (CTAS) cost probe — the measured evidence for the
  * round-16 block-store-pin removal (r15 weak #1): `SnapshotStore
  * .overwrite` used to `localCheckpoint(true)` the FULL content so a
  * second count() action agreed with the write (block-store rows are
  * ~3× data size — r13 forensics — so a 100 TB initial load would OOM
  * the block store before the write finished). It now streams straight
  * into the commit's parquet files and takes the manifest row count from
  * the written footers.
  *
  * Measures, per run: the snapshot CTAS wall vs a PLAIN
  * `df.write.partitionBy().parquet()` of the same content and layout
  * (the floor — the snapshot layer should add manifest math, not a
  * second data pass), bytes written, exact footer row count, and the
  * block-store residency after the commit (must be zero).
  *
  * Usage: runMain graft.CtasProbe [sfDir] — one CSV line for BASELINE.md.
  */
object CtasProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = Sessions.autoShufflePartitions(sfDir, cpus.toInt)
    val spark = Sessions.build(s"local[$cpus]", shuffleParts, "graft-ctas-probe")
    val li = Tables.lineitem(spark, sfDir)

    def treeBytes(p: java.nio.file.Path): Long = {
      if (!Files.isDirectory(p)) return 0L
      val it = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.filter(Files.isRegularFile(_))
          .map(Files.size).sum
      } finally it.close()
    }
    def drop(p: java.nio.file.Path): Unit = {
      if (!Files.isDirectory(p)) return
      val it = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally it.close()
    }

    val scratch = Files.createTempDirectory(Paths.get("target"), "ctas_probe_")
    // floor: plain partitioned parquet of the same content
    val plainDir = scratch.resolve("plain")
    val tPlain0 = System.nanoTime()
    li.withColumn("__part", col("l_linenumber")).write
      .partitionBy("__part").parquet(plainDir.toString)
    val plainS = (System.nanoTime() - tPlain0) / 1e9
    val plainMb = treeBytes(plainDir) / 1e6
    drop(plainDir) // one table copy on disk at a time (sf100 hygiene)

    // the snapshot CTAS under test
    val root = scratch.resolve("snap").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tSnap0 = System.nanoTime()
    val v = SnapshotStore.overwrite(li, root, Some("l_linenumber"))
    val snapS = (System.nanoTime() - tSnap0) / 1e9
    val pinned = (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    val rows = SnapshotStore.rowsAt(root, v)
    val snapMb = treeBytes(Paths.get(root)) / 1e6
    val readBack = SnapshotStore.read(spark, root).count()
    require(readBack == rows, s"manifest row count $rows != read-back $readBack")
    drop(Paths.get(root))
    Files.deleteIfExists(scratch)

    println("rows,plain_write_s,plain_mb,snapshot_ctas_s,snapshot_mb,pinned_rdds")
    println(f"$rows,$plainS%.2f,$plainMb%.1f,$snapS%.2f,$snapMb%.1f,$pinned")
    spark.stop()
  }
}
