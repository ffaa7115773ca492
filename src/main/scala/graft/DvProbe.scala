package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Deletion-vector vs rewrite DELETE cost probe — the measured evidence
  * for the DV design's 100 TB claim: a GDPR-style delete of a few
  * scattered rows should cost ∝ matching rows (one KB-sized sidecar),
  * while the rewrite path re-copies every touched partition. Measures,
  * on the same lineitem snapshot table partitioned by `l_linenumber`
  * (7 partitions, so scattered keys touch ALL of them — the worst case
  * a user-id delete hits):
  *
  *   - delete wall seconds (rewrite vs DV)
  *   - data+sidecar bytes written by the delete commit
  *   - post-delete full-read wall (the merge-on-read tax DV pays)
  *   - post-compact read wall (the tax after materialization)
  *
  * Usage: runMain graft.DvProbe [sfDir] (default localdata/sf1).
  * Output: one CSV line per mode for the BASELINE.md table.
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-dv-probe")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
    // ~100 scattered victim keys (a fixed modulus spreads them across the
    // whole key range), so the rewrite path must touch every partition.
    val victims = li.select(col("l_orderkey")).distinct()
      .filter(pmod(col("l_orderkey"), lit(59999)) === 7)
      .limit(100).collect().map(_.getLong(0)).toSeq
    require(victims.size >= 20, s"need scattered victims, got ${victims.size}")
    val pred = col("l_orderkey").isin(victims: _*)

    def treeBytes(p: java.nio.file.Path): Long = {
      if (!Files.isDirectory(p)) return 0L
      val it = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.filter(Files.isRegularFile(_))
          .map(Files.size).sum
      } finally it.close()
    }

    println("mode,rows,delete_s,bytes_written_mb,read_after_s,read_after_compact_s")
    Seq("rewrite", "dv").foreach { mode =>
      val root = Files.createTempDirectory(
        Paths.get("target"), s"dv_probe_${mode}_").toString
      SnapshotStore.overwrite(li, root, Some("l_linenumber"))
      val rows = SnapshotStore.read(spark, root).count()
      val b0 = treeBytes(Paths.get(root, "data")) + treeBytes(Paths.get(root, "_dv"))
      val t0 = System.nanoTime()
      SnapshotStore.delete(spark, root, pred,
        partCol = if (mode == "rewrite") Some("l_linenumber") else None,
        deletionVectors = mode == "dv")
      val delS = (System.nanoTime() - t0) / 1e9
      val written = treeBytes(Paths.get(root, "data")) +
        treeBytes(Paths.get(root, "_dv")) - b0
      val t1 = System.nanoTime()
      val after = SnapshotStore.read(spark, root).count()
      val readS = (System.nanoTime() - t1) / 1e9
      require(after < rows, s"delete must remove rows ($after vs $rows)")
      SnapshotStore.compact(spark, root, "l_linenumber")
      val t2 = System.nanoTime()
      require(SnapshotStore.read(spark, root).count() == after)
      val readCompS = (System.nanoTime() - t2) / 1e9
      println(f"$mode,$rows,$delS%.2f,${written / 1048576.0}%.1f,$readS%.2f,$readCompS%.2f")
    }
    spark.stop()
  }
}
