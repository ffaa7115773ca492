package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Merge-on-read UPDATE cost probe — the measured evidence for the
  * round-15 DV-update design (r14 verdict #1): a row-level UPDATE of a
  * few scattered rows should cost ∝ matched rows (one sidecar + one
  * delta-file batch), while the copy-on-write shape re-copies every
  * touched partition's bytes. Both modes run the REAL surfaces:
  *
  *   - `dv`: the SQL statement `UPDATE graft.t SET … WHERE k IN (…)`
  *     through GraftDml's merge-on-read path (partition-misaligned
  *     predicate → positionScan + updateRows);
  *   - `cow`: the r14 shape — CASE-WHEN rewrite of every touched
  *     partition via SnapshotStore.replaceWhere (scattered keys touch
  *     all 7 l_linenumber partitions, the worst case a user-id update
  *     hits).
  *
  * Measures per mode: update wall seconds, data+sidecar bytes written by
  * the commit, post-update full-read wall (the merge-on-read tax), and
  * post-compact read wall (after materialization).
  *
  * Usage: runMain graft.UpdateProbe [sfDir] [modes] — modes a comma list
  * of cow,dv (default both; the sf100 run is disk-bounded one mode at a
  * time: a mode's table tree peaks at ~3 table copies + compact spill).
  * Output: one CSV line per mode for the BASELINE.md table.
  */
object UpdateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf1")
    val modes = args.drop(1).headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("cow", "dv"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-upd-probe")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
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

    val catRoot = Files.createTempDirectory(Paths.get("target"), "upd_probe_cat_")
    spark.conf.set("spark.sql.catalog.updp",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.updp.root", catRoot.toString)

    println("mode,rows,matched,update_s,bytes_written_mb,read_after_s,read_after_compact_s")
    modes.foreach { mode =>
      val root = catRoot.resolve(s"t_$mode").toString
      SnapshotStore.overwrite(li, root, Some("l_linenumber"))
      val rows = SnapshotStore.read(spark, root).count()
      val matched = SnapshotStore.read(spark, root).filter(pred).count()
      val b0 = treeBytes(Paths.get(root, "data")) + treeBytes(Paths.get(root, "_dv"))
      val t0 = System.nanoTime()
      if (mode == "dv") {
        spark.sql(s"UPDATE updp.t_dv SET l_quantity = l_quantity + 1 " +
          s"WHERE l_orderkey IN (${victims.mkString(",")})")
      } else {
        // The r14 copy-on-write shape: rewrite every touched partition
        // with the assignment applied via CASE WHEN.
        val base = SnapshotStore.currentVersion(root).get
        val df = SnapshotStore.read(spark, root, Some(base))
        val parts = df.filter(pred).select(col("l_linenumber")).distinct()
          .collect().map(_.get(0)).toSeq
        val outCols = df.columns.toSeq.map { c =>
          (if (c == "l_quantity") when(pred, col(c) + 1).otherwise(col(c))
           else col(c)).as(c)
        }
        SnapshotStore.replaceWhere(spark, root, base,
          df.filter(SnapshotStore.partitionIn("l_linenumber", parts))
            .select(outCols: _*), Some(parts))
      }
      val updS = (System.nanoTime() - t0) / 1e9
      val written = treeBytes(Paths.get(root, "data")) +
        treeBytes(Paths.get(root, "_dv")) - b0
      val t1 = System.nanoTime()
      val sumQ: Any = SnapshotStore.read(spark, root)
        .agg(sum(col("l_quantity"))).head().get(0)
      val readS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      SnapshotStore.compact(spark, root, "l_linenumber")
      val compS = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val sumQ2: Any = SnapshotStore.read(spark, root)
        .agg(sum(col("l_quantity"))).head().get(0)
      val readCompS = (System.nanoTime() - t3) / 1e9
      require(sumQ2 == sumQ, s"compact changed content: $sumQ2 vs $sumQ")
      println(f"$mode,$rows,$matched,$updS%.2f,${written / 1048576.0}%.1f," +
        f"$readS%.2f,$readCompS%.2f  (compact_s=$compS%.2f)")
      // A mode's table is ~the corpus size — drop it before the next mode
      // builds (the sf100 run has no room for two copies + probe history).
      val walk = Files.walk(Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally walk.close()
    }
    spark.stop()
  }
}
