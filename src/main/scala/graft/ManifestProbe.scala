package graft

import java.nio.file.{Files, Paths}
import graft.sources.SnapshotStore

/** Driver-cost probe for the snapshot manifest at large file counts
  * (SURVEY §7.4b honesty item): a 100 TB table at 256 MB/file is ~400k
  * files, so the flat-manifest design must price its parse/commit path
  * at 1e5–1e6 entries, not leg scale. Measures, per entry count:
  * commit (render + atomic create), filesAt (read + parse), and
  * changedFiles (two parses + set diff) — all driver-side, no Spark.
  *
  * Output: one "entries,commit_ms,read_ms,diff_ms,manifest_mb" CSV line
  * per size on stdout (best of 3 after 1 warmup), for the BASELINE.md
  * table.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(10000, 100000, 1000000)
    // Flat layout first, then the sectioned layout at the same sizes —
    // the threshold is forced to engage/disengage explicitly so both
    // shapes are measured at every count.
    println("layout,entries,commit_ms,touched_commit_ms,read_ms,pruned_read_ms,diff_ms,root_manifest_mb")
    Seq(("flat", Int.MaxValue), ("sectioned", 1)).foreach { case (layout, thr) =>
      SnapshotStore.sectionThreshold = thr
      sizes.foreach { n => probeOne(layout, n) }
    }
  }

  private def probeOne(layout: String, n: Int): Unit = {
      val root = Files.createTempDirectory("manifest_probe_").toString
      // Realistic entry shape: commit-uuid dir / hive partition / parquet
      // part file (~90 chars, matching what writeDataFiles records).
      val uuid = java.util.UUID.randomUUID().toString
      def files(offset: Int) = (0 until n).map(i =>
        f"$uuid/__part=${i % 256}/part-$i%05d-${(i + offset) * 2654435761L}%x.c000.snappy.parquet")
      def best(reps: Int)(body: => Unit): Double = {
        body // warmup
        (0 until reps).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
        }.min
      }
      val fs0 = files(0)
      var v = -1L
      val commitMs = best(3) {
        v += 1
        SnapshotStore.commit(root, v, fs0, n.toLong)
      }
      val readMs = best(3) {
        val got = SnapshotStore.filesAt(root, v)
        require(got.length == n)
      }
      // Partition-pruned candidate listing: 1 of 256 partitions — the
      // lazy win the sectioned layout exists for.
      val prunedMs = best(3) {
        val got = SnapshotStore.prunedFiles(root, v, Some(Set("7")))
        require(got.nonEmpty)
      }
      // A touched-partition commit: the first partition group's entries
      // replaced (~1/256 of files) — the incremental write/diff shape.
      val touched = fs0.filter(_.contains("__part=7/"))
      val fs1 = fs0.filterNot(_.contains("__part=7/")) ++
        files(1).filter(_.contains("__part=7/"))
      val vBase = v // last fs0 commit; vBase+1 is the first fs1 commit
      val touchedCommitMs = best(3) {
        v += 1
        SnapshotStore.commit(root, v, fs1, n.toLong)
      }
      val diffMs = best(3) {
        val (a, r) = SnapshotStore.changedFiles(root, vBase, vBase + 1)
        require(a.length == touched.length && r.length == touched.length,
          s"${a.length} vs ${touched.length}")
      }
      val mb = Files.size(Paths.get(root, "_manifests", f"v$v%013d.json")) / 1e6
      println(f"$layout,$n,$commitMs%.1f,$touchedCommitMs%.1f,$readMs%.1f,$prunedMs%.1f,$diffMs%.1f,$mb%.2f")
      // best-effort cleanup
      import scala.jdk.CollectionConverters._
      val it = Files.walk(Paths.get(root))
      try it.iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
      finally it.close()
  }
}
