package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** The transactional contract of the manifest-based snapshot store:
  * atomic commits, reader isolation (a pinned version is immune to later
  * commits), time travel, optimistic-concurrency conflict, merge
  * equivalence with the non-transactional sink, and vacuum safety.
  */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scratch(prefix: String): String = {
    val b = Paths.get("target/graft-scratch")
    Files.createDirectories(b)
    Files.createTempDirectory(b, prefix).toString
  }

  private def base = Tables.customer(spark, TestSpark.sf0001)
    .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))

  test("overwrite + read round-trip; append adds; versions are time travel") {
    import spark.implicits._
    val root = scratch("snap_rt_")
    val v0 = SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    assert(v0 == 0L)
    assert(SnapshotStore.read(spark, root).count() == base.count())

    val extra = Seq((900001L, 3L, "NEW"), (900002L, 4L, "NEW"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val v1 = SnapshotStore.append(extra, root, Some("c_nationkey"))
    assert(v1 == 1L)
    assert(SnapshotStore.read(spark, root).count() == base.count() + 2)
    // time travel: v0 still reads the original content exactly
    assert(SnapshotStore.read(spark, root, Some(v0)).count() == base.count())
    assert(SnapshotStore.versions(root) == Seq(0L, 1L))
  }

  test("merge: same content as the non-transactional sink; old version intact (isolation)") {
    import spark.implicits._
    val root = scratch("snap_merge_")
    val v0 = SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val victims = base.filter(col("c_nationkey") === 3L)
      .select(col("c_custkey")).as[Long].take(2).toSeq
    val updates = (victims.map(k => (k, 3L, "MERGED")) :+ ((999999L, 3L, "MERGED")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")

    // The reader's snapshot, pinned BEFORE the merge commits.
    val pinnedFiles = SnapshotStore.filesAt(root, v0)

    val v1 = SnapshotStore.merge(spark, root, updates, "c_custkey", "c_nationkey")
    assert(v1 == v0 + 1)

    // New version ≡ reference merge.
    val expect = base.join(updates.select(col("c_custkey")), Seq("c_custkey"), "left_anti")
      .unionByName(updates)
    val got = SnapshotStore.read(spark, root)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0)

    // ISOLATION: every file of the pinned version still exists and the old
    // version still reads the ORIGINAL content — the merge replaced the
    // manifest, not the bytes.
    pinnedFiles.foreach(f => assert(Files.exists(Paths.get(f)), s"$f deleted by commit"))
    val old = SnapshotStore.read(spark, root, Some(v0))
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    assert(old.exceptAll(base).count() == 0 && base.exceptAll(old).count() == 0)
  }

  test("racing commits: exactly one wins, the loser gets a conflict") {
    import spark.implicits._
    val root = scratch("snap_race_")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val upd = Seq((999998L, 5L, "A")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    // Both writers read version 0. Writer A commits v1 through the public
    // surface; writer B — which computed its file set against v0 and
    // therefore also targets v1 — must get a conflict at publish time,
    // never a silent clobber or a double-commit. B's publish step is the
    // package-private commit(), exactly what merge() calls last.
    val first = SnapshotStore.merge(spark, root, upd, "c_custkey", "c_nationkey")
    assert(first == 1L)
    val e = intercept[SnapshotStore.SnapshotConflictException] {
      SnapshotStore.commit(root, 1L, Seq("never-written/part-0.parquet"), -1L)
    }
    assert(e.getMessage.contains("already committed"))
    // the conflict left the store intact: v1 is still writer A's commit
    assert(SnapshotStore.versions(root) == Seq(0L, 1L))
  }

  test("merge refuses a base snapshot not hive-partitioned by partCol") {
    import spark.implicits._
    val root = scratch("snap_guard_")
    SnapshotStore.overwrite(base, root, None) // partCol as a data column
    val upd = Seq((1L, 3L, "X")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.merge(spark, root, upd, "c_custkey", "c_nationkey")
    }
    assert(e.getMessage.contains("partitioned base snapshot"))
  }

  test("manifest stats: key-range read skips disjoint files, content identical to a filter") {
    import spark.implicits._
    val root = scratch("snap_stats_")
    // Range-partition by the stats key so each data file carries a narrow
    // [min,max] — the layout a sorted/z-ordered table has, where manifest
    // pruning pays off.
    val sorted = base.repartitionByRange(8, col("c_custkey"))
      .sortWithinPartitions(col("c_custkey"))
    val v0 = SnapshotStore.overwrite(sorted, root, Some("c_nationkey"),
      declareStatsCol = Some("c_custkey"))

    val all = SnapshotStore.prunedFiles(root, v0)
    val hit = SnapshotStore.prunedFiles(root, v0, keyRange = Some((10L, 20L)))
    assert(hit.nonEmpty && hit.size < all.size / 2,
      s"expected narrow-range pruning: ${hit.size} of ${all.size} files")

    // pruned read ≡ filtered full read (pruning must be sound, not just tight)
    val pruned = SnapshotStore.read(spark, root, keyRange = Some((10L, 20L)))
      .filter(col("c_custkey").between(10, 20))
    val full = SnapshotStore.read(spark, root)
      .filter(col("c_custkey").between(10, 20))
    assert(pruned.exceptAll(full).count() == 0 && full.exceptAll(pruned).count() == 0)

    // merge: kept files carry their ranges forward, new files get fresh ones
    val upd = Seq((999995L, 3L, "S1")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val v1 = SnapshotStore.merge(spark, root, upd, "c_custkey", "c_nationkey")
    val hi = SnapshotStore.prunedFiles(root, v1, keyRange = Some((999995L, 999995L)))
    assert(hi.nonEmpty, "the merged-in key's file must survive its own range probe")
    assert(SnapshotStore.read(spark, root, Some(v1), keyRange = Some((999995L, 999995L)))
      .filter(col("c_custkey") === 999995L).count() == 1)
    // and the carried-forward stats still prune the untouched low range
    val hitV1 = SnapshotStore.prunedFiles(root, v1, keyRange = Some((10L, 20L)))
    assert(hitV1.size < SnapshotStore.prunedFiles(root, v1).size / 2)
  }

  test("vacuum drops unreferenced files, keeps retained versions readable") {
    import spark.implicits._
    val root = scratch("snap_vac_")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val upd = Seq((999997L, 3L, "V1")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    SnapshotStore.merge(spark, root, upd, "c_custkey", "c_nationkey")
    val upd2 = Seq((999996L, 4L, "V2")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    SnapshotStore.merge(spark, root, upd2, "c_custkey", "c_nationkey")
    val v0Files = SnapshotStore.filesAt(root, 0L)

    SnapshotStore.vacuum(root, keepVersions = 2)

    assert(SnapshotStore.versions(root) == Seq(1L, 2L))
    // v1 and v2 must both still read fully
    assert(SnapshotStore.read(spark, root, Some(1L)).count() == base.count() + 1)
    assert(SnapshotStore.read(spark, root, Some(2L)).count() == base.count() + 2)
    // some v0-only file is gone (the rewritten nation-3 partition's originals)
    val survivors = SnapshotStore.filesAt(root, 1L).toSet ++
      SnapshotStore.filesAt(root, 2L).toSet
    val v0Only = v0Files.filterNot(survivors.contains)
    assert(v0Only.nonEmpty && v0Only.forall(f => !Files.exists(Paths.get(f))),
      "vacuum must delete exactly the unreferenced files")
  }
}
