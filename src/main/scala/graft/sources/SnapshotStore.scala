package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated table layout over plain parquet — the transactional
  * core a lakehouse format (Iceberg/Delta) adds on top of exactly the
  * directory shape `Sinks` writes, built here from first principles
  * because neither format is on this classpath.
  *
  * The mechanism is the standard one:
  *
  *   - DATA FILES ARE IMMUTABLE. Every write lands under
  *     `table/data/<commitUuid>/…` and is never modified or deleted by a
  *     later commit (until an explicit vacuum).
  *   - A MANIFEST names the exact file set of one table version:
  *     `table/_manifests/v<13-digit>.json` → list of data-file paths
  *     relative to the table root (+ row count, for audit).
  *   - COMMIT = create-exclusive of the next manifest. `CREATE_NEW` is
  *     atomic on POSIX (and maps to the atomic variants object stores /
  *     HDFS offer); two racing writers race for the same version number
  *     and exactly one wins — the loser gets a
  *     [[SnapshotConflictException]] and must re-read + retry (optimistic
  *     concurrency, no locks).
  *   - READ pins a version: list manifests once, take the max (or an
  *     explicit `asOf`), then read ONLY that manifest's files. A reader
  *     never observes a half-written commit — uncommitted data files are
  *     invisible because no manifest names them, and replaced files stay
  *     readable because commits never delete. This is the isolation
  *     `Sinks.mergeIntoPartitioned` documents it lacks.
  *
  * Scale posture: a commit writes the NEW data files plus one manifest
  * (KBs–MBs of file names), never rewrites history; a read adds one
  * directory listing + one manifest parse over the plain-parquet cost.
  * Partition-grained replacement keeps merge cost proportional to touched
  * partitions, same as the non-transactional sink. What a real format
  * adds beyond this core — column stats per file, manifest trees for
  * million-file tables, catalog-level atomicity across tables — is noted
  * in SURVEY §7.4; the isolation/time-travel/conflict contract is fully
  * here and spec-gated (SnapshotStoreSpec).
  */
object SnapshotStore {

  final class SnapshotConflictException(msg: String) extends RuntimeException(msg)

  private val ManifestDir = "_manifests"

  private def manifestPath(root: String, version: Long): Path =
    Paths.get(root, ManifestDir, f"v$version%013d.json")

  /** All committed versions, ascending (empty for a non-table path). */
  def versions(root: String): Seq[Long] = {
    val dir = Paths.get(root, ManifestDir)
    if (!Files.isDirectory(dir)) return Nil
    val it = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted
    } finally it.close()
  }

  def currentVersion(root: String): Option[Long] = versions(root).lastOption

  /** Minimal JSON codec for the manifest — a sorted path list plus row
    * count, plus (optionally) per-file [min,max] ranges of ONE integral
    * stats column — the file-skipping layer a table format keeps in its
    * manifests. `stats` precedes `files` in the rendering on purpose:
    * [[parseManifest]] treats everything after `"files":[` as file
    * entries. Paths are table-root-relative so the table directory can
    * be moved/renamed wholesale.
    */
  private def renderManifest(files: Seq[String], rows: Long,
                             stats: Option[(String, Map[String, (Long, Long)])]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val statsJson = stats.fold("") { case (c, ranges) =>
      ranges.toSeq.sortBy(_._1)
        .map { case (f, (lo, hi)) => s"${q(f)}:[$lo,$hi]" }
        .mkString(s""""stats":{"col":${q(c)},"ranges":{""", ",", "}},")
    }
    files.sorted.map(q).mkString(s"""{"rows":$rows,$statsJson"files":[""", ",", "]}")
  }

  /** Per-file [lo,hi] ranges of the table's stats column at `version`
    * (empty when the table declares none). Keys are root-relative paths.
    */
  private[graft] def statsAt(root: String, version: Long): Map[String, (Long, Long)] = {
    val txt = new String(Files.readAllBytes(manifestPath(root, version)),
      StandardCharsets.UTF_8)
    val start = txt.indexOf("\"ranges\":{")
    if (start < 0) return Map.empty
    val region = txt.substring(start, txt.indexOf("\"files\":["))
    "\"([^\"]+)\":\\[(-?\\d+),(-?\\d+)\\]".r.findAllMatchIn(region)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong)).toMap
  }

  /** The declared stats column (table-level config, set once at create). */
  def statsCol(root: String): Option[String] = {
    val p = Paths.get(root, ManifestDir, "stats_col")
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  /** [lo,hi] of an integral column across one parquet file, from its
    * FOOTER only (no data read; parquet-hadoop ships with Spark). None if
    * the column is missing, non-integral, or all-null in the file — such
    * files are never skipped.
    */
  private def fileRange(abs: Path, colName: String): Option[(Long, Long)] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(abs.toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val ranges = r.getFooter.getBlocks.asScala.toSeq.flatMap { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == colName).flatMap { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) None
          else (st.genericGetMin, st.genericGetMax) match {
            case (mn: Number, mx: Number) => Some((mn.longValue, mx.longValue))
            case _ => None
          }
        }
      }
      if (ranges.isEmpty) None
      else Some((ranges.map(_._1).min, ranges.map(_._2).max))
    } finally r.close()
  }

  private def statsFor(root: String, files: Seq[String]): Option[(String, Map[String, (Long, Long)])] =
    statsCol(root).map { c =>
      c -> files.flatMap(f =>
        fileRange(Paths.get(root, "data", f), c).map(f -> _)).toMap
    }

  private def parseManifest(root: String, version: Long): Seq[String] = {
    val txt = new String(Files.readAllBytes(manifestPath(root, version)),
      StandardCharsets.UTF_8)
    // Scope to the files ARRAY before extracting quoted strings — the
    // object keys ("rows", "files") are quoted too. File entries are
    // uuid/partition/part-file names: no quotes or escapes inside,
    // enforced at write time (writeDataFiles controls every component).
    val arr = txt.substring(txt.indexOf("\"files\":[") + "\"files\":[".length)
    "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(arr).map(_.group(1)).toSeq
  }

  /** Data-file paths (absolute) of one version. */
  def filesAt(root: String, version: Long): Seq[String] =
    parseManifest(root, version).map(rel => Paths.get(root, "data", rel).toString)

  /** Write `df` as immutable parquet under a fresh commit dir; return the
    * root-relative file paths. One parquet directory per commit — the
    * files inside get parquet's own part-file names.
    *
    * Partitioned commits write a SHADOW `__part` directory column and keep
    * the user's column in the data files: reads are then plain multi-path
    * scans (no cross-commit partition inference — Spark rejects key=value
    * dirs nested under differing commit uuids), and partition pruning
    * happens at the MANIFEST level ([[read]]'s partValues) — file-list
    * pruning before the scan, the same layer a table format prunes at.
    */
  private def writeDataFiles(df: DataFrame, root: String,
                             partCol: Option[String]): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString
    val dir = Paths.get(root, "data", commitId)
    val w = partCol match {
      case Some(c) => df.withColumn("__part", col(c)).write.mode("error")
        .partitionBy("__part")
      case None => df.write.mode("error")
    }
    w.parquet(dir.toString)
    import scala.jdk.CollectionConverters._
    val it = Files.walk(dir)
    try it.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => Paths.get(root, "data").relativize(p).toString)
      .toSeq
    finally it.close()
  }

  /** Atomically publish `files` as version `next`. Throws
    * [[SnapshotConflictException]] if another writer committed `next`
    * first — the caller's read-compute-commit cycle must restart from the
    * new current version (its survivor set may be stale).
    */
  private[graft] def commit(root: String, next: Long, files: Seq[String],
                            rows: Long,
                            stats: Option[(String, Map[String, (Long, Long)])] = None): Long = {
    val p = manifestPath(root, next)
    Files.createDirectories(p.getParent)
    val body = renderManifest(files, rows, stats).getBytes(StandardCharsets.UTF_8)
    try {
      Files.write(p, body, StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new SnapshotConflictException(
          s"version $next already committed by a concurrent writer at $root")
    }
  }

  /** Create the table (or replace its content wholesale) with a new
    * snapshot. Returns the committed version.
    */
  def overwrite(df: DataFrame, root: String,
                partCol: Option[String] = None,
                declareStatsCol: Option[String] = None): Long = {
    declareStatsCol.foreach { c =>
      val p = Paths.get(root, ManifestDir, "stats_col")
      Files.createDirectories(p.getParent)
      Files.write(p, c.getBytes(StandardCharsets.UTF_8))
    }
    val counted = df.localCheckpoint(true) // pin rows so count+write agree
    val files = writeDataFiles(counted, root, partCol)
    val next = currentVersion(root).getOrElse(-1L) + 1
    commit(root, next, files, counted.count(), statsFor(root, files))
  }

  /** Append-only commit: previous snapshot's files plus the new ones.
    * (rows = -1: the manifest's row count is audit metadata for full
    * snapshots; incremental commits don't re-count history.)
    */
  def append(df: DataFrame, root: String,
             partCol: Option[String] = None): Long = {
    val base = currentVersion(root)
    val conformed = base.fold(df) { v =>
      conform(df, read(df.sparkSession, root, Some(v)).schema)
    }
    val files = writeDataFiles(conformed, root, partCol)
    val prev = base.map(parseManifest(root, _)).getOrElse(Nil)
    val stats = statsFor(root, files).map { case (c, fresh) =>
      c -> (base.map(statsAt(root, _)).getOrElse(Map.empty) ++ fresh)
    }
    commit(root, base.getOrElse(-1L) + 1, prev ++ files, -1L, stats)
  }

  /** Cast `df` to the table's column set and types — every commit must
    * write type-identical parquet, or a later multi-file scan hits footer
    * disagreements (int32 base vs int64 update was the concrete failure:
    * a Scala literal's Long next to a parquet int column). Missing or
    * extra columns fail loudly.
    */
  private def conform(df: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val have = df.columns.toSet
    require(schema.fields.map(_.name).toSet == have,
      s"commit schema mismatch: table has ${schema.fieldNames.mkString(",")}, " +
        s"commit has ${df.columns.mkString(",")}")
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  /** MERGE-style keyed upsert with SNAPSHOT ISOLATION — the transactional
    * twin of [[Sinks.mergeIntoPartitioned]], same per-partition cost
    * model and the same key-cannot-change-partition contract. The commit
    * swaps the affected partitions' files for rewritten ones in ONE
    * atomic manifest publish: a concurrent reader holds either the old
    * version (all old files, still on disk) or the new one — never a mix.
    * A concurrent WRITER that committed first invalidates this merge's
    * survivor set: the conflict surfaces as [[SnapshotConflictException]]
    * and the whole read-compute-commit cycle must be retried on the new
    * snapshot.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
            keyCol: String, partCol: String): Long = {
    val base = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no snapshot to merge into at $root"))
    val baseFiles = parseManifest(root, base)
    // The kept/replaced split below is a path test on hive partition dirs;
    // a base snapshot NOT partitioned by partCol would silently keep every
    // old file (duplicate keys in affected partitions). Fail loudly instead.
    require(baseFiles.forall(_.split('/').exists(_.startsWith("__part="))),
      s"merge requires a partitioned base snapshot " +
        s"(write it with overwrite(df, root, Some(\"$partCol\")))")
    val target = read(spark, root, Some(base))
    val cols = target.columns.map(col).toSeq
    val parts = updates.select(col(partCol)).distinct()
    val affected = target.join(broadcast(parts), Seq(partCol), "left_semi")
    val survivors = affected
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
    val merged = survivors.select(cols: _*)
      .unionByName(conform(updates, target.schema))
      .localCheckpoint(true)
    val newFiles = writeDataFiles(merged, root, Some(partCol))
    // Carry forward every base file OUTSIDE the affected partitions. The
    // partition value is in the file path (hive layout), so the kept/
    // replaced split is a path-prefix test — no data read.
    val affectedDirs = parts.collect().map(r => s"__part=${r.get(0)}").toSet
    val kept = baseFiles.filterNot(f =>
      f.split('/').exists(affectedDirs.contains))
    val keptSet = kept.toSet
    val stats = statsFor(root, newFiles).map { case (c, fresh) =>
      c -> (statsAt(root, base).filter { case (f, _) => keptSet(f) } ++ fresh)
    }
    commit(root, base + 1, kept ++ newFiles, -1L, stats)
  }

  /** Read a snapshot: the current version, or `asOf` for time travel.
    * Plan-wise this is a plain multi-path parquet scan of the manifest's
    * exact file list — column pruning, predicate pushdown, and (hive
    * paths) partition values all work as usual.
    */
  /** Read a snapshot: the current version, or `asOf` for time travel.
    * `partValues` prunes at the MANIFEST level — only files whose
    * `__part=<value>` path component matches are handed to the scan, so a
    * partition-scoped read opens exactly the matching files (the
    * directory-pruning equivalent, done on the KB-sized file list instead
    * of a filesystem listing). Values match the hive rendering of the
    * partition value (`3`, `2024-01-01`, …).
    */
  def read(spark: SparkSession, root: String,
           asOf: Option[Long] = None,
           partValues: Option[Set[String]] = None,
           keyRange: Option[(Long, Long)] = None): DataFrame = {
    val v = asOf.orElse(currentVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val rels = prunedFiles(root, v, partValues, keyRange)
    require(rels.nonEmpty, s"version $v of $root has no matching files")
    spark.read.parquet(rels.map(f => Paths.get(root, "data", f).toString): _*)
  }

  /** Root-relative files of `version` surviving manifest-level pruning:
    * `partValues` on the `__part=` path component, `keyRange` = [lo,hi]
    * (inclusive) against the declared stats column's per-file ranges —
    * a file is skipped ONLY when its recorded range is provably disjoint;
    * files without a range are always read. Exposed so specs (and
    * operators sizing a scan) can count candidate files without reading.
    */
  def prunedFiles(root: String, version: Long,
                  partValues: Option[Set[String]] = None,
                  keyRange: Option[(Long, Long)] = None): Seq[String] = {
    val all = parseManifest(root, version)
    val byPart = partValues match {
      case Some(vals) =>
        val dirs = vals.map(x => s"__part=$x")
        all.filter(_.split('/').exists(dirs.contains))
      case None => all
    }
    keyRange match {
      case Some((lo, hi)) =>
        val ranges = statsAt(root, version)
        byPart.filter { f =>
          ranges.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi }
        }
      case None => byPart
    }
  }

  /** Drop data files no LIVE manifest references (after `keepVersions`
    * manifests are pruned) — the maintenance job, never part of a commit.
    * Readers pinned to a retained version stay safe; time travel beyond
    * the horizon is gone, which is the documented trade.
    */
  def vacuum(root: String, keepVersions: Int = 2): Unit = {
    val vs = versions(root)
    val dead = vs.dropRight(keepVersions)
    val live = vs.takeRight(keepVersions)
    val referenced = live.flatMap(parseManifest(root, _)).toSet
    val dataDir = Paths.get(root, "data")
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(dataDir)) {
      val it = Files.walk(dataDir)
      val victims = try it.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          !referenced.contains(dataDir.relativize(p).toString))
        .toList
      finally it.close()
      victims.foreach(Files.delete)
      // prune now-empty commit dirs (best-effort, deepest first)
      val dirs = Files.walk(dataDir)
      try dirs.iterator().asScala.toList.reverse
        .filter(p => Files.isDirectory(p) && p != dataDir)
        .foreach { p =>
          val s = Files.list(p)
          val empty = try !s.iterator().hasNext finally s.close()
          if (empty) Files.delete(p)
        }
      finally dirs.close()
    }
    dead.foreach(v => Files.deleteIfExists(manifestPath(root, v)))
  }
}
