package graft.sources

import java.nio.file.{Files, Paths}
import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL citizenship for the snapshot layer: a DataSource V2 `TableCatalog`
  * over a directory of [[SnapshotStore]] tables, so plain Spark SQL —
  * including time travel — works with zero Scala-API cooperation:
  *
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/tables")
  *   spark.sql("SELECT * FROM graft.docs WHERE k = 5")
  *   spark.sql("SELECT * FROM graft.docs VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.docs TIMESTAMP AS OF '2026-08-15 12:00:00'")
  *
  * Design: `loadTable` resolves the requested snapshot version from the
  * manifest log (current, `VERSION AS OF` n, or the newest manifest
  * committed at-or-before a `TIMESTAMP AS OF` bound) and returns a
  * read-only table whose scan machinery is Spark's OWN parquet DSv2 stack
  * (`ParquetTable` over the version's exact file list, with the
  * manifest-recorded schema as the user-specified schema). That buys the
  * full native read path for free — column pruning, filter pushdown into
  * row-group stats, vectorized decode, pushed-down aggregates — while the
  * snapshot layer contributes exactly what a table format should: WHICH
  * files constitute the version, and the authoritative schema (files
  * predating an evolved column scan as null for it, same as
  * [[SnapshotStore.read]]).
  *
  * Deliberately read-only: the returned table does not implement
  * `SupportsWrite`, so `INSERT INTO graft.t` fails at analysis instead of
  * silently writing parquet files no manifest ever committed. Writes go
  * through the transactional API ([[SnapshotStore]] / [[SnapshotSink]]),
  * exactly like a query engine fronting a table format it has read-only
  * integration for.
  *
  * Deletion vectors: a version whose entries carry `#dv=` sidecars cannot
  * be served as a bare file list (the deleted rows are still IN the
  * files). `loadTable` refuses such versions by name and points at the
  * two honest outs — `SnapshotStore.compact` (which materializes DVs) or
  * the Scala read path (which anti-joins them). Refusal over silent
  * resurrection.
  *
  * 100 TB: planning cost is one manifest read (sectioned manifests keep
  * that KB-sized at million-file scale); the scan itself is the native
  * parquet path and inherits every scale property the rest of the engine
  * relies on. The catalog holds NO state beyond its root — concurrent
  * writers publishing new versions are picked up by the next `loadTable`
  * (SQL statements pin the version they resolved, the snapshot-isolation
  * contract).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.root must point at the tables directory"))
  }

  override def name(): String = catName

  private def dirOf(ident: Identifier): java.nio.file.Path =
    ident.namespace.foldLeft(Paths.get(root))(_.resolve(_)).resolve(ident.name)

  private def isTable(p: java.nio.file.Path): Boolean =
    Files.isDirectory(p.resolve("_manifests"))

  // -- TableCatalog ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(Paths.get(root))(_.resolve(_))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val it = Files.list(dir)
    try it.iterator().asScala
      .filter(isTable)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally it.close()
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** `VERSION AS OF <n>` — the literal manifest version. */
  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF <t>` (micros since epoch): the newest version whose
    * manifest was committed at or before the bound — manifest commit
    * mtime IS the version's publication instant (create-exclusive move,
    * never rewritten).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident).toString
    val vs = SnapshotStore.versions(dir)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    val at = vs.filter { v =>
      Files.getLastModifiedTime(
        Paths.get(dir, "_manifests", f"v$v%013d.json")).toMillis * 1000L <=
        timestampMicros
    }
    if (at.isEmpty) throw new IllegalArgumentException(
      s"$catName.${ident.name}: no version committed at or before " +
        s"timestamp $timestampMicros (earliest is v${vs.head})")
    tableAt(ident, Some(at.last))
  }

  private def tableAt(ident: Identifier, asOf: Option[Long]): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val tableDir = dir.toString
    val v = asOf.orElse(SnapshotStore.currentVersion(tableDir)).getOrElse(
      throw new NoSuchTableException(ident))
    if (!SnapshotStore.versions(tableDir).contains(v))
      throw new IllegalArgumentException(
        s"$catName.${ident.name}: no committed version $v " +
          s"(have ${SnapshotStore.versions(tableDir).mkString(", ")})")
    val entries = SnapshotStore.entriesAt(tableDir, v)
    if (entries.exists(_.contains("#dv=")))
      throw new UnsupportedOperationException(
        s"$catName.${ident.name} v$v carries deletion vectors; SQL reads " +
          "would resurrect deleted rows. Materialize them first " +
          "(SnapshotStore.compact) or read via SnapshotStore.read, " +
          "which applies them.")
    val schema = SnapshotStore.schemaAt(tableDir, v)
    val files = entries.map(e => Paths.get(tableDir, "data", e).toString)
    new GraftSnapshotTable(s"$catName.${ident.name}", v, tableDir,
      ParquetTable(s"$catName.${ident.name}@v$v", SparkSession.active,
        CaseInsensitiveStringMap.empty(), files, schema,
        classOf[ParquetFileFormat]))
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created by their transactional writers " +
        "(SnapshotStore.overwrite / SnapshotSink); the SQL catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  // -- SupportsNamespaces (directories without a manifest log) --------------

  override def listNamespaces(): Array[Array[String]] = {
    val it = Files.list(Paths.get(root))
    try it.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => Array(p.getFileName.toString))
      .toArray
    finally it.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      Files.isDirectory(namespace.foldLeft(Paths.get(root))(_.resolve(_)))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("read-only catalog")
}

/** A pinned snapshot version as a read-only DSv2 table. Scan planning
  * delegates wholesale to the native parquet table built over the
  * version's file list — this wrapper exists to (a) pin the version in
  * `properties` for observability and (b) NOT implement `SupportsWrite`,
  * so SQL writes fail analysis instead of bypassing the manifest log.
  */
private[sources] class GraftSnapshotTable(tableName: String, version: Long,
                                          location: String,
                                          delegate: ParquetTable)
  extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = delegate.schema

  override def capabilities(): java.util.Set[TableCapability] =
    Collections.singleton(TableCapability.BATCH_READ)

  override def properties(): java.util.Map[String, String] =
    Map("location" -> location, "snapshot-version" -> version.toString,
      "provider" -> "graft-snapshot").asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)
}
