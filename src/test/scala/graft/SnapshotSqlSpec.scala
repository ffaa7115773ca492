package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, SnapshotStore}

/** The SQL surface of the snapshot layer ([[graft.sources.GraftCatalog]]):
  * plain `spark.sql` over snapshot tables, `VERSION AS OF` / `TIMESTAMP AS
  * OF` time travel, filter pushdown through the native parquet scan,
  * analysis-time write refusal, and the deletion-vector serving/compact
  * story. Every content check compares against the Scala read path
  * (SnapshotStore.read), which the rest of the suite pins.
  */
class SnapshotSqlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root",
      Paths.get("target/graft-scratch/sqlcat").toString)
    s
  }

  /** SQL table names must be stable (unlike the store spec's temp dirs),
    * so wipe any leftover from a previous run — CREATE TABLE rightly
    * refuses an existing table, and stale manifest logs would skew the
    * version arithmetic below.
    */
  private def tableDir(name: String): String = {
    val d = Paths.get("target/graft-scratch/sqlcat", name)
    Files.createDirectories(d.getParent)
    if (Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      val it = Files.walk(d)
      try it.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally it.close()
    }
    d.toString
  }

  private def base = Tables.customer(spark, TestSpark.sf0001)
    .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("c_custkey").collect().toSeq

  test("SELECT over the catalog == SnapshotStore.read; version pins survive later commits") {
    import spark.implicits._
    val root = tableDir("cust")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    assert(sortedRows(spark.sql("SELECT * FROM graft.cust")) ==
      sortedRows(SnapshotStore.read(spark, root)))

    val extra = Seq((900001L, 3L, "NEW")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    SnapshotStore.append(extra, root, Some("c_nationkey"))
    // current follows the commit; VERSION AS OF 0 still reads the original
    assert(spark.sql("SELECT count(*) AS n FROM graft.cust").head().getLong(0) ==
      base.count() + 1)
    assert(sortedRows(spark.sql("SELECT * FROM graft.cust VERSION AS OF 0")) ==
      sortedRows(SnapshotStore.read(spark, root, Some(0L))))
  }

  test("TIMESTAMP AS OF resolves the newest version committed at or before the bound") {
    import spark.implicits._
    val root = tableDir("tt")
    val df = Seq((1L, 1L, "A"), (2L, 2L, "B"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    SnapshotStore.overwrite(df, root, Some("c_nationkey"))
    Thread.sleep(1100) // manifest mtime is the publication instant (ms granularity)
    val cut = java.time.Instant.now()
    Thread.sleep(1100)
    SnapshotStore.append(
      Seq((3L, 3L, "C")).toDF("c_custkey", "c_nationkey", "c_mktsegment"),
      root, Some("c_nationkey"))

    val ts = java.sql.Timestamp.from(cut)
    val atCut = spark.sql(s"SELECT * FROM graft.tt TIMESTAMP AS OF '$ts'")
    assert(atCut.count() == 2) // v0 only — v1 commits after the bound
    // a bound before the first commit is an error, not an empty table
    val tooEarly = java.sql.Timestamp.from(cut.minusSeconds(3600))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.tt TIMESTAMP AS OF '$tooEarly'").collect()
    }
    assert(e.getMessage.contains("no version committed"))
  }

  test("filters push into the native parquet scan (PushedFilters non-empty)") {
    val root = tableDir("push")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val df = spark.sql("SELECT c_custkey FROM graft.push WHERE c_custkey = 7")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]")
      || plan.contains("PushedFilters: [EqualTo(c_custkey,7)"),
      s"expected a pushed equality filter in:\n$plan")
    // and the scan reads only the projected column
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint>"), plan)
  }

  test("INSERT INTO / INSERT OVERWRITE are manifest commits with snapshot isolation") {
    val root = tableDir("sqlw")
    spark.sql("CREATE TABLE graft.sqlw (k BIGINT, v STRING) PARTITIONED BY (k)")
    // CREATE publishes an empty v0 carrying the declared schema
    assert(spark.sql("SELECT * FROM graft.sqlw").count() == 0)
    assert(SnapshotStore.currentVersion(root).contains(0L))
    assert(SnapshotStore.partColOf(root).contains("k"))

    spark.sql("INSERT INTO graft.sqlw VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.sqlw VALUES (2, 'c')")
    assert(spark.sql("SELECT count(*) FROM graft.sqlw").head().getLong(0) == 3)
    // each INSERT is one committed version; the pinned past is intact
    assert(SnapshotStore.currentVersion(root).contains(2L))
    assert(spark.sql("SELECT * FROM graft.sqlw VERSION AS OF 1").count() == 2)
    // the SQL-written files land in the table's recorded hive layout, so
    // the Scala API interoperates: merge/read see one consistent table
    assert(SnapshotStore.entriesAt(root, 2L)
      .forall(_.split('/').exists(_.startsWith("__part="))))
    assert(spark.sql("SELECT * FROM graft.sqlw WHERE k = 2").count() ==
      SnapshotStore.read(spark, root).filter(col("k") === 2).count())

    spark.sql("INSERT OVERWRITE graft.sqlw VALUES (9, 'z')")
    assert(spark.sql("SELECT v FROM graft.sqlw").collect().map(_.getString(0)).toSeq
      == Seq("z"))
    assert(spark.sql("SELECT * FROM graft.sqlw VERSION AS OF 2").count() == 3)
  }

  test("CTAS composes create + insert; DROP TABLE removes the table") {
    import spark.implicits._
    val root = tableDir("ctas")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft.ctas AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT * FROM graft.ctas").count() == 2)
    assert(Files.isDirectory(Paths.get(root, "_manifests")))
    spark.sql("DROP TABLE graft.ctas")
    assert(!Files.exists(Paths.get(root)))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.ctas").collect()
    }
    assert(e.getMessage.contains("ctas"))
  }

  test("write refusal: time-traveled tables and unrecorded legacy layouts") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val root = tableDir("wrref")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array.empty[String], "wrref")

    // time travel pins a version; inserting into the past is refused
    val pinned = cat.loadTable(ident, "0")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
    val e1 = intercept[UnsupportedOperationException] {
      pinned.newWriteBuilder(null)
    }
    assert(e1.getMessage.contains("time-traveled"))

    // a partitioned table that predates the part_col record refuses SQL
    // writes (appending unpartitioned files would silently mix layouts).
    // Simulate a legacy table by stripping the embedded record from every
    // manifest (pre-r13 manifests carried no part_col key; r13 moved the
    // record INTO the manifest, so there is no side file to delete).
    locally {
      import scala.jdk.CollectionConverters._
      val it = Files.list(Paths.get(root, "_manifests"))
      val mfs = try it.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".json")).toSeq
      finally it.close()
      mfs.foreach { p =>
        val txt = new String(Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
          .replaceAll("\"part_col\":(null|\"[^\"]*\"),", "")
        Files.write(p, txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    val legacy = cat.loadTable(ident)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
    val e2 = intercept[UnsupportedOperationException] {
      legacy.newWriteBuilder(null)
    }
    assert(e2.getMessage.contains("part_col"))
  }

  test("history and files metadata tables read straight from the manifest log") {
    import spark.implicits._
    val root = tableDir("meta")
    spark.sql("CREATE TABLE graft.meta (k BIGINT, v STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft.meta VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE graft.meta VALUES (3, 'c')")

    val hist = spark.sql("SELECT * FROM graft.meta.history ORDER BY version")
      .collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // full snapshots record exact counts; incremental commits record -1
    assert(hist(0).getAs[Long]("rows") == 0L)
    assert(hist(1).getAs[Long]("rows") == -1L)
    assert(hist(2).getAs[Long]("rows") == 1L)
    assert(hist(2).getAs[Int]("num_files") >= 1)

    val files = spark.sql("SELECT * FROM graft.meta.files").collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getAs[String]("partition") == "3"))
    // files respects VERSION AS OF: v1 lists the two inserted partitions
    val atV1 = spark.sql("SELECT partition FROM graft.meta.files VERSION AS OF 1")
      .collect().map(_.getString(0)).toSet
    assert(atV1 == Set("1", "2"))
  }

  test("deletion-vector versions serve masked rows through SQL; compact restores the native path") {
    val root = tableDir("dv")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    SnapshotStore.delete(spark, root, col("c_custkey") % 7 === 0,
      Some("c_nationkey"), deletionVectors = true)
    val expect = base.filter(!(col("c_custkey") % 7 === 0))

    // A reader between the GDPR delete and the next compaction sees the
    // MASKED table (the DV anti-join layered over the scan), not a
    // refusal, and not resurrected rows.
    assert(spark.sql("SELECT * FROM graft.dv").count() == expect.count())
    assert(sortedRows(spark.sql("SELECT * FROM graft.dv")) ==
      sortedRows(SnapshotStore.read(spark, root)))
    // predicates and pruned projections work through the DV scan (the
    // translated filter rides the inner DataFrame, below the anti-join)
    assert(spark.sql(
      "SELECT c_custkey FROM graft.dv WHERE c_nationkey = 3").count() ==
      expect.filter(col("c_nationkey") === 3).count())
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.dv WHERE c_custkey % 7 = 0")
      .head().getLong(0) == 0L)
    // the un-DV'd history is still SQL-readable through the native path
    assert(spark.sql("SELECT * FROM graft.dv VERSION AS OF 0").count() == base.count())
    // inner-path pushdown evidence: the filter the DV scan plants reaches
    // the parquet scan BELOW the anti-join
    val inner = SnapshotStore.read(spark, root).filter(col("c_nationkey") === 3)
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_nationkey"))

    SnapshotStore.compact(spark, root, "c_nationkey")
    assert(sortedRows(spark.sql("SELECT * FROM graft.dv")) ==
      sortedRows(SnapshotStore.read(spark, root)))
    assert(spark.sql("SELECT * FROM graft.dv").count() == expect.count())
    // post-compact the table reports DV-free and scans natively again
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val t = cat.loadTable(Identifier.of(Array.empty[String], "dv"))
    assert(t.properties().get("deletion-vectors") == "false")
  }

  test("catalog guard rails: table-as-namespace, history AS OF, TBLPROPERTIES") {
    import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces}
    val root = tableDir("rails")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    SnapshotStore.append(base.limit(5), root)

    // DROP NAMESPACE on a TABLE directory must not delete the table
    // through the namespace path (namespaceExists is true for any dir)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[SupportsNamespaces]
    val e1 = intercept[IllegalArgumentException] {
      cat.dropNamespace(Array("rails"), true)
    }
    assert(e1.getMessage.contains("table"))
    assert(spark.sql("SELECT * FROM graft.rails").count() == base.count() + 5)

    // history respects VERSION AS OF: a reader pinned at v0 sees the log
    // as of v0, not the future
    assert(spark.sql("SELECT * FROM graft.rails.history").count() == 2)
    assert(spark.sql(
      "SELECT * FROM graft.rails.history VERSION AS OF 0").count() == 1)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.rails.history VERSION AS OF 9").collect()
    }

    // TBLPROPERTIES/COMMENT are refused loudly, not silently dropped
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.railsprops (k BIGINT) " +
        "TBLPROPERTIES ('retention'='30d')")
    }
    assert(e2.getMessage.contains("propert"))
  }

  test("SHOW TABLES lists snapshot tables; missing table is NoSuchTable") {
    val root = tableDir("listed")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val names = spark.sql("SHOW TABLES IN graft").select("tableName")
      .collect().map(_.getString(0)).toSet
    assert(names.contains("listed"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.no_such_table_xyz").collect()
    }
    assert(e.getMessage.contains("no_such_table_xyz"))
  }
}
