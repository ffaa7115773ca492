package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, SnapshotStore}

/** The SQL surface of the snapshot layer ([[graft.sources.GraftCatalog]]):
  * plain `spark.sql` over snapshot tables, `VERSION AS OF` / `TIMESTAMP AS
  * OF` time travel, filter pushdown through the native parquet scan,
  * analysis-time write refusal, and the deletion-vector refusal/compact
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

  private def tableDir(name: String): String = {
    val d = Paths.get("target/graft-scratch/sqlcat", name)
    Files.createDirectories(d.getParent)
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

  test("SQL writes fail analysis: the manifest log cannot be bypassed") {
    val root = tableDir("ro")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.ro VALUES (1, 1, 'X')")
    }
    assert(e.getMessage.toLowerCase.contains("does not support append") ||
      e.getMessage.toLowerCase.contains("read-only") ||
      e.getMessage.toLowerCase.contains("unsupported"), e.getMessage)
  }

  test("deletion-vector versions are refused by name; compact materializes and SQL resumes") {
    val root = tableDir("dv")
    SnapshotStore.overwrite(base, root, Some("c_nationkey"))
    SnapshotStore.delete(spark, root, col("c_custkey") % 7 === 0,
      Some("c_nationkey"), deletionVectors = true)
    val e = intercept[UnsupportedOperationException] {
      spark.sql("SELECT * FROM graft.dv").collect()
    }
    assert(e.getMessage.contains("deletion vectors"))
    // the un-DV'd history is still SQL-readable
    assert(spark.sql("SELECT * FROM graft.dv VERSION AS OF 0").count() == base.count())

    SnapshotStore.compact(spark, root, "c_nationkey")
    assert(sortedRows(spark.sql("SELECT * FROM graft.dv")) ==
      sortedRows(SnapshotStore.read(spark, root)))
    assert(spark.sql("SELECT * FROM graft.dv").count() ==
      base.filter(!(col("c_custkey") % 7 === 0)).count())
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
