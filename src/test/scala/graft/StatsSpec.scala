package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join

/** SURVEY §7.4b — CBO statistics lifecycle (VERDICT r2 "next" #5).
  *
  * Proves the two halves of `graft.Stats`: ANALYZE'd catalog tables expose
  * rowCount/NDV statistics to the optimizer, and with
  * `spark.sql.cbo.joinReorder.enabled` those statistics actually CHANGE the
  * join order of a deliberately badly-written 5-way star join (lineitem
  * listed first) — the optimizer builds out from the tiny dims instead of
  * trusting the query author's FROM order.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Table names present in the DEEPEST join of the optimized plan (the
    * pair the optimizer chose to join first). Catalog-table leaves print as
    * `Relation spark_catalog.graft_stats.<name>[...]`, so match on the
    * qualified table name.
    */
  private def deepestJoinTables(df: DataFrame): Set[String] = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    val bottom = joins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    val leafStr = bottom.flatMap(_.collectLeaves()).map(_.toString).mkString("\n")
    Stats.JoinTables.filter(t => leafStr.contains(s"graft_stats.$t")).toSet
  }

  // lineitem deliberately FIRST; all join predicates relegated to WHERE so
  // the syntactic order carries no information.
  private val badOrderSql =
    """SELECT n_name, COUNT(*) AS n
      |FROM graft_stats.lineitem, graft_stats.region, graft_stats.customer,
      |     graft_stats.nation, graft_stats.orders
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY n_name""".stripMargin

  test("ANALYZE stores rowCount stats; CBO reorders a badly-ordered 5-way join dims-first") {
    Stats.registerCatalog(spark, TestSpark.sf001)
    Stats.analyze(spark)

    val cboConfs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = cboConfs.map(k => k -> spark.conf.getOption(k))
    try {
      cboConfs.foreach(k => spark.conf.set(k, "false"))
      val withoutCbo = deepestJoinTables(spark.sql(badOrderSql))

      cboConfs.foreach(k => spark.conf.set(k, "true"))
      // Statistics reached the catalog: exact row counts, not size guesses.
      // (plan stats expose rowCount only under cbo.enabled.)
      val liRows = spark.table("graft_stats.lineitem")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(liRows.exists(_.toLong == 60000L), s"lineitem rowCount: $liRows")
      val nRows = spark.table("graft_stats.nation")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(nRows.exists(_.toLong == 25L), s"nation rowCount: $nRows")

      val withCbo = deepestJoinTables(spark.sql(badOrderSql))

      // The stats-driven order starts from the two tiny dims (25- and 5-row
      // tables), keeping every intermediate bounded by the fact tables —
      // NOT from the 60k-row lineitem the SQL text leads with.
      assert(withCbo == Set("nation", "region"),
        s"CBO should join nation+region first, got $withCbo")
      assert(!withoutCbo.contains("nation") || !withoutCbo.contains("region") ||
        withoutCbo != withCbo,
        s"rule-based order unexpectedly identical: $withoutCbo")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
