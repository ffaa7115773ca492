package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 — the pre-oracle gate. Every declared query must execute,
  * be non-empty (unless provably empty at sf0.001), and be re-run
  * deterministic. This is what catches a broken query BEFORE the driver's
  * Verify run silently swallows its exception (the round-1 q_join_interval
  * failure mode).
  */
class OracleQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries whose predicates legitimately select nothing at sf0.001's row
    * counts (e.g. HAVING > 300 distinct customers when only 150 exist).
    */
  private val mayBeEmpty = Set("q_agg_distinct_having", "q_filter_in_like",
    "q_join_anti", "q_join_theta_range", "q_join_theta_range_agg",
    "q_subq_in", "q_subq_scalar_corr")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes and is deterministic") {
      val rows1 = fn(spark, TestSpark.sf0001).collect()
      if (!mayBeEmpty(name))
        assert(rows1.nonEmpty, s"$name returned 0 rows at sf0.001")
      val rows2 = fn(spark, TestSpark.sf0001).collect()
      assert(rows1.length == rows2.length, s"$name row count changed between runs")
      rows1.zip(rows2).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name row $i differs between runs: $a vs $b")
      }
    }
  }

  test("every oracle key has a matching query (and no orphans)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty)
  }

  test("entry() flagship smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
