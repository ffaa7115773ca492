package graft.operators

import graft.QueryPack
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2.21 — the remaining classic TPC-H planner shapes, one SQL
  * string per query valid in BOTH engines (the SubqOps pattern: the oracle
  * string IS the query string, so the two engines cannot drift).
  *
  * Each row here is a DISTINCT planner shape nothing else in the registry
  * exercises:
  *   - q_join_q3:  selective dim filter + date predicates on BOTH fact
  *     sides + join-agg + top-k by aggregate (the shipping-priority shape).
  *   - q_join_q13: left-outer join with a NON-JOIN predicate in the ON
  *     clause (it must NOT filter preserved rows) + COUNT(col) null
  *     semantics + aggregation OF an aggregate (distribution-of-counts).
  *   - q_subq_q15: CTE referenced twice — once as the join input, once
  *     under an uncorrelated scalar MAX (the revenue-view shape).
  *   - q_subq_q17: ROW-level correlated scalar filter against a per-group
  *     aggregate of the same fact table, feeding a global aggregate
  *     (q_subq_having_corr filters GROUPS; this filters ROWS).
  *   - q_join_q19: equi-join key buried inside an OR-of-ANDs — Catalyst
  *     must extract the common p_partkey = l_partkey conjunct to plan a
  *     hash join instead of a BNL join (plan-asserted in PlanSpec).
  *
  * Determinism (SURVEY §7.3): money stays in exact bigint cents
  * (DECIMAL(18,2)*100) — every SUM is order-independent integer addition;
  * quantities compare by bigint cross-multiplication (no division); every
  * ORDER BY ends in a unique key.
  *
  * Scale posture: Q3/Q13 shuffle on their natural keys with map-side
  * partial aggregation; Q15's rev CTE is supplier-cardinality (broadcast
  * side) and its scalar MAX is a one-row broadcast; Q17's two correlated
  * scalars decorrelate to ONE grouped aggregate joined back (Catalyst
  * merges the identical-domain subqueries); Q19 is a part-side broadcast
  * hash join with the residual OR evaluated post-probe in codegen.
  */
object TpchOps extends QueryPack {

  private val sqlBoth: Map[String, String] = Map(
    // TPC-H Q3 (shipping priority): orders placed before a date whose
    // items shipped after it, for one segment; top-10 open revenue.
    // (od, o_orderpriority) are functionally dependent on l_orderkey, so
    // the ORDER BY tiebreak on l_orderkey alone is a total order.
    "q_join_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS rev_cents,
        |  CAST(o_orderdate AS DATE) AS od, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1998-01-01'
        |  AND l_shipdate > DATE '1998-01-01'
        |GROUP BY 1, 3, 4
        |ORDER BY rev_cents DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    // TPC-H Q13 (customer distribution): how many customers placed
    // 0, 1, 2, ... qualifying orders. The o_orderpriority filter lives in
    // the OUTER JOIN's ON clause — it restricts the MATCH, not the
    // preserved side, so order-less customers survive with c_count = 0
    // (COUNT(o_orderkey) skips the null-extended rows). A WHERE would
    // silently turn the query inner. c_count is the group key of the
    // outer aggregate -> the DESC tiebreak is a total order.
    "q_join_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // TPC-H Q15 (top supplier): the revenue "view" (a CTE) is consumed
    // twice — joined against supplier AND reduced to a one-row scalar MAX
    // that broadcasts into the filter. Ties on the max all surface (no
    // LIMIT), so the result is tie-safe; ORDER BY s_suppkey is unique.
    "q_subq_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS total_rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1998-01-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_cents
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
        |ORDER BY s_suppkey ASC""".stripMargin,

    // TPC-H Q17 (small-quantity revenue): lineitems of one brand whose
    // quantity is below 1/5 of the part's average quantity. qty < avg/5
    // is qty*5*cnt < sum in pure bigint (no division). The OUTER
    // correlation column must be alias-qualified (l1.l_partkey) — a bare
    // l_partkey binds to the inner scope in both engines and silently
    // degenerates the predicate (the SubqOps trap). Single-row result.
    "q_subq_q17" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l1.l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS rev_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND CAST(l1.l_quantity AS BIGINT) * 5 *
        |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |    < (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
        |       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    // TPC-H Q19 (discounted revenue): the equi-join key appears only
    // INSIDE each disjunct. Catalyst's join-condition extraction must
    // factor the common p_partkey = l_partkey out of the OR to plan a
    // hash join (PlanSpec asserts no BroadcastNestedLoop/Cartesian);
    // the brand/quantity/size residual evaluates post-probe. Bands are
    // tuned non-degenerate on the corpus (148 rows at sf0.001).
    "q_join_q19" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS rev_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem, part
        |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
        |       AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 20)
        |   OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
        |       AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 30)
        |   OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
        |       AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 40)""".stripMargin
  )

  private def run(tables: Seq[String], key: String)(s: SparkSession, d: String): DataFrame = {
    tables.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlBoth(key))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_q3" -> (run(Seq("customer", "orders", "lineitem"), "q_join_q3") _),
    "q_join_q13" -> (run(Seq("customer", "orders"), "q_join_q13") _),
    "q_subq_q15" -> (run(Seq("supplier", "lineitem"), "q_subq_q15") _),
    "q_subq_q17" -> (run(Seq("lineitem", "part"), "q_subq_q17") _),
    "q_join_q19" -> (run(Seq("lineitem", "part"), "q_join_q19") _)
  )

  override def oracle: Map[String, String] = sqlBoth
}
