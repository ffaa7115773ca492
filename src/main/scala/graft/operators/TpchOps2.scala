package graft.operators

import graft.QueryPack
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2.21 (cont.) — the remaining TPC-H planner shapes, adapted to
  * this corpus's columns (no partsupp / commitdate / receiptdate / shipmode;
  * see FIXTURES.md). Same sqlBoth discipline as TpchOps: ONE SQL string per
  * query valid in both engines, so Spark and the DuckDB oracle cannot drift.
  *
  * Adaptation rules (kept minimal and stated per query):
  *   - partsupp is derived as `SELECT DISTINCT l_partkey, l_suppkey FROM
  *     lineitem` (the observed supplier-part relationship);
  *   - "late" (Q4/Q12/Q21's commit/receipt lag) becomes shipment more than
  *     N days after o_orderdate — same inequality-correlation shape;
  *   - Q2's MIN(ps_supplycost) becomes MAX(s_acctbal) over the part's
  *     in-region suppliers — same twice-consumed correlated-scalar shape.
  *
  * Each row is a planner shape nothing else in the registry exercises:
  *   - q_subq_q2:  correlated scalar agg over a derived view that is ALSO
  *     the outer join input (the min-cost-supplier shape).
  *   - q_subq_q4:  EXISTS with an inequality against an OUTER column
  *     (l_shipdate > o_orderdate + 60d) feeding a grouped count — the
  *     semi-join-into-agg shape.
  *   - q_join_q5:  6-table snowflake with the extra c_nationkey =
  *     s_nationkey cycle edge (join graph has a cycle, not a tree).
  *   - q_agg_q6:   pure scan-aggregate; every predicate pushes to parquet.
  *   - q_join_q8:  8-table join with TWO roles of the same dim (nation n1
  *     via customer, n2 via supplier) + conditional share num/den.
  *   - q_join_q9:  like-filtered part spine joined up to supplier nation,
  *     grouped by (nation, year).
  *   - q_join_q10: join-agg + top-k by aggregate with a 4th dim (the
  *     returned-items shape; LIMIT after agg → TakeOrderedAndProject).
  *   - q_agg_q12:  two complementary CASE-counts over a join with an
  *     inter-column inequality (l_shipdate vs o_orderdate + 30d).
  *   - q_agg_q14:  conditional-share numerator/denominator in one pass.
  *   - q_agg_q16:  COUNT(DISTINCT) on top of a NOT IN anti-join over the
  *     derived partsupp.
  *   - q_subq_q21: EXISTS and NOT EXISTS against the SAME fact table with
  *     opposite inequality residuals (the kept-waiting shape) — the
  *     heaviest decorrelation in the registry.
  *
  * Determinism (SURVEY §7.3): all money flows through
  * CAST(x AS DECIMAL(18,2))*100 → BIGINT cents at first touch;
  * price*(1-disc) is computed as cents*(100-disc_pct) — pure integer
  * "c4" units (1e-4 dollars), order-independent addition. Discount
  * percents come through the same decimal cast (doubles are 2dp-exact
  * [M], so no FP drift). Every ORDER BY ends in a unique key; single-row
  * and per-group outputs carry explicit ASC/DESC.
  *
  * Scale posture: the fact-side joins (Q5/Q8/Q9/Q10/Q12) shuffle on their
  * natural keys with map-side partial aggregation; dims (nation/region/
  * supplier/part at dim-cardinality) broadcast. Q2/Q16's derived partsupp
  * is a distinct-shuffle on (partkey, suppkey) — at 100 TB this is the
  * bucketable projection of lineitem, two columns only, never the text.
  * Q21's double EXISTS decorrelates to two aggregate-join passes over
  * lineitem keyed by orderkey — co-partitioned with the l1 side, no
  * cartesian (PlanSpec's registry-wide sweep polices that).
  */
object TpchOps2 extends QueryPack {

  /** price*(1-discount) in integer 1e-4-dollar units, exact in both engines. */
  private val volC4 =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) * (100 - CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT))"

  private val sqlBoth: Map[String, String] = Map(
    // TPC-H Q2 (min-cost supplier, adapted): for each size-15 part, the
    // EUROPE supplier(s) with the highest account balance among suppliers
    // that actually shipped it. The ps CTE is consumed twice: as the outer
    // join spine AND inside the correlated scalar MAX. Ties surface (no
    // LIMIT) and (p_partkey, s_suppkey) closes the order.
    "q_subq_q2" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2))*100 AS BIGINT) AS acctbal_cents,
        |       s_name, n_name, p_partkey, s_suppkey
        |FROM part
        |JOIN ps ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND p_size = 15
        |  AND s_acctbal = (SELECT MAX(s2.s_acctbal)
        |                   FROM ps ps2
        |                   JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        |                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |                   JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |                   WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY acctbal_cents DESC, p_partkey ASC, s_suppkey ASC""".stripMargin,

    // TPC-H Q4 (order-priority checking, adapted): orders in one quarter
    // with at least one lineitem shipped >60 days after the order date.
    // The EXISTS correlates on the equi key AND an inequality against the
    // outer o_orderdate — decorrelates to a semi join with a residual.
    "q_subq_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin,

    // TPC-H Q5 (local supplier volume): revenue where the customer and the
    // supplier share a nation, per ASIA nation in 1997. The c_nationkey =
    // s_nationkey edge closes a CYCLE in the join graph — Catalyst must
    // carry it as a residual on one of the joins, not a separate pass.
    "q_join_q5" ->
      s"""SELECT n_name,
         |  CAST(SUM($volC4) AS BIGINT) AS rev_c4
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1997
         |GROUP BY n_name ORDER BY rev_c4 DESC, n_name ASC""".stripMargin,

    // TPC-H Q6 (forecast revenue change): the pure scan-agg — date range,
    // discount band, quantity cap all push to the parquet scan; the sum is
    // price_cents * disc_pct, exact integers.
    "q_agg_q6" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
        |           * CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS disc_rev_c4,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,

    // TPC-H Q8 (national market share): NATION_7's share of PROMO-part
    // revenue sold to AMERICA customers, per year. nation joins in TWO
    // roles (customer side filters, supplier side labels); the share is
    // emitted as integer numerator/denominator — no cross-engine division.
    "q_join_q8" ->
      s"""SELECT o_year,
         |  CAST(SUM(CASE WHEN nation = 'NATION_7' THEN vol_c4 ELSE 0 END) AS BIGINT) AS nation_vol_c4,
         |  CAST(SUM(vol_c4) AS BIGINT) AS total_vol_c4
         |FROM (SELECT year(o_orderdate) AS o_year,
         |        $volC4 AS vol_c4,
         |        n2.n_name AS nation
         |      FROM part
         |      JOIN lineitem ON p_partkey = l_partkey
         |      JOIN supplier ON s_suppkey = l_suppkey
         |      JOIN orders ON o_orderkey = l_orderkey
         |      JOIN customer ON c_custkey = o_custkey
         |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |      JOIN region ON n1.n_regionkey = r_regionkey
         |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
         |        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01') allrows
         |GROUP BY o_year ORDER BY o_year ASC""".stripMargin,

    // TPC-H Q9 (product-type profit, adapted — no ps_supplycost): revenue
    // from parts whose name contains 'red', by supplier nation and order
    // year. The LIKE filter prunes part BEFORE the fact join; nation DESC
    // year is the classic presentation order, closed by the unique pair.
    "q_join_q9" ->
      s"""SELECT n_name AS nation, o_year, CAST(SUM(vol_c4) AS BIGINT) AS profit_c4
         |FROM (SELECT n_name, year(o_orderdate) AS o_year,
         |        $volC4 AS vol_c4
         |      FROM lineitem
         |      JOIN orders ON o_orderkey = l_orderkey
         |      JOIN supplier ON s_suppkey = l_suppkey
         |      JOIN nation ON s_nationkey = n_nationkey
         |      JOIN part ON p_partkey = l_partkey
         |      WHERE p_name LIKE '%red%') profit
         |GROUP BY nation, o_year ORDER BY nation ASC, o_year DESC""".stripMargin,

    // TPC-H Q10 (returned items): customers who returned goods in H1-1997,
    // top 20 by lost revenue. Join-agg over 4 tables then
    // TakeOrderedAndProject (LIMIT over aggregate, not raw rows).
    "q_join_q10" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($volC4) AS BIGINT) AS rev_c4
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY rev_c4 DESC, c_custkey ASC LIMIT 20""".stripMargin,

    // TPC-H Q12 (shipping delay, adapted — no shipmode/receiptdate): count
    // urgent vs non-urgent order lines shipped >30 days after order date,
    // by line status. Two complementary CASE-counts in one pass plus an
    // inter-column inequality that CANNOT push below the join.
    "q_agg_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus ASC""".stripMargin,

    // TPC-H Q14 (promo revenue): share of September-1997 revenue from
    // PROMO parts, as exact numerator/denominator in one aggregate pass.
    "q_agg_q14" ->
      s"""SELECT
         |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $volC4 ELSE 0 END) AS BIGINT) AS promo_rev_c4,
         |  CAST(SUM($volC4) AS BIGINT) AS total_rev_c4
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin,

    // TPC-H Q16 (supplier relationship, adapted): how many distinct
    // suppliers shipped each (brand, type, size) combo, over the derived
    // partsupp, excluding one brand, square sizes, and suppliers with a
    // negative balance (the NOT IN anti-join).
    "q_agg_q16" ->
      """SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,

    // TPC-H Q21 (suppliers who kept orders waiting, adapted): suppliers
    // whose line shipped >90 days late on a finished multi-supplier order
    // where NO other supplier was late. EXISTS and NOT EXISTS hit the SAME
    // fact table with opposite residuals against the outer o_orderdate —
    // the registry's heaviest decorrelation.
    "q_subq_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name ASC""".stripMargin
  )

  private val tablesFor: Map[String, Seq[String]] = Map(
    "q_subq_q2" -> Seq("part", "lineitem", "supplier", "nation", "region"),
    "q_subq_q4" -> Seq("orders", "lineitem"),
    "q_join_q5" -> Seq("customer", "orders", "lineitem", "supplier", "nation", "region"),
    "q_agg_q6" -> Seq("lineitem"),
    "q_join_q8" -> Seq("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    "q_join_q9" -> Seq("lineitem", "orders", "supplier", "nation", "part"),
    "q_join_q10" -> Seq("customer", "orders", "lineitem", "nation"),
    "q_agg_q12" -> Seq("orders", "lineitem"),
    "q_agg_q14" -> Seq("lineitem", "part"),
    "q_agg_q16" -> Seq("lineitem", "part", "supplier"),
    "q_subq_q21" -> Seq("supplier", "lineitem", "orders")
  )

  private def run(key: String)(s: SparkSession, d: String): DataFrame = {
    tablesFor(key).foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlBoth(key))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    sqlBoth.keys.map(k => k -> (run(k) _)).toMap

  override def oracle: Map[String, String] = sqlBoth
}
