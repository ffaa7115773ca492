package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.3 — joins.
  *
  * Physical-shape intent (asserted in PlanSpec):
  *  - dimension sides (customer/nation/region, filtered orders subsets) are
  *    broadcast — no shuffle of the fact side;
  *  - fact-fact joins (lineitem x orders) shuffle on the join key and AQE
  *    handles skew;
  *  - the as-of join is a window formulation (union + running max), NOT a
  *    per-row correlated probe — linear in events, scales to any size;
  *  - the interval self-join is bucketized on floor(ms/60s) so each row only
  *    meets its 3 neighboring buckets instead of the whole per-user history.
  */
object JoinOps extends QueryPack {

  /** Theta/range join, bucketized: nationkey alone has ~25 values, so a
    * plain equi-join on it collapses parallelism and does a per-nation
    * cartesian. Adding floor(cents/band) as a second equi-key (supplier
    * side exploded to ±1 buckets) bounds each probe to 3 balance buckets;
    * the exact band predicate stays as residual. Same shape survives 100×
    * data. Shared by the full pair list and its bounded-output companion.
    */
  private def thetaRangePairs(s: SparkSession, d: String): DataFrame = {
    val band = 10000L
    val su = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"),
      cents(col("s_acctbal")).as("s_cents"))
    val sBkt = floor(col("s_cents") / band.toDouble).cast(LongType)
    val a = su.withColumn("s_bkt", explode(array(sBkt - 1, sBkt, sBkt + 1)))
    val b = customer(s, d).select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("c_cents"))
      .withColumn("c_bkt", floor(col("c_cents") / band.toDouble).cast(LongType))
    a.join(b, col("s_nationkey") === col("c_nationkey")
      && col("s_bkt") === col("c_bkt")
      && abs(col("s_cents") - col("c_cents")) < band, "inner")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // No broadcast hint on customer: it scales with the fact data, so the
    // hint is left to AQE/autoBroadcastJoinThreshold (broadcast at small SF,
    // shuffle join at 100 TB). The key name survives from SURVEY §2.3.
    "q_join_inner_broadcast" -> ((s, d) => {
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("c_mktsegment").asc)
    }),

    "q_join_5way" -> ((s, d) => {
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"))
        .agg(
          sum(discE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name").asc, col("yr").asc)
    }),

    // The TPC-H Q7 (volume shipping) shape: the SAME dimension table joined
    // TWICE under different roles — nation as the supplier's country and
    // again as the customer's country — then bilateral trade volume per
    // (supp_nation, cust_nation, year). Both nation joins broadcast (the
    // dim is tiny at any SF); the n1 < n2 predicate halves the pair space
    // and makes each unordered country pair appear exactly once. One
    // shuffle total: the final group-by; at 100 TB the fact table streams
    // through two broadcast probes without moving.
    "q_join_q7" -> ((s, d) => {
      val n1 = broadcast(nation(s, d).select(col("n_nationkey").as("n1_key"),
        col("n_name").as("supp_nation")))
      val n2 = broadcast(nation(s, d).select(col("n_nationkey").as("n2_key"),
        col("n_name").as("cust_nation")))
      lineitem(s, d)
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(to_date(col("l_shipdate"))).cast(LongType).as("l_year"))
        .agg(sum(discE4(col("l_extendedprice"), col("l_discount"))).as("rev_e4"))
        .orderBy(col("supp_nation").asc, col("cust_nation").asc, col("l_year").asc)
    }),

    "q_join_left_outer" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey").asc)
    }),

    "q_join_semi" -> ((s, d) => {
      val f = orders(s, d).filter(col("o_orderstatus") === "F")
      customer(s, d)
        .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc)
    }),

    "q_join_anti" -> ((s, d) => {
      val big = orders(s, d).filter(col("o_totalprice") > 100000)
      customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey").asc)
    }),

    "q_join_theta_range" -> ((s, d) =>
      thetaRangePairs(s, d)
        .select(col("s_suppkey"), col("c_custkey"),
          abs(col("s_cents") - col("c_cents")).as("bal_diff_cents"))
        .orderBy(col("s_suppkey").asc, col("c_custkey").asc)),

    // Scale-complete companion: the full pair LIST is Θ(n²) rows by
    // definition (10.9e9 rows ≈ 300 GB through one global sort at sf100 —
    // the OUTPUT, not the join plan, is the single-node scale-killer; the
    // join itself computes in ~115 s there). The leg-sized twin runs the
    // identical bucketized join but reduces to |nations| rows with a
    // SUM(bal_diff) checksum — any pair-set defect (missed bucket edge,
    // double-counted explode) shifts the count or the sum. This is the
    // row the sf100 leg reports; the full-list query remains oracle-gated
    // at the SFs whose output fits a node.
    "q_join_theta_range_agg" -> ((s, d) =>
      thetaRangePairs(s, d)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("s_cents") - col("c_cents"))).as("sum_diff_cents"))
        .orderBy(col("s_nationkey").asc)),

    // As-of backward join via union + running max: linear, one shuffle on
    // user_id, no per-purchase probe of the error history.
    "q_join_asof" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).withColumn("ts_ms", unix_millis(col("ts")))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_ms"), lit(0).as("kind"),
          lit(null).cast(LongType).as("event_id"), col("ts_ms").as("err_ms"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), lit(1).as("kind"),
          col("event_id"), lit(null).cast(LongType).as("err_ms"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").asc, col("kind").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errs.unionByName(purch)
        .withColumn("last_err_ms", max(col("err_ms")).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts_ms").as("p_ms"), col("last_err_ms"))
        .orderBy(col("event_id").asc)
    }),

    // Interval self-join, bucketized: candidates restricted to the same or
    // adjacent 60s bucket; the exact band predicate then filters. The bucket
    // expression is derived per-branch from the RENAMED ms column (round-1
    // bug: deriving it from the pre-rename "ms" threw UNRESOLVED_COLUMN).
    "q_join_interval" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      val aBkt = floor(col("a_ms") / 60000).cast(LongType)
      val a = ev.select(col("user_id"), col("event_id").as("a_id"), col("ms").as("a_ms"))
        .withColumn("bkt", explode(array(aBkt - 1, aBkt, aBkt + 1)))
      val b = ev.select(col("user_id"), col("event_id").as("b_id"), col("ms").as("b_ms"))
        .withColumn("bkt", floor(col("b_ms") / 60000).cast(LongType))
      a.join(b, Seq("user_id", "bkt"))
        .filter(col("a_id") < col("b_id") && abs(col("a_ms") - col("b_ms")) <= 60000)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id").asc)
    }),

    // Full outer join: high-balance customers vs big-order activity — either
    // side may be absent, so the key surfaces via coalesce and both payload
    // columns are nullable. The orders side is pre-aggregated to one row per
    // custkey BEFORE the join (partial agg + |custkeys| join rows, never
    // |orders|); both sides then shuffle on the key — full outer cannot
    // broadcast either side by definition, so this is the scale shape.
    "q_join_full_outer" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"))
      val o = orders(s, d).filter(col("o_totalprice") > 150000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("acct_cents"), col("n_big_orders"))
        .orderBy(col("custkey").asc)
    }),

    // The EXPLICIT skew lever under the hash gate: the orders→customer
    // join runs through Skew.saltedEquiJoin (per-ROW salt on the skewed
    // fact side, join key widened to (key, salt)) — and must produce
    // byte-identical aggregates to the plain join the oracle runs.
    // Salting is a physical rewrite only; this query pins that. The
    // replicated side is the DIMENSION (customer: smaller than the fact
    // but, at 100 TB, too big to broadcast) — replicating it salts× is
    // the documented cost; replicating a fact side would be the
    // anti-pattern. AQE's OptimizeSkewedJoin is the FIRST lever at scale
    // (SkewSpec proves it splits); salting is the explicit second for
    // the one un-splittable hot key AQE can't help.
    "q_join_skew_salted" -> ((s, d) => {
      val od = orders(s, d).select(col("o_custkey"), col("o_orderkey"))
      val cu = customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_cents"))
      Skew.saltedEquiJoin(od, cu, "o_custkey", "c_custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("bal_cents")).as("sum_bal_cents"))
        .orderBy(col("c_mktsegment").asc)
    }),

    // Market-basket co-occurrence: top-20 part pairs bought in the same
    // order. NOT a self-join: a l_orderkey self-join re-shuffles lineitem
    // twice and the planner does not reuse the exchanges (measured: 4
    // exchanges, 34 s at sf10). Instead ONE collect_set aggregation per
    // order (partial map-side, dedup included — a part on two lines of
    // one order counts once), then pair expansion LOCAL to each basket
    // row (bounded: ~7 items → ≤ 21 pairs, nothing n² ever forms), then
    // the pair count. Two exchanges total, one pass over lineitem;
    // measured 17-19 s steady-state at sf10 vs 34 s for the self-join.
    // Top-20 fuses to TakeOrderedAndProject over a total (count, pair)
    // order.
    // Null-safe equality join (<=>): NULL keys MATCH a NULL dim row
    // instead of silently dropping — the "unattributed bucket" pattern
    // (unknown segment routes to a catch-all). Spark hashes EqualNullSafe
    // like a normal equi key (coalesce-wrapped), so this stays a hash
    // join, not a nested loop; DuckDB twin uses IS NOT DISTINCT FROM.
    // At scale the 6-row dim broadcasts; NULL is ONE key on the dim side
    // so no skew pathology beyond what the data had.
    "q_join_null_safe" -> ((s, d) => {
      import s.implicits._
      val c = customer(s, d).select(
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"),
        col("c_acctbal"))
      val dim = Seq(("AUTOMOBILE", 1L), ("FURNITURE", 2L), ("HOUSEHOLD", 3L),
        ("MACHINERY", 4L), (null.asInstanceOf[String], 5L))
        .toDF("d_seg", "seg_code")
      c.join(dim, col("seg") <=> col("d_seg"))
        .groupBy(col("seg_code"))
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.cents(col("c_acctbal"))).as("bal_cents"))
        .orderBy(col("seg_code").asc)
    }),

    "q_basket_pairs" -> ((s, d) => {
      val baskets = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("parts"))
        .filter(size(col("parts")) >= 2)
      baskets
        .select(explode(col("parts")).as("p_a"), col("parts"))
        .select(col("p_a"), explode(col("parts")).as("p_b"))
        .filter(col("p_a") < col("p_b"))
        .groupBy(col("p_a"), col("p_b")).agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("p_a").asc, col("p_b").asc)
        .limit(20)
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_join_null_safe" ->
      s"""WITH c AS (SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
         |           FROM customer),
         |d(d_seg, seg_code) AS (VALUES ('AUTOMOBILE', 1), ('FURNITURE', 2),
         |                              ('HOUSEHOLD', 3), ('MACHINERY', 4), (NULL, 5))
         |SELECT CAST(seg_code AS BIGINT) AS seg_code,
         |  CAST(COUNT(*) AS BIGINT) AS n_cust,
         |  ${sqlSumB(sqlCents("c_acctbal"))} AS bal_cents
         |FROM c JOIN d ON c.seg IS NOT DISTINCT FROM d.d_seg
         |GROUP BY seg_code ORDER BY seg_code ASC""".stripMargin,

    "q_join_inner_broadcast" ->
      """SELECT c_mktsegment,
        | COUNT(*) AS n_orders,
        | COUNT(DISTINCT o_custkey) AS n_custs,
        | MAX(o_totalprice) AS max_price,
        | MIN(o_totalprice) AS min_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC""".stripMargin,

    "q_join_5way" ->
      s"""SELECT r_name, year(o_orderdate) AS yr,
         | ${sqlSumB(sqlDiscE4("l_extendedprice", "l_discount"))} AS revenue_e4,
         | COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, year(o_orderdate)
         |ORDER BY r_name ASC, yr ASC""".stripMargin,

    "q_join_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         | CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
         | ${sqlSumB(sqlDiscE4("l_extendedprice", "l_discount"))} AS rev_e4
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name < n2.n_name
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation ASC, cust_nation ASC, l_year ASC""".stripMargin,

    "q_join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey ASC""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey ASC""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey ASC""".stripMargin,

    "q_join_theta_range" ->
      s"""SELECT s_suppkey, c_custkey,
         | abs(${sqlCents("s_acctbal")} - ${sqlCents("c_acctbal")}) AS bal_diff_cents
         |FROM supplier JOIN customer
         |  ON s_nationkey = c_nationkey
         | AND abs(${sqlCents("s_acctbal")} - ${sqlCents("c_acctbal")}) < 10000
         |ORDER BY s_suppkey ASC, c_custkey ASC""".stripMargin,

    // The plain (unbucketized) theta join — the companion must reduce the
    // SAME pair set the full query enumerates.
    "q_join_theta_range_agg" ->
      s"""SELECT s_nationkey,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | ${sqlSumB(s"abs(${sqlCents("s_acctbal")} - ${sqlCents("c_acctbal")})")} AS sum_diff_cents
         |FROM supplier JOIN customer
         |  ON s_nationkey = c_nationkey
         | AND abs(${sqlCents("s_acctbal")} - ${sqlCents("c_acctbal")}) < 10000
         |GROUP BY s_nationkey
         |ORDER BY s_nationkey ASC""".stripMargin,

    "q_join_asof" ->
      """SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS p_ms, MAX(epoch_ms(e.ts)) AS last_err_ms
        |FROM events p
        |LEFT JOIN events e
        |  ON e.user_id = p.user_id AND e.event_type = 'error'
        | AND epoch_ms(e.ts) <= epoch_ms(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id ASC""".stripMargin,

    "q_join_interval" ->
      """SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 60000
        |GROUP BY a.user_id
        |ORDER BY a.user_id ASC""".stripMargin,

    "q_join_full_outer" ->
      s"""SELECT COALESCE(c_custkey, o_custkey) AS custkey, acct_cents, n_big_orders
         |FROM (SELECT c_custkey, ${sqlCents("c_acctbal")} AS acct_cents
         |      FROM customer WHERE c_acctbal > 5000) c
         |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_big_orders
         |           FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey) o
         |  ON c_custkey = o_custkey
         |ORDER BY custkey ASC""".stripMargin,

    // The oracle runs the PLAIN join — salting must be output-invisible.
    "q_join_skew_salted" ->
      s"""SELECT c_mktsegment,
         | COUNT(*) AS n_orders,
         | ${sqlSumB(sqlCents("c_acctbal"))} AS sum_bal_cents
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment ASC""".stripMargin,

    "q_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, COUNT(*) AS n_orders
        |FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, p_a ASC, p_b ASC
        |LIMIT 20""".stripMargin
  )
}
