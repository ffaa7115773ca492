package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.29 — the two modern-SQL surfaces the registry did not yet
  * exercise: recursive CTEs (Spark 4's UnionLoop operator) and the VARIANT
  * semi-structured type.
  *
  *   - q_rec_date_spine: the canonical recursive-CTE workload — generate a
  *     complete month spine over a fixed calendar window, LEFT JOIN the
  *     monthly order aggregate onto it so empty months surface as explicit
  *     zero rows (the report-scaffold/gap-fill shape every warehouse runs).
  *     ONE SQL string valid in both engines (the TpchOps sqlBoth
  *     discipline), so Spark's UnionLoop and DuckDB's recursive evaluator
  *     are compared bit-for-bit. The anchors deliberately overhang the
  *     corpus's order-date range (1995-01..2001-08) by two months on each
  *     side so the COALESCE path is provably exercised (4 zero rows at
  *     every sf).
  *   - q_fn_variant: events.props ingested as VARIANT (parse_json), typed
  *     scalars extracted with variant_get/try_variant_get, per-row type
  *     introspected with schema_of_variant — aggregated per event_type.
  *     Only engine-neutral scalars cross the oracle boundary; the DuckDB
  *     twin reads the same fields through its JSON operators
  *     (json_extract_string/json_type), so the VARIANT path is verified
  *     against an independent semi-structured implementation.
  *
  * Scale posture: the spine is calendar-sized (84 rows — recursion depth
  * bounded by the window, far under Spark's 100-level default) and joins
  * against a two-phase month aggregate of orders; the fact scan is the only
  * data-sized work and it prunes to (o_orderdate, o_totalprice). VARIANT
  * parse/extract is map-only per row and feeds a standard partial-agg
  * shuffle keyed by the 5-value event_type — at 100 TB the binary-encoded
  * VARIANT avoids re-parsing JSON once per extracted field (one parse, N
  * typed gets), which is exactly its production rationale.
  *
  * Determinism (§7.3): money through DECIMAL(18,2)→cents BIGINT; spine
  * months are DATE-typed in both engines (DuckDB's date+INTERVAL yields
  * TIMESTAMP, so the step re-casts); ORDER BY ends in a unique key.
  */
object ModernSqlOps extends QueryPack {

  /** Valid verbatim in Spark 4 and DuckDB. */
  private val recDateSpineSql: String =
    """WITH RECURSIVE spine(m) AS (
      |  SELECT DATE '1994-11-01'
      |  UNION ALL
      |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
      |  WHERE m < DATE '2001-10-01'
      |),
      |mo AS (
      |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders,
      |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT s.m, COALESCE(mo.n_orders, 0) AS n_orders,
      |       COALESCE(mo.cents, 0) AS cents
      |FROM spine s LEFT JOIN mo ON s.m = mo.m
      |ORDER BY s.m ASC""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_rec_date_spine" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(recDateSpineSql)
    }),

    "q_fn_variant" -> ((s, d) => {
      // The corpus's props is always {"k": N} — a field present in EVERY
      // row can't exercise try_variant_get's null path, so inject an
      // "extra" field into every 3rd user's JSON before parsing. The probe
      // then returns a value on some rows and NULL on the rest, and n_miss
      // varies per group (the r9 version probed a never-present path, so
      // n_miss == n by construction on both engines — vacuous).
      val raw = when(pmod(col("user_id"), lit(3)) === 0,
        concat(col("props").substr(lit(1), length(col("props")) - 1),
          lit(", \"extra\": 7}"))).otherwise(col("props"))
      val v = parse_json(raw)
      Tables.events(s, d)
        .select(
          col("event_type"),
          variant_get(v, "$.k", "bigint").as("k"),
          try_variant_get(v, "$.extra", "bigint").as("miss"),
          schema_of_variant(v).as("sov"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"),
          sum(when(col("sov").startsWith("OBJECT"), 1L).otherwise(0L))
            .cast(LongType).as("n_obj"),
          sum(when(col("miss").isNull, 1L).otherwise(0L))
            .cast(LongType).as("n_miss"))
        .orderBy(col("event_type").asc)
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_rec_date_spine" -> recDateSpineSql,

    "q_fn_variant" ->
      """SELECT event_type,
        | COUNT(*) AS n,
        | min(k) AS min_k,
        | max(k) AS max_k,
        | CAST(SUM(k) AS BIGINT) AS sum_k,
        | CAST(SUM(CASE WHEN jt = 'OBJECT' THEN 1 ELSE 0 END) AS BIGINT) AS n_obj,
        | CAST(SUM(CASE WHEN miss IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_miss
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(j, '$.k') AS BIGINT) AS k,
        |        CAST(json_extract_string(j, '$.extra') AS BIGINT) AS miss,
        |        json_type(j::JSON) AS jt
        |      FROM (SELECT event_type,
        |              CASE WHEN user_id % 3 = 0
        |                   THEN substring(props, 1, length(props) - 1) || ', "extra": 7}'
        |                   ELSE props END AS j
        |            FROM events))
        |GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin
  )
}
