package graft.functions

import graft.QueryPack
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.8 — scalar function pack (string / regex / date / math /
  * cast-case / array / map / json).
  *
  * Cross-engine rules applied throughout (SURVEY §7.3):
  *  - every int-producing function result is cast to BIGINT on both sides
  *    (Spark length/instr/datediff return INT, DuckDB returns BIGINT);
  *  - booleans cross the oracle boundary as BIGINT 0/1;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all;
  *  - round() on doubles is half-away-from-zero in BOTH engines (Spark
  *    BigDecimal HALF_UP, DuckDB std::round) — verified, safe to use;
  *  - maps never cross the boundary, only scalars extracted from them;
  *  - no dayofweek (origin differs), no transcendentals (libm rounding).
  *
  * Scale: every query here is a pure per-row projection over one table —
  * single WholeStageCodegen stage, no shuffle except the final orderBy for
  * the deterministic dump (and TakeOrderedAndProject where LIMIT applies).
  */
object FnOps extends QueryPack {

  private def bi(c: org.apache.spark.sql.Column) = c.cast(LongType)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> ((s, d) => {
      customer(s, d)
        .select(
          col("c_custkey"),
          concat(col("c_name"), lit("_"), lower(col("c_mktsegment"))).as("full_tag"),
          upper(col("c_mktsegment")).as("seg_up"),
          substring(col("c_name"), 1, 8).as("name8"),
          lpad(col("c_custkey").cast("string"), 9, "0").as("key_pad"),
          replace(col("c_name"), lit("#"), lit("-")).as("name_dash"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("seg_trim"),
          bi(length(col("c_name"))).as("name_len"),
          bi(instr(col("c_name"), "#")).as("hash_pos"))
        .orderBy(col("c_custkey").asc)
        .limit(1000)
    }),

    "q_fn_regex" -> ((s, d) => {
      customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#([0-9]+)", 1).as("digits"),
          // try_cast: a non-matching name extracts "" and ANSI CAST('' AS
          // BIGINT) would throw; NULL is the right answer for that row.
          expr("try_cast(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT)")
            .as("digits_num"),
          regexp_replace(col("c_name"), "[0-9]", "*").as("masked"),
          bi(col("c_name").rlike("^Customer#[0-9]+$")).as("is_cust"))
        .orderBy(col("c_custkey").asc)
        .limit(1000)
    }),

    "q_fn_date" -> ((s, d) => {
      val od = to_date(col("o_orderdate"))
      orders(s, d)
        .select(
          col("o_orderkey"),
          od.as("od"),
          bi(year(od)).as("yr"),
          bi(month(od)).as("mo"),
          bi(dayofmonth(od)).as("dy"),
          bi(quarter(od)).as("qtr"),
          to_date(date_trunc("month", od)).as("month_start"),
          date_add(od, 30).as("plus30"),
          bi(datediff(od, to_date(lit("1995-01-01")))).as("days_since"),
          last_day(od).as("eom"))
        .orderBy(col("o_orderkey").asc)
        .limit(1000)
    }),

    "q_fn_math" -> ((s, d) => {
      val v = cents(col("l_extendedprice"))
      lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          v.as("v_cents"),
          abs(v - 500000L).as("abs_diff"),
          bi(floor(v / 1000.0)).as("fl"),
          bi(ceil(v / 1000.0)).as("ce"),
          bi(round(v / 10.0)).as("rd"),
          pmod(v, lit(7L)).as("pm"),
          greatest(v, lit(100000L)).as("gr"),
          least(v, lit(100000L)).as("le"),
          bi(signum(v.cast("double") - 500000.0)).as("sg"),
          // round() first: double->long truncates in Spark but rounds in
          // DuckDB; agreement must not hinge on integer-valued fixtures.
          (bi(round(col("l_quantity"))) * bi(round(col("l_quantity")))).as("qty_sq"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("v_cents").asc, col("qty_sq").asc)
        .limit(1000)
    }),

    "q_fn_cast_case" -> ((s, d) => {
      part(s, d)
        .select(
          col("p_partkey"),
          col("p_partkey").cast("string").as("key_str"),
          bi(col("p_partkey").cast("string")).as("key_back"),
          expr("try_cast(substring(p_brand, 7, 5) AS BIGINT)").as("brand_num"),
          expr("try_cast(p_type AS BIGINT)").as("try_bad"),
          when(col("p_size") < 10,
              when(col("p_brand") === "Brand#1", lit("tiny-b1")).otherwise(lit("tiny")))
            .when(col("p_size") < 30, lit("mid"))
            .otherwise(lit("large")).as("size_case"))
        .orderBy(col("p_partkey").asc)
        .limit(1000)
    }),

    "q_fn_array" -> ((s, d) => {
      val toks = split(col("text"), " ")
      documents(s, d)
        .select(
          col("doc_id"),
          bi(size(toks)).as("n_toks"),
          bi(size(array_distinct(toks))).as("n_uniq"),
          element_at(sort_array(toks), 1).as("first_tok"),
          element_at(sort_array(toks), -1).as("last_tok"),
          bi(array_contains(toks, "the")).as("has_the"))
        .orderBy(col("doc_id").asc)
    }),

    // MapType is exercised Spark-side; only scalars extracted from the map
    // cross the oracle boundary (map parquet encodings differ across engines).
    "q_fn_map" -> ((s, d) => {
      val m = map(col("event_type"), cents(col("value")))
      events(s, d)
        .select(
          col("event_id"),
          // try_element_at: ANSI mode (Spark 4 default) makes plain
          // element_at throw on a missing map key; we want NULL.
          try_element_at(m, lit("click")).as("click_cents"),
          bi(size(m)).as("m_size"),
          element_at(map_keys(m), 1).as("m_key"))
        .orderBy(col("event_id").asc)
        .limit(1000)
    }),

    "q_fn_json" -> ((s, d) => {
      events(s, d)
        .withColumn("k", bi(get_json_object(col("props"), "$.k")))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type").asc)
    }),

    // Calendar-part toolkit beyond q_fn_date: month arithmetic, ISO week,
    // day-of-week/year, date construction — the feature-engineering date
    // pack. dayofweek is Sunday-based (1..7) in Spark; the oracle twin
    // maps DuckDB's 0-based dow to match. Pure projection, one codegen
    // stage.
    "q_fn_date2" -> ((s, d) => {
      val od = to_date(col("o_orderdate"))
      orders(s, d)
        .select(
          col("o_orderkey"),
          od.as("od"),
          add_months(od, 3).as("plus3m"),
          bi(weekofyear(od)).as("wk_iso"),
          bi(dayofweek(od)).as("dow_sun"),
          bi(dayofyear(od)).as("doy"),
          make_date(year(od), lit(1), lit(1)).as("year_start"))
        .orderBy(col("o_orderkey").asc)
        .limit(2000)
    }),

    // Bitwise manipulation — and/or/xor, shifts, popcount — the integer
    // tool-kit behind hash bucketing, bitmask flags, and the simhash-style
    // fingerprint math elsewhere in the repo. Pure per-row projection in
    // one codegen stage; all results stay bigint (bit_count returns int in
    // Spark, re-widened so both engines emit i64).
    "q_fn_bitwise" -> ((s, d) => {
      val k = col("l_orderkey")
      lineitem(s, d)
        .select(k, col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          k.bitwiseAND(lit(255L)).as("band"),
          k.bitwiseOR(lit(4096L)).as("bor"),
          k.bitwiseXOR(col("l_partkey")).as("bxor"),
          shiftleft(k, 2).as("shl"),
          shiftright(k, 3).as("shr"),
          bi(bit_count(k)).as("nbits"))
        // (orderkey, linenumber) is NOT unique in this synthetic corpus —
        // the full 4-column key is (verified at sf0.01/sf0.1).
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_partkey").asc, col("l_suppkey").asc)
        .limit(2000)
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT c_custkey,
        | c_name || '_' || lower(c_mktsegment) AS full_tag,
        | upper(c_mktsegment) AS seg_up,
        | substring(c_name, 1, 8) AS name8,
        | lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_pad,
        | replace(c_name, '#', '-') AS name_dash,
        | trim('  ' || c_mktsegment || '  ') AS seg_trim,
        | CAST(length(c_name) AS BIGINT) AS name_len,
        | CAST(instr(c_name, '#') AS BIGINT) AS hash_pos
        |FROM customer
        |ORDER BY c_custkey ASC
        |LIMIT 1000""".stripMargin,

    "q_fn_regex" ->
      """SELECT c_custkey,
        | regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS digits,
        | TRY_CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT) AS digits_num,
        | regexp_replace(c_name, '[0-9]', '*', 'g') AS masked,
        | CAST(regexp_matches(c_name, '^Customer#[0-9]+$') AS BIGINT) AS is_cust
        |FROM customer
        |ORDER BY c_custkey ASC
        |LIMIT 1000""".stripMargin,

    "q_fn_date" ->
      """SELECT o_orderkey, od,
        | CAST(year(od) AS BIGINT) AS yr,
        | CAST(month(od) AS BIGINT) AS mo,
        | CAST(day(od) AS BIGINT) AS dy,
        | CAST(quarter(od) AS BIGINT) AS qtr,
        | CAST(date_trunc('month', od) AS DATE) AS month_start,
        | od + 30 AS plus30,
        | CAST(datediff('day', DATE '1995-01-01', od) AS BIGINT) AS days_since,
        | last_day(od) AS eom
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
        |ORDER BY o_orderkey ASC
        |LIMIT 1000""".stripMargin,

    "q_fn_math" ->
      s"""SELECT l_orderkey, l_linenumber,
         | v AS v_cents,
         | abs(v - 500000) AS abs_diff,
         | CAST(floor(v / 1000.0) AS BIGINT) AS fl,
         | CAST(ceil(v / 1000.0) AS BIGINT) AS ce,
         | CAST(round(v / 10.0) AS BIGINT) AS rd,
         | ((v % 7) + 7) % 7 AS pm,
         | greatest(v, 100000) AS gr,
         | least(v, 100000) AS le,
         | CAST(sign(CAST(v AS DOUBLE) - 500000.0) AS BIGINT) AS sg,
         | CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT) AS qty_sq
         |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
         |        ${sqlCents("l_extendedprice")} AS v FROM lineitem)
         |ORDER BY l_orderkey ASC, l_linenumber ASC, v_cents ASC, qty_sq ASC
         |LIMIT 1000""".stripMargin,

    "q_fn_cast_case" ->
      """SELECT p_partkey,
        | CAST(p_partkey AS VARCHAR) AS key_str,
        | CAST(CAST(p_partkey AS VARCHAR) AS BIGINT) AS key_back,
        | TRY_CAST(substring(p_brand, 7, 5) AS BIGINT) AS brand_num,
        | TRY_CAST(p_type AS BIGINT) AS try_bad,
        | CASE WHEN p_size < 10 THEN
        |        CASE WHEN p_brand = 'Brand#1' THEN 'tiny-b1' ELSE 'tiny' END
        |      WHEN p_size < 30 THEN 'mid'
        |      ELSE 'large' END AS size_case
        |FROM part
        |ORDER BY p_partkey ASC
        |LIMIT 1000""".stripMargin,

    "q_fn_array" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        | list_sort(string_split(text, ' '))[1] AS first_tok,
        | list_sort(string_split(text, ' '))[-1] AS last_tok,
        | CAST(list_contains(string_split(text, ' '), 'the') AS BIGINT) AS has_the
        |FROM documents
        |ORDER BY doc_id ASC""".stripMargin,

    "q_fn_map" ->
      s"""SELECT event_id,
         | CASE WHEN event_type = 'click' THEN ${sqlCents("value")} END AS click_cents,
         | CAST(1 AS BIGINT) AS m_size,
         | event_type AS m_key
         |FROM events
         |ORDER BY event_id ASC
         |LIMIT 1000""".stripMargin,

    "q_fn_json" ->
      """SELECT event_type,
        | COUNT(*) AS n,
        | min(k) AS min_k,
        | max(k) AS max_k,
        | CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type
        |ORDER BY event_type ASC""".stripMargin,

    "q_fn_date2" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        | CAST(datepart('week', CAST(o_orderdate AS DATE)) AS BIGINT) AS wk_iso,
        | CAST(datepart('dow', CAST(o_orderdate AS DATE)) AS BIGINT) + 1 AS dow_sun,
        | CAST(datepart('doy', CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
        | make_date(CAST(datepart('year', CAST(o_orderdate AS DATE)) AS INT), 1, 1)
        |   AS year_start
        |FROM orders
        |ORDER BY o_orderkey ASC
        |LIMIT 2000""".stripMargin,

    "q_fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | l_orderkey & 255 AS band,
        | l_orderkey | 4096 AS bor,
        | xor(l_orderkey, l_partkey) AS bxor,
        | l_orderkey << 2 AS shl,
        | l_orderkey >> 3 AS shr,
        | CAST(bit_count(l_orderkey) AS BIGINT) AS nbits
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_partkey ASC, l_suppkey ASC
        |LIMIT 2000""".stripMargin
  )
}
