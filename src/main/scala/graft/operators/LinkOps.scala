package graft.operators

import graft.QueryPack
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.28 — record linkage + change-data-capture shapes: the two
  * pipeline families the registry did not yet exercise.
  *
  *   - q_er_fuzzy_parts: entity resolution by BLOCKED fuzzy match. The
  *     canonical ER discipline at scale: (1) canonicalize to DISTINCT
  *     values first (the match runs over the value vocabulary, never the
  *     row count — here 64 names at every sf; at 100 TB, vocab-sized not
  *     corpus-sized), (2) equi-join on a blocking key so the quadratic
  *     comparator only ever runs inside blocks (never an all-pairs cross),
  *     (3) a codegen'd Levenshtein residual inside the block, (4) join
  *     multiplicities back as counts, not rows. The blocking key is the
  *     head noun (second token); the edit-distance comparator runs on the
  *     qualifier token.
  *   - q_cdc_scd2: slowly-changing-dimension type-2 build from an event
  *     log — collapse consecutive same-state rows per key (lag over the
  *     key-partitioned time sort), then interval-ize the survivors (lead
  *     over the SAME partitioning). Both windows share one exchange: the
  *     intermediate filter preserves (user_id) partitioning and the
  *     (ms, event_id) sort, so Catalyst plans exactly one shuffle+sort
  *     for the whole query (PlanSpec-asserted). This is the standard
  *     dimension-history build a warehouse load runs per batch; state
  *     per key is bounded by change count, not event count.
  *
  * Determinism (§7.3): window sorts end in the unique event_id; final
  * ORDER BY covers every output column that participates in row identity
  * ((name_a, name_b) unique; (user_id, valid_from_ms) unique — no
  * same-ms ties per user in any corpus sf, and `state` closes the order
  * anyway). Counts/distances cast to BIGINT per the oracle type policy.
  */
object LinkOps extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_er_fuzzy_parts" -> ((s, d) => {
      // Canonicalize first: the comparator input is the distinct-name
      // vocabulary with multiplicities, not 20k/2M/200M part rows.
      val names = part(s, d)
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
        .select(col("p_name"), col("n_parts"),
          split_part(col("p_name"), lit(" "), lit(2)).as("blk"),
          split_part(col("p_name"), lit(" "), lit(1)).as("w1"))
      val a = names.select(col("p_name").as("name_a"), col("n_parts").as("na"),
        col("blk"), col("w1").as("w1a"))
      val b = names.select(col("p_name").as("name_b"), col("n_parts").as("nb"),
        col("blk").as("blk_b"), col("w1").as("w1b"))
      // Equi-join on the block key; the quadratic comparator never leaves
      // the block. Both sides are vocab-sized so this broadcasts; at a
      // larger vocabulary it degrades to a hash shuffle on blk — still
      // never an all-pairs cross (PlanSpec polices cartesians).
      a.join(b, col("blk") === col("blk_b") && col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("w1a"), col("w1b")).cast(LongType))
        .filter(col("dist").between(1, 2))
        .select(col("name_a"), col("name_b"), col("dist"),
          (col("na") * col("nb")).as("n_pairs"))
        .orderBy(col("name_a").asc, col("name_b").asc)
    }),

    "q_cdc_scd2" -> ((s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ms").asc, col("event_id").asc)
      events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_type").as("state"),
          col("ms").as("valid_from_ms"),
          lead(col("ms"), 1).over(wOrd).as("valid_to_ms"),
          lead(col("ms"), 1).over(wOrd).isNull.as("is_current"))
        .orderBy(col("user_id").asc, col("valid_from_ms").asc, col("state").asc)
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_er_fuzzy_parts" ->
      """WITH names AS (SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
        |               FROM part GROUP BY p_name),
        |toks AS (SELECT p_name, n_parts, split_part(p_name, ' ', 2) AS blk,
        |                split_part(p_name, ' ', 1) AS w1 FROM names)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.w1, b.w1) AS BIGINT) AS dist,
        |       a.n_parts * b.n_parts AS n_pairs
        |FROM toks a JOIN toks b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.w1, b.w1) BETWEEN 1 AND 2
        |ORDER BY name_a ASC, name_b ASC""".stripMargin,

    "q_cdc_scd2" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
        |            FROM events),
        |chg AS (SELECT user_id, event_type, ms, event_id,
        |          LAG(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ms ASC, event_id ASC) AS prev_type
        |        FROM ev)
        |SELECT user_id, event_type AS state, ms AS valid_from_ms,
        |       LEAD(ms) OVER (PARTITION BY user_id
        |            ORDER BY ms ASC, event_id ASC) AS valid_to_ms,
        |       LEAD(ms) OVER (PARTITION BY user_id
        |            ORDER BY ms ASC, event_id ASC) IS NULL AS is_current
        |FROM chg WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY user_id ASC, valid_from_ms ASC, state ASC""".stripMargin
  )
}
