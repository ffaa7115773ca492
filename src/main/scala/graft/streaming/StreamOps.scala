package graft.streaming

import graft.QueryPack
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.10 — event-time windowing, formulated once and run both ways.
  *
  * The three aggregations below are written as plain transforms over a
  * (ts, user_id, event_type, value)-shaped DataFrame, so the SAME function
  * drives (a) the batch oracle rows here and (b) `readStream`/`MemoryStream`
  * suites (StreamingSpec) — which is exactly Structured Streaming's model:
  * a streaming query IS the batch query, incrementalized.
  *
  * Cross-engine determinism: window starts cross the oracle boundary as
  * epoch millis/micros BIGINT (never as timestamps — engines disagree on
  * timezone rendering), money as exact cents, and all window arithmetic is
  * epoch-aligned exactly as Spark's `window()` defines it.
  *
  * Scale: tumbling/sliding/session aggregation shuffles on (window-bucket,
  * key) — high cardinality, partial aggregation applies; in streaming mode
  * the same plans run with watermark-bounded state.
  */
object StreamOps extends QueryPack {

  /** Raw events parquet schema for the streaming file source. readStream
    * requires an explicit schema (and the at-scale policy wants one), but
    * the corpus has shipped `ts` under two physical encodings (ns-as-long
    * vs µs NTZ — Tables.events scaladoc), so the declared type of `ts`
    * must match the files on disk: a parametrized schema, not a constant.
    */
  def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The events table as a STREAM from the parquet file source — probes the
    * dir's actual `ts` encoding (footer-only batch schema read) to pin the
    * readStream schema, then applies the SAME normalization as the batch
    * loader (Tables.normalizeEventTs), so every transform in this pack runs
    * identically over both.
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame =
    normalizeEventTs(
      s.readStream.schema(eventsRawSchema(eventsTsPhysicalType(s, dir))).parquet(dir))

  /** 1-hour tumbling count + exact-cents sum per event_type. */
  def tumblingAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("val_cents"))
      .select(unix_millis(col("w.start")).as("win_start_ms"),
        col("event_type"), col("n"), col("val_cents"))

  /** 10-minute windows sliding every 5 minutes (each event in exactly 2). */
  def slidingAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("win_start_ms"), col("event_type"), col("n"))

  /** 5-minute-gap sessions per user: start, event count, exact-cents sum. */
  def sessionAgg(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("val_cents"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"), col("val_cents"))

  /** Stream-static enrichment: events joined to the customer->nation dims,
    * rolled up per nation. The dim sides are plain BATCH DataFrames — in a
    * streaming query Spark re-resolves the static side each micro-batch
    * (broadcast at dim size), the canonical "enrich a stream with a
    * dimension table" shape; the stream side shuffles only for the final
    * aggregate. user_id is 0-based and c_custkey 1-based, hence the +1.
    */
  def enrichAgg(ev: DataFrame, cust: DataFrame, nat: DataFrame): DataFrame =
    ev.join(cust.select(col("c_custkey"), col("c_nationkey")),
        col("user_id") + 1 === col("c_custkey"))
      .join(nat.select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("val_cents"))

  /** View→purchase attribution: pair every view with the same user's
    * purchases in the following 2 hours. As a STREAM-STREAM interval join
    * (StreamingSpec's q_stream_join leg) both inputs carry watermarks and
    * the time-range condition bounds join state to the 2h+watermark span —
    * Structured Streaming's canonical state-bounded two-stream shape. The
    * batch twin here is the SAME function over the events table split by
    * type. Delta crosses the oracle boundary as exact BIGINT micros.
    *
    * Scale: both sides shuffle on user_id (the equi key); the range
    * condition evaluates post-probe. Per-user event counts are bounded
    * (activity per user, not corpus-sized), so no skew blowup; in
    * streaming mode state is per-user rows inside the watermark horizon.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      joinType: String = "inner"): DataFrame =
    views.alias("v").join(purchases.alias("p"),
        col("v.user_id") === col("p.user_id") &&
          col("p.ts") > col("v.ts") &&
          col("p.ts") <= col("v.ts") + expr("INTERVAL 2 HOURS"),
        joinType)
      .select(col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("p.event_id").as("purchase_id"),
        (unix_micros(col("p.ts")) - unix_micros(col("v.ts"))).as("delta_us"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_join" -> ((s, d) => {
      val ev = events(s, d)
      attributionJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
        .orderBy(col("view_id").asc, col("purchase_id").asc)
    }),
    "q_stream_tumbling" -> ((s, d) =>
      tumblingAgg(events(s, d))
        .orderBy(col("win_start_ms").asc, col("event_type").asc)),

    "q_stream_enrich" -> ((s, d) =>
      enrichAgg(events(s, d), customer(s, d), nation(s, d))
        .orderBy(col("n_name").asc)),

    "q_stream_sliding" -> ((s, d) =>
      slidingAgg(events(s, d))
        .orderBy(col("win_start_ms").asc, col("event_type").asc)),

    "q_stream_session" -> ((s, d) =>
      sessionAgg(events(s, d))
        .orderBy(col("user_id").asc, col("session_start_us").asc))
  )

  override def oracle: Map[String, String] = Map(
    // Interval self-join split by type; delta in exact epoch micros (both
    // engines store events.ts at us precision — no rounding anywhere).
    "q_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        | epoch_us(p.ts) - epoch_us(v.ts) AS delta_us
        |FROM events v JOIN events p ON v.user_id = p.user_id
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR
        |ORDER BY view_id ASC, purchase_id ASC""".stripMargin,

    "q_stream_enrich" ->
      s"""SELECT n_name, COUNT(*) AS n_events,
         | ${sqlSumB(sqlCents("value"))} AS val_cents
         |FROM events
         |JOIN customer ON user_id + 1 = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name ASC""".stripMargin,

    // date_trunc to the hour == epoch-aligned 1h tumbling window.
    "q_stream_tumbling" ->
      s"""SELECT epoch_ms(date_trunc('hour', ts)) AS win_start_ms, event_type,
         | COUNT(*) AS n, ${sqlSumB(sqlCents("value"))} AS val_cents
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY win_start_ms ASC, event_type ASC""".stripMargin,

    // An event at epoch-ms t sits in the two epoch-aligned 10-min windows
    // starting at floor(t/5min)*5min and that minus 5min (Spark's exact
    // assignment rule for slide=5min, size=10min, origin=epoch).
    "q_stream_sliding" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms, event_type FROM events),
        |w AS (
        |  SELECT (ms // 300000) * 300000 AS win_start_ms, event_type FROM e
        |  UNION ALL
        |  SELECT ((ms // 300000) - 1) * 300000 AS win_start_ms, event_type FROM e
        |)
        |SELECT win_start_ms, event_type, COUNT(*) AS n
        |FROM w
        |GROUP BY 1, 2
        |ORDER BY win_start_ms ASC, event_type ASC""".stripMargin,

    // Spark session_window merges an event whose gap to the previous event
    // is <= the gap duration (boundary verified in GoldenSpec: a gap of
    // exactly 5 min still merges), so a new session starts at gap > 5 min.
    // Replicated via lag-gap flag + running sum as the session id, at full
    // microsecond precision (events.ts is us-precise in both engines).
    "q_stream_session" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, ${sqlCents("value")} AS vc
         |           FROM events),
         |m AS (SELECT user_id, us, vc,
         |        CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         |               OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 300000000
         |             THEN 1 ELSE 0 END AS new_s
         |      FROM e),
         |s AS (SELECT user_id, us, vc,
         |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |      FROM m)
         |SELECT user_id, MIN(us) AS session_start_us,
         | COUNT(*) AS n_events, ${sqlSumB("vc")} AS val_cents
         |FROM s
         |GROUP BY user_id, sid
         |ORDER BY user_id ASC, session_start_us ASC""".stripMargin
  )
}
