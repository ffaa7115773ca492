package graft

import org.apache.spark.sql.SparkSession

/** The library's one supported SparkSession construction path. Centralizes
  * the configuration every graft entry point (Verify, Bench, tests) needs:
  *
  *   - `spark.sql.session.timeZone=UTC` — cross-engine date/timestamp
  *     determinism (the DuckDB oracle runs in UTC).
  *   - `spark.sql.legacy.parquet.nanosAsLong=true` — events.ts is parquet
  *     TIMESTAMP(NANOS), which Spark 4 rejects by default; reading it as a
  *     nanos long (then truncating to µs in Tables.events) matches DuckDB's
  *     ns→µs floor. Setting it HERE, at session construction, is the
  *     supported contract; the defensive set inside Tables.events is only a
  *     fallback for host sessions that bypassed this builder (and a host
  *     that wants TIMESTAMP(NANOS) errors elsewhere simply must not call
  *     Tables.events — that is the opt-out).
  *   - pinned `spark.sql.shuffle.partitions` — sized to the worker count,
  *     not Spark's default 200: at local scale 200 post-shuffle tasks are
  *     pure scheduling overhead; on a real cluster the caller passes the
  *     cluster-appropriate value.
  */
object Sessions {

  /** Pre-configured builder, for callers that need extra configs on top. */
  def builder(master: String, shufflePartitions: Int,
              appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build (or reuse) the session and quiet the log noise.
    *
    * getOrCreate silently ignores builder configs when a host JVM already
    * holds a session, so the runtime-settable SQL confs the oracle
    * comparison depends on (UTC session timezone, nanosAsLong) are
    * re-asserted on the live conf here — they apply to an adopted session
    * too. Only the session-construction-time settings (master, shuffle
    * partitions) remain best-effort in that case.
    */
  def build(master: String, shufflePartitions: Int,
            appName: String = "graft"): SparkSession = {
    val s = builder(master, shufflePartitions, appName).getOrCreate()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
