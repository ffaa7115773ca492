package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** THE corpus-schema canary (VERDICT r8 "next" #6).
  *
  * Round 8 lesson: the driver regenerated /root/testdata with a new
  * physical encoding for events.ts (TIMESTAMP(NANOS) -> µs TIMESTAMP_NTZ)
  * and the breakage surfaced as 26 scattered test failures, none of which
  * named the actual cause. This spec pins, in ONE place:
  *
  *   1. the RAW read dtype of every corpus column the engine touches —
  *      timestamp columns may legitimately arrive as either TimestampType
  *      or TimestampNTZType (both corpus generations are supported), all
  *      other columns are exact;
  *   2. that events.ts's raw dtype is inside `Tables.normalizeEventTs`'s
  *      supported set (Long / NTZ / Timestamp) — a THIRD encoding fails
  *      HERE by name, before anything else goes red;
  *   3. the POST-LOAD logical schema contract every operator compiles
  *      against (events.ts is TimestampType after normalization).
  */
class CorpusSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private val L = LongType; private val I = IntegerType
  private val D = DoubleType; private val S = StringType
  /** Either timestamp flavor — physical µs NTZ vs UTC-adjusted both read
    * to something every downstream expression (to_date, comparisons,
    * window()) handles identically under the pinned UTC session.
    */
  private object T

  private val expected: Map[String, Seq[(String, Any)]] = Map(
    "region" -> Seq("r_regionkey" -> I, "r_name" -> S),
    "nation" -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
    "customer" -> Seq("c_custkey" -> L, "c_name" -> S, "c_nationkey" -> I,
      "c_acctbal" -> D, "c_mktsegment" -> S),
    "supplier" -> Seq("s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> I,
      "s_acctbal" -> D),
    "part" -> Seq("p_partkey" -> L, "p_name" -> S, "p_brand" -> S,
      "p_type" -> S, "p_size" -> I, "p_retailprice" -> D),
    "orders" -> Seq("o_orderkey" -> L, "o_custkey" -> L, "o_orderstatus" -> S,
      "o_totalprice" -> D, "o_orderdate" -> T, "o_orderpriority" -> S),
    "lineitem" -> Seq("l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
      "l_linenumber" -> I, "l_quantity" -> D, "l_extendedprice" -> D,
      "l_discount" -> D, "l_tax" -> D, "l_returnflag" -> S,
      "l_linestatus" -> S, "l_shipdate" -> T),
    "events" -> Seq("event_id" -> L, "ts" -> T, "user_id" -> L,
      "event_type" -> S, "value" -> D, "props" -> S),
    "documents" -> Seq("doc_id" -> L, "text" -> S, "lang" -> S,
      "source" -> S, "n_chars" -> L),
    "embeddings" -> Seq("vec_id" -> L, "embedding" -> ArrayType(FloatType),
      "label" -> I))

  private def matches(actual: DataType, exp: Any): Boolean = exp match {
    case T => actual == TimestampType || actual == TimestampNTZType ||
      actual == LongType // ns-as-long legacy corpus generation
    case dt: DataType => actual == dt
  }

  test("canary: every corpus table's raw read schema matches the pinned contract") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      val actual = Tables.table(spark, d, t).schema
      val nameDiff =
        if (actual.fields.map(_.name).toSeq == cols.map(_._1)) Nil
        else Seq(s"$t: columns ${actual.fields.map(_.name).mkString(",")} != pinned ${cols.map(_._1).mkString(",")}")
      val typeDiffs = actual.fields.zip(cols).collect {
        case (f, (n, exp)) if f.name == n && !matches(f.dataType, exp) =>
          s"$t.$n: read as ${f.dataType} — outside the pinned contract ($exp). " +
            "The driver corpus was re-encoded; audit Tables loaders before re-pinning."
      }
      nameDiff ++ typeDiffs
    }
    assert(diffs.isEmpty, "\nCORPUS SCHEMA DRIFT:\n" + diffs.mkString("\n"))
  }

  test("canary: events.ts raw encoding is inside normalizeEventTs's supported set") {
    val raw = Tables.eventsTsPhysicalType(spark, s"$d/events.parquet")
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.ts arrived as $raw — a NEW corpus encoding. Extend Tables.normalizeEventTs " +
        "(and StreamOps.eventsRawSchema) before anything else; 18 queries depend on it.")
  }

  test("normalizeEventTs: all three supported encodings map to the same instant") {
    // The ns-as-long legacy corpus no longer exists on disk (the driver
    // regenerated to µs NTZ), so the LongType branch must be pinned by a
    // constructed frame or it rots untested. One wall-clock instant,
    // 2024-01-01T00:00:01.234567(890) UTC, through every branch:
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val us = 1704067201234567L
    val fromLong = Tables.normalizeEventTs(
      Seq(us * 1000L + 890L).toDF("ts")) // ns precision floors to µs
    val fromNtz = Tables.normalizeEventTs(
      Seq(us).toDF("raw").select(timestamp_micros(col("raw")).cast("timestamp_ntz").as("ts")))
    val fromTs = Tables.normalizeEventTs(
      Seq(us).toDF("raw").select(timestamp_micros(col("raw")).as("ts")))
    for ((name, df) <- Seq("long-ns" -> fromLong, "ntz-us" -> fromNtz, "ts-us" -> fromTs)) {
      assert(df.schema("ts").dataType == TimestampType, name)
      val got = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == us, s"$name: normalized to $got µs, expected $us")
    }
    val boom = intercept[IllegalStateException] {
      Tables.normalizeEventTs(Seq("oops").toDF("ts"))
    }
    assert(boom.getMessage.contains("unsupported physical encoding"))
  }

  test("canary: post-load contract — events.ts normalizes to TimestampType") {
    val ev = Tables.events(spark, d)
    assert(ev.schema("ts").dataType == TimestampType)
    // and the stream-side read agrees with the batch side
    val st = streaming.StreamOps.eventsStream(spark, s"$d/events.parquet")
    assert(st.schema("ts").dataType == TimestampType)
    assert(st.schema.fields.map(_.name).toSeq == ev.schema.fields.map(_.name).toSeq)
  }
}
