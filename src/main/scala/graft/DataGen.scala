package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, LongType}

/** Deterministic synthetic-corpus generator for scale testing.
  *
  * The driver ships read-only corpora up to sf0.1 (`TESTDATA.md`); proving
  * the 100 TB posture needs a 10–30× local scale-up (VERDICT r2 "next" #1).
  * This main regenerates the FIXTURES.md §1 schemas + measured value domains
  * at any sf, e.g.:
  *
  *   sbt "runMain graft.DataGen 1 localdata/sf1"
  *
  * Fidelity notes (all domains measured from the sf0.1 corpus, FIXTURES.md):
  *   - row counts scale exactly like the driver corpus (lineitem 6M·sf, 4
  *     lines/order via linenumber 1..7, users 15000·sf, documents 50k·sf).
  *   - documents draw 10–100 tokens uniformly from the SAME 31-word vocab,
  *     which reproduces the corpus's heavy near-duplication (~25% of doc
  *     pairs at token-Jaccard ≥ 0.8) — the property that stresses the LSH
  *     dedup family's bucket skew.
  *   - embeddings are unit-norm 64-dim with 10 weak label clusters
  *     (measured: centroid separation ~0.09, within-cluster std ~0.125).
  *   - timestamps (events.ts, o_orderdate, l_shipdate) are written as
  *     TIMESTAMP(MICROS, isAdjustedToUTC=false) — i.e. TIMESTAMP_NTZ
  *     columns — matching the regenerated driver corpus's physical
  *     encoding exactly (round 8: the corpus moved from TIMESTAMP(NANOS)
  *     to µs NTZ; DataGenSpec's schema gate now pins read-schema identity
  *     against /root/testdata so a future divergence fails by name).
  *
  * Randomness is xxhash64 over (row id, column salt) — per-row, per-column
  * independent, deterministic across runs and partitionings, and fully
  * distributed (no driver-side RNG state).
  */
object DataGen {

  /** Uniform long in [0, n) from the row id and a column salt. */
  private def h(id: Column, salt: Int, n: Long): Column =
    pmod(xxhash64(id, lit(salt)), lit(n))

  /** Uniform 2dp-exact double in [lo/100, (lo+n-1)/100]. */
  private def money(id: Column, salt: Int, lo: Long, n: Long): Column =
    ((h(id, salt, n) + lit(lo)).cast("double") / 100.0)

  private def pick(id: Column, salt: Int, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*), (h(id, salt, vals.size) + 1).cast(IntegerType))

  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val Segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PTypes = Seq("ECONOMY", "SMALL", "MEDIUM", "PROMO", "STANDARD", "LARGE")
  private val PAdj = Seq("large", "hot", "blue", "old", "cold", "red", "small", "new")
  private val PNoun = Seq("ring", "bolt", "plate", "widget", "gear", "pin", "cap", "rod")

  /** documents table at nDocs rows — public so specs can gate the
    * generator's DISTRIBUTION (near-dup density, token domains) without a
    * parquet round-trip; main() writes exactly this frame.
    */
  def documentsFrame(s: SparkSession, nDocs: Long): DataFrame = {
    val vocabArr = array(Vocab.map(lit): _*)
    s.range(0, nDocs, 1, 16).toDF("id")
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), (h(col("id"), 81, 91) + 10).cast(IntegerType)),
          i => element_at(vocabArr,
            (pmod(xxhash64(col("id"), i, lit(82)), lit(31)) + 1).cast(IntegerType))))
          .as("text"))
      .select(col("doc_id"), col("text"),
        pick(col("doc_id"), 83, Seq("de", "en", "es", "fr", "zh")).as("lang"),
        concat(lit("src"), h(col("doc_id"), 84, 20).cast("string")).as("source"),
        length(col("text")).cast(LongType).as("n_chars"))
  }

  /** embeddings table at nEmb rows — public for the same reason (and for
    * density-matched ANN recall gates: sf1 density = 20000 rows).
    * label centroids: small deterministic offsets (scale ~0.02/dim) +
    * noise (uniform ±0.216 ≈ std 0.125), then L2-normalized -> unit
    * vectors with weak 10-cluster structure, matching the measured corpus
    * geometry.
    */
  def embeddingsFrame(s: SparkSession, nEmb: Long,
                      embDim: Int = Tables.EmbeddingDim): DataFrame = {
    val rawVec = transform(sequence(lit(0), lit(embDim - 1)), i =>
      (pmod(xxhash64(col("label"), i, lit(91)), lit(1000)).cast("double") / 1000.0 - 0.5) * 0.04 +
        (pmod(xxhash64(col("id"), i, lit(92)), lit(1000000)).cast("double") / 1000000.0 - 0.5) * 0.433)
    s.range(0, nEmb, 1, 8).toDF("id")
      .select(col("id"), h(col("id"), 93, 10).cast(IntegerType).as("label"))
      .select(col("id"), col("label"), rawVec.as("raw"))
      .select(col("id"), col("label"),
        sqrt(aggregate(col("raw"), lit(0.0d), (a, x) => a + x * x)).as("nrm"), col("raw"))
      .select(
        col("id").as("vec_id"),
        transform(col("raw"), x => (x / col("nrm")).cast(FloatType)).as("embedding"),
        col("label"))
  }

  /** orders table — public so DataGenSpec can gate the PHYSICAL schema
    * (o_orderdate is µs TIMESTAMP_NTZ, the driver corpus encoding) via a
    * parquet round-trip without running main() (which stops the session).
    */
  def ordersFrame(s: SparkSession, nOrders: Long, nCust: Long): DataFrame =
    s.range(0, nOrders, 1, 32).toDF("id").select(
      (col("id") + 1).as("o_orderkey"),
      (h(col("id"), 41, nCust) + 1).as("o_custkey"),
      pick(col("id"), 42, Seq("P", "F", "O")).as("o_orderstatus"),
      money(col("id"), 43, 100191, 49899128).as("o_totalprice"),
      date_add(lit("1995-01-01").cast("date"),
        h(col("id"), 44, 2405).cast(IntegerType))
        .cast("timestamp_ntz").as("o_orderdate"),
      pick(col("id"), 45, Priorities).as("o_orderpriority"))

  /** lineitem table — 1..7 lines/order (mean 4), l_shipdate µs NTZ. */
  def lineitemFrame(s: SparkSession, nOrders: Long, nPart: Long,
                    nSupp: Long): DataFrame =
    s.range(0, nOrders, 1, 32).toDF("id")
      .select(col("id"), explode(sequence(lit(1),
        (h(col("id"), 51, 7) + 1).cast(IntegerType))).as("l_linenumber"))
      .select((col("id") + 1).as("l_orderkey"), col("l_linenumber"),
        (col("id") * 8 + col("l_linenumber")).as("lid"))
      .select(
        col("l_orderkey"),
        (h(col("lid"), 52, nPart) + 1).as("l_partkey"),
        (h(col("lid"), 53, nSupp) + 1).as("l_suppkey"),
        col("l_linenumber"),
        (h(col("lid"), 54, 50) + 1).cast("double").as("l_quantity"),
        // qty * unit price in [18.00, 2100.00) -> 2dp-exact, max ~105k
        round((h(col("lid"), 54, 50) + 1).cast("double") *
          money(col("lid"), 55, 1800, 208200), 2).as("l_extendedprice"),
        (h(col("lid"), 56, 11).cast("double") / 100.0).as("l_discount"),
        (h(col("lid"), 57, 9).cast("double") / 100.0).as("l_tax"),
        pick(col("lid"), 58, Seq("A", "N", "R")).as("l_returnflag"),
        pick(col("lid"), 59, Seq("F", "O")).as("l_linestatus"),
        date_add(lit("1995-01-02").cast("date"),
          h(col("lid"), 60, 2405).cast(IntegerType))
          .cast("timestamp_ntz").as("l_shipdate"))

  /** events table — ts is µs TIMESTAMP_NTZ matching the driver corpus's
    * TIMESTAMP(MICROS, isAdjustedToUTC=false); 29 days of uniform traffic
    * from 2024-01-01 with µs sub-second jitter.
    */
  def eventsFrame(s: SparkSession, nEvents: Long, nUsers: Long): DataFrame = {
    val epoch0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    s.range(0, nEvents, 1, 32).toDF("id").select(
      col("id").as("event_id"),
      timestamp_micros(lit(epoch0) * lit(1000000L) +
        h(col("id"), 71, 29L * 24 * 3600) * lit(1000000L) +
        h(col("id"), 72, 1000000L)).cast("timestamp_ntz").as("ts"),
      h(col("id"), 73, nUsers).as("user_id"),
      pick(col("id"), 74, Seq("click", "error", "purchase", "signup", "view")).as("event_type"),
      money(col("id"), 75, 0, 56022).as("value"),
      concat(lit("{\"k\": "), h(col("id"), 76, 100).cast("string"), lit("}")).as("props"))
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val out = if (args.length > 1) args(1) else s"localdata/sf$sf"
    // args(2): embedding width override (default = the corpus constant) —
    // for wide-vector experiments like the dim-512 ANN coarse-filter
    // validation; consumers infer dim from the data, so nothing else moves.
    val embDim = if (args.length > 2) args(2).toInt else Tables.EmbeddingDim
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-datagen")
    // modern µs physical type (Spark's default INT96 is write-only legacy)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    import spark.implicits._

    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    def ids(count: Long, parts: Int): DataFrame =
      spark.range(0, count, 1, parts).toDF("id")

    // -- fixed-size dims ----------------------------------------------------
    val region = Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
    val nation = (0 until 25)
      .map(i => (i, s"NATION_$i", i % 5)).toDF("n_nationkey", "n_name", "n_regionkey")
    region.write.mode("overwrite").parquet(s"$out/region.parquet")
    nation.write.mode("overwrite").parquet(s"$out/nation.parquet")

    // -- star schema --------------------------------------------------------
    val nCust = n(150000)
    val custs = ids(nCust, 32).select(
      (col("id") + 1).as("c_custkey"),
      format_string("Customer#%09d", col("id") + 1).as("c_name"),
      h(col("id"), 11, 25).cast(IntegerType).as("c_nationkey"),
      money(col("id"), 12, -99999, 1099985).as("c_acctbal"),
      pick(col("id"), 13, Segments).as("c_mktsegment"))
    custs.write.mode("overwrite").parquet(s"$out/customer.parquet")

    val nSupp = n(10000)
    ids(nSupp, 8).select(
      (col("id") + 1).as("s_suppkey"),
      format_string("Supplier#%09d", col("id") + 1).as("s_name"),
      h(col("id"), 21, 25).cast(IntegerType).as("s_nationkey"),
      money(col("id"), 22, -99999, 1099985).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    val nPart = n(200000)
    ids(nPart, 16).select(
      (col("id") + 1).as("p_partkey"),
      concat_ws(" ", pick(col("id"), 31, PAdj), pick(col("id"), 32, PNoun)).as("p_name"),
      concat(lit("Brand#"), (h(col("id"), 33, 25) + 1).cast("string")).as("p_brand"),
      pick(col("id"), 34, PTypes).as("p_type"),
      (h(col("id"), 35, 50) + 1).cast(IntegerType).as("p_size"),
      money(col("id"), 36, 90000, 9991).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    val nOrders = n(1500000)
    ordersFrame(spark, nOrders, nCust)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // lineitem: explode each order into 1..7 lines (mean 4 — matches the
    // measured 4.0 lines/order and uniform l_linenumber 1..7).
    lineitemFrame(spark, nOrders, nPart, n(10000))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // -- events (stream-shaped; ts = µs TIMESTAMP_NTZ, see scaladoc) --------
    val nEvents = n(1000000)
    val nUsers = n(15000)
    eventsFrame(spark, nEvents, nUsers)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // -- LLM-pipeline tables ------------------------------------------------
    val nDocs = n(50000)
    documentsFrame(spark, nDocs)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val nEmb = n(20000)
    embeddingsFrame(spark, nEmb, embDim)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[datagen] wrote sf=$sf corpus to $out " +
      s"(cust=$nCust orders=$nOrders events=$nEvents docs=$nDocs emb=$nEmb)")
    spark.stop()
  }
}
