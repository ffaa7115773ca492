package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-join equivalence gate: salting must change the distribution,
  * never the answer.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedEquiJoin == plain join on a skewed corpus join") {
    // lineitem.l_suppkey -> supplier: 10 suppliers for 6000 lineitems at
    // sf0.001 — every supplier key is hot.
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
    val su = Tables.supplier(spark, TestSpark.sf0001)
      .select(col("s_suppkey"), col("s_name"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("s_name"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = norm(li.join(su, col("l_suppkey") === col("s_suppkey")))
    val salted = norm(Skew.saltedEquiJoin(li, su, "l_suppkey", "s_suppkey", salts = 16))
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE OptimizeSkewedJoin splits a deliberately skewed sort-merge join") {
    // Documents the 100-TB lever ORDER: AQE skew-join is the FIRST lever —
    // zero code change, splits oversized shuffle partitions at runtime —
    // and handles moderate skew (a hot partition, many joinable rows).
    // Skew.saltedEquiJoin is the SECOND, explicit lever, for extreme
    // single-key skew where one un-splittable sort-merge key group remains
    // after the partition split. This test proves the first lever fires on
    // a one-key-owns-95% join, with thresholds scaled down to test size.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      // production defaults are 5x-median + 256MB; scale to the test corpus
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      // key 42 owns 95% of the left side; every k exists in right exactly once
      val left = spark.range(0, 200000, 1, 8).select(
        when(col("id") < 190000, lit(42L)).otherwise(pmod(col("id"), lit(100))).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 100).select(col("id").as("rk"), (col("id") * 2).as("w"))
      val joined = left.join(right, col("k") === col("rk"))
      assert(joined.collect().length == 200000, "skew-split join must not change the answer")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire — no skew=true in adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("salts spread a hot key across many partitions") {
    import spark.implicits._
    // one key owns 99% of rows — the classic skew shape
    val hot = (1 to 990).map(i => (42L, i.toLong)) ++ (1 to 10).map(i => (i.toLong, 0L))
    val left = hot.toDF("k", "v")
    val right = Seq((42L, "hot"), (1L, "a"), (2L, "b")).toDF("rk", "name")
    val joined = Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
    assert(joined.count() == 990 + 2)
    // assert the spread of the SAME salt expression the join uses (a copy
    // of the formula here would keep passing if the implementation
    // regressed to key-hashing)
    val saltSpread = left
      .withColumn("__salt", Skew.rowSalt(left, 8))
      .filter(col("k") === 42L).select(col("__salt")).distinct().count()
    assert(saltSpread >= 6, s"hot key only spread over $saltSpread salts")
  }
}
