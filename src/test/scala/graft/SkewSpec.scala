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
