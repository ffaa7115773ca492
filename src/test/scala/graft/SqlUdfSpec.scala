package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SQL-defined functions (Spark 4's `CREATE FUNCTION … RETURN`) — the
  * user-extension surface for teams that ship SQL, not Scala. Two gates:
  *
  *   - a scalar SQL UDF re-states the engine's cents discipline
  *     (Tables.cents) and must agree with it row-for-row over real data —
  *     proving the SQL surface can express the §7.3 exact-money contract;
  *   - a SQL table function (RETURNS TABLE) drives a LATERAL expansion,
  *     the SQL twin of explode(sequence(...)).
  *
  * Scale note: SQL UDF bodies are inlined into the plan at resolution
  * (they are plan fragments, not black-box callbacks), so both stay
  * inside WholeStageCodegen — unlike a Scala closure UDF, there is no
  * codegen boundary. The scalar gate's plan assertion pins that.
  */
class SqlUdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL scalar UDF: cents discipline expressible in SQL, row-identical to Tables.cents, inlined into codegen") {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION cents_of(x DOUBLE)
        |RETURNS BIGINT
        |RETURN CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)""".stripMargin)
    Tables.orders(spark, TestSpark.sf0001).createOrReplaceTempView("orders_udf_probe")
    val viaUdf = spark.sql(
      "SELECT o_orderkey, cents_of(o_totalprice) AS c FROM orders_udf_probe")
    val viaScala = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), Tables.cents(col("o_totalprice")).as("c"))
    assert(viaUdf.exceptAll(viaScala).count() == 0 &&
      viaScala.exceptAll(viaUdf).count() == 0)
    // Inlined, not a black box: the body appears as a plain cast chain in
    // the projection (no ScalaUDF boundary), inside a codegen stage (the
    // `*(n)` star marker).
    val p = viaUdf.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("*(1) Project"), p)
    assert(p.contains("cast(o_totalprice"), "UDF body not inlined:\n" + p)
  }

  test("SQL table function: RETURNS TABLE drives lateral expansion == explode(sequence)") {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION seqn(n INT)
        |RETURNS TABLE(i INT)
        |RETURN SELECT explode(sequence(1, n))""".stripMargin)
    val got = spark.sql(
      """SELECT r.n, s.i FROM (SELECT 3 AS n UNION ALL SELECT 5 AS n) r,
        |LATERAL seqn(r.n) s""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val want = (Seq(3, 5).flatMap(n => (1 to n).map(i => (n, i)))).toSet
    assert(got == want)
  }
}
