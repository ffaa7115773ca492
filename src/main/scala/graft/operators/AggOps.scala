package graft.operators

import graft.{QueryPack, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.4 — aggregation operators.
  *
  * Scale notes (100 TB posture): every groupBy below compiles to a two-phase
  * HashAggregate (partial map-side combine before the shuffle), so shuffled
  * bytes are proportional to |groups|, not |rows|. Group cardinalities here
  * are tiny (flags, segments, nations) — the shuffle is a few KB per
  * partition regardless of input scale.
  */
object AggOps extends QueryPack {

  /** Flagship: TPC-H Q1 shape. All money arithmetic in exact decimals;
    * averages via the exact-cents / single-double-division trick (Tables).
    */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DecimalType(18, 2)).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DecimalType(18, 2)).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DecimalType(22, 4)).as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax"))))
          .cast(DecimalType(24, 6)).as("sum_charge"),
        avg2(col("l_quantity")).as("avg_qty"),
        avg2(col("l_extendedprice")).as("avg_price"),
        avg2(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(SUM(${sqlDec2("l_quantity")}) AS DECIMAL(18,2)) AS sum_qty,
       | CAST(SUM(${sqlDec2("l_extendedprice")}) AS DECIMAL(18,2)) AS sum_base_price,
       | CAST(SUM(${sqlDec2("l_extendedprice")} * (1 - ${sqlDec2("l_discount")})) AS DECIMAL(22,4)) AS sum_disc_price,
       | CAST(SUM(${sqlDec2("l_extendedprice")} * (1 - ${sqlDec2("l_discount")}) * (1 + ${sqlDec2("l_tax")})) AS DECIMAL(24,6)) AS sum_charge,
       | ${sqlAvg2("l_quantity")} AS avg_qty,
       | ${sqlAvg2("l_extendedprice")} AS avg_price,
       | ${sqlAvg2("l_discount")} AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_q1" -> (q1 _)
  )

  override def oracle: Map[String, String] = Map(
    "q_agg_q1" -> q1Sql
  )
}
