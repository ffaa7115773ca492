package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.4 q_agg_approx error-bound gate (no DuckDB oracle: HLL and
  * quantile-sketch algorithms are engine-specific by design).
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // one aggregation job, both tests read fields of the same single row
  private lazy val row = SparkEntry.queries("q_agg_approx")(spark, TestSpark.sf001).head()

  test("approx_count_distinct within 2% of exact (rsd=0.01)") {
    val r = row
    val approx = r.getLong(r.fieldIndex("approx_parts"))
    val exact = r.getLong(r.fieldIndex("exact_parts"))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.02, s"HLL error $err (approx=$approx exact=$exact)")
  }

  test("percentile_approx(0.5) is between the exact p40 and p60") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val r = row
    val approxP50 = r.getDouble(r.fieldIndex("approx_p50"))
    val Array(p40, p60) =
      li.stat.approxQuantile("l_extendedprice", Array(0.4, 0.6), 0.0)
    assert(approxP50 >= p40 && approxP50 <= p60,
      s"approx p50 $approxP50 outside exact [$p40, $p60]")
  }
}
