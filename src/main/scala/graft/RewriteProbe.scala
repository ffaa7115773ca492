package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement main for the Q20-shape cost question raised by the round-6
  * scaling legs: q_subq_having_corr (SubqOps) pays THREE lineitem
  * aggregations — the grouped fact plus two decorrelated correlated
  * scalars — because that is what the subquery FORM expresses (the query
  * exists to exercise decorrelation). At crawl scale you would write the
  * same semantics as ONE grouped aggregate + ONE per-part window:
  * per-(supp, part) sums, with the part total and supplier count as
  * window aggregates over the (already tiny) group rollup.
  *
  * This probe times both forms over SPARK_GRAFT_SF_DIR after asserting
  * row-identical output — the §4 decision-gate pattern: measure the
  * rewrite, record the number in BASELINE.md, and leave the registered
  * query as the subquery form it is meant to exercise.
  */
object RewriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-rewrite-probe")

    def subqueryForm = SparkEntry.queries("q_subq_having_corr")(spark, sfDir)

    def windowForm: DataFrame = {
      val w = Window.partitionBy(col("l_partkey"))
      val dominant = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .select(col("l_suppkey"), col("q"),
          sum(col("q")).over(w).as("tot"),
          count(lit(1)).over(w).as("ns"))
        .filter(col("q") * col("ns") > lit(3) * col("tot"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(spark, sfDir)
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey").asc)
    }

    def time(label: String)(mk: => DataFrame): Double = {
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(1)
      println(f"[rewrite-probe] $label%-9s median=$med%.3f s (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }

    // Equivalence first (the measurement is meaningless if they differ).
    val a = subqueryForm.collect().map(_.toSeq).toSeq
    val b = windowForm.collect().map(_.toSeq).toSeq
    require(a == b, s"forms diverge: subquery=${a.size} rows window=${b.size} rows")

    val ts = time("subquery")(subqueryForm)
    val tw = time("window")(windowForm)
    println(f"[rewrite-probe] sfDir=$sfDir subquery=$ts%.3f s window=$tw%.3f s speedup=${ts / tw}%.2f")
    spark.stop()
  }
}
