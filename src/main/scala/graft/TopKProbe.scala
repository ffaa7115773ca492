package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.TopKAgg
import graft.functions.TopKAgg.Entry

/** Measurement main for VERDICT r2 "next" #7: typed bounded TopK Aggregator
  * vs the salted two-phase window, same top-3-orders-per-segment semantics
  * as q_agg_topk_group, timed over SPARK_GRAFT_SF_DIR (default sf1).
  *
  * The hypothesis under test (TopKAgg scaladoc): the Aggregator's partial
  * buffers ship k rows/group/partition, the window sorts every row once —
  * but the Aggregator pays per-row typed ser/de (an Aggregator runs outside
  * codegen), so which wins is an empirical question. Results recorded in
  * BASELINE.md; the faster formulation backs q_agg_topk_group.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-topk-probe")
    import spark.implicits._

    def joined = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))

    def windowed = SparkEntry.queries("q_agg_topk_group")(spark, sfDir)

    def aggregated = joined
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("value"),
        col("o_orderkey").as("key"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, v, k) => Entry(v, k) }
      .agg(TopKAgg.topK(3).toColumn.name("top"))
      .select(col("key").as("c_mktsegment"), posexplode(col("top")))
      .select(col("c_mktsegment"), (col("pos") + 1).cast(LongType).as("rn"),
        col("col.key").as("o_orderkey"), col("col.value").as("o_totalprice"))
      .orderBy(col("c_mktsegment").asc, col("rn").asc)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      // warm-up run (parquet footer cache, codegen), then 3 timed runs
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(1)
      println(f"[topk-probe] $label%-10s median=$med%.3f s (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }

    // Equivalence first (the measurement is meaningless if they differ).
    val a = aggregated.collect().map(_.toSeq).toSeq
    val w = windowed.collect().map(_.toSeq).toSeq
    require(a == w, s"formulations diverge:\nagg=$a\nwin=$w")

    val tw = time("window")(windowed)
    val ta = time("aggregator")(aggregated)
    println(f"[topk-probe] sfDir=$sfDir window=$tw%.3f s aggregator=$ta%.3f s ratio=${ta / tw}%.2f")
    spark.stop()
  }
}
