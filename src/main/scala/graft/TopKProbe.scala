package graft

/** Measurement main for VERDICT r2 "next" #7: typed bounded TopK Aggregator
  * vs the salted two-phase window, same top-3-orders-per-segment semantics
  * as q_agg_topk_group, timed over SPARK_GRAFT_SF_DIR (default sf1).
  *
  * The hypothesis under test (TopKAgg scaladoc): the Aggregator's partial
  * buffers ship k rows/group/partition, the window sorts every row once —
  * but the Aggregator pays per-row typed ser/de (an Aggregator runs outside
  * codegen), so which wins is an empirical question. Measured at sf1:
  * aggregator 0.70 s vs window 1.06 s median — the aggregator is now the
  * registered q_agg_topk_group (AggOps.topKAggregated); the window stays
  * here as the baseline. Results recorded in BASELINE.md.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-topk-probe")

    def windowed = graft.operators.AggOps.topKWindowed(spark, sfDir)
    def aggregated = graft.operators.AggOps.topKAggregated(spark, sfDir)

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
