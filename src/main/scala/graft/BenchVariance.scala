package graft

/** Repeated-measurement harness for pinning down bench variance (round-5
  * judge item: the driver's one-shot BENCH sample showed q_agg_q1 at 8.7 s
  * vs 1.5 s in a same-day full run — distinguish warm-up / machine load
  * from a plan regression before trusting either number).
  *
  * Runs each named query `SPARK_GRAFT_REPS` times (default 5) in THIS JVM
  * through the same noop-sink path Bench uses, and prints one JSON line
  * with every individual wall time. Fresh-JVM samples come from invoking
  * this main repeatedly with SPARK_GRAFT_REPS=1; warm-JVM distributions
  * from one invocation with REPS=5. tools/bench_variance.sh drives both
  * and aggregates into BENCH_variance_r5.json.
  */
object BenchVariance {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q_agg_q1", "q_agg_rollup")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-bench-variance")
    val results = names.map { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      s"""\"$n\":[${times.map(t => f"$t%.3f").mkString(",")}]"""
    }
    println(s"""{"metric":"variance","reps":$reps,"sf":"$sfDir","queries":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
