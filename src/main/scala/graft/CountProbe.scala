package graft

/** Output-cardinality probe for registered queries: `count()` over the
  * query frame (Catalyst's EliminateSorts drops the trailing global sort
  * under an aggregate, so this measures RESULT VOLUME without paying the
  * sort's disk) — the number that decides whether a single node can
  * materialize a query's output at a given SF at all.
  *
  * Usage: runMain graft.CountProbe <query> [sfDir...]
  */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dirs = if (args.length > 1) args.drop(1).toSeq else Seq("localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-count-probe")
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"""{"metric":"count_probe","query":"$name","sf":"$d","rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    spark.stop()
  }
}
