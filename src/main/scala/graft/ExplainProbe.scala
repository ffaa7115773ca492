package graft
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[4]", 4, "explain-probe")
    val d = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"########## $name")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
