package graft

/** Dump `.explain("formatted")` per registered query.
  *
  * Args: query names, or `all` for the whole registry. Output goes to
  * stdout with `##########` markers, and — when SPARK_GRAFT_EXPLAIN_DIR
  * is set — to one `<dir>/<query>.txt` per query (the judge-facing
  * plans/r16/ artifacts). SPARK_GRAFT_SF_DIR picks the corpus (default
  * sf0.001: plan SHAPE is scale-free; AQE runtime choices are not, which
  * is why bench claims also cite the in-run numbers, not just these).
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "explain-probe")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    outDir.foreach(o => new java.io.File(o).mkdirs())
    val names =
      if (args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    names.foreach { name =>
      println(s"########## $name")
      val df = SparkEntry.queries(name)(spark, d)
      // explain prints to stdout; capture for the file sink too.
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        df.explain("formatted")
      }
      val text = buf.toString("UTF-8")
      print(text)
      outDir.foreach { o =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(o, s"$name.txt"),
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
