package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-bench")
    var errors = List.empty[String]
    // Dev aid: SPARK_GRAFT_ONLY=q_a,q_b restricts the run to named queries
    // (unset = full registry, the driver's mode).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets the optimizer prune unreferenced
      // branches wholesale (measured: dedup_embedding_cosine's count() plan
      // collapses to a bare scan — the LSH+verify pipeline is join-eliminated
      // because its aggregate is unique on the join key and unreferenced).
      // The noop sink materializes every output column, so the wall time is
      // the cost of the work the query claims to do.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errors ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // Failed queries are reported as -1, never as a healthy wall time.
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errsJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errsJson,"sf":"$sfDir"}"""
    println(line)
    // The driver's BENCH_r0N.json artifact keeps only an output TAIL, so
    // per-query numbers can be truncated away. When SPARK_GRAFT_BENCH_OUT
    // names a file, the same JSON line is written there verbatim — the
    // durable copy scaling analysis reads.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
