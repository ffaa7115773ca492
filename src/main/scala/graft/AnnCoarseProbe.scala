package graft

import org.apache.spark.sql.DataFrame

/** Wide-vector validation of the ANN coarse filter (round-5 verdict item
  * #4): the round-5 experiment measured the 192-bit sketch two-stage
  * rerank NEGATIVE at dim 64 (21.8 s vs 9.6 s exact at sf1) and shipped
  * coarseK=0 as the default, recommending "flip coarseK on for dim >= ~512"
  * — an extrapolation. This probe measures both shapes on an actual
  * wide-vector corpus (DataGen arg 3 = embedding width) so the
  * recommendation is a number, not a prediction.
  *
  * SPARK_GRAFT_SF_DIR: the corpus to probe (default localdata/sf1_d512).
  * SPARK_GRAFT_REPS executions per shape in one JVM (default 3; rep 1 of
  * the first shape pays the index build — reported separately).
  * Also reports top-3 agreement between the two shapes over all probes —
  * the coarse filter must rank, not distort.
  */
object AnnCoarseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1_d512")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-ann-coarse-probe")

    val tB0 = System.nanoTime()
    operators.AnnIvf.ensureIndex(spark, sfDir)
    val buildSec = (System.nanoTime() - tB0) / 1e9

    def time(coarseK: Int): Seq[Double] = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      operators.AnnIvf.annJoin(spark, sfDir, coarseK = coarseK)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val exact = time(0)
    val coarse = time(64)

    def top3(df: DataFrame): Map[Long, Set[Long]] = df.collect()
      .groupBy(_.getLong(0)).map { case (p, rs) => p -> rs.map(_.getLong(2)).toSet }
    val e = top3(operators.AnnIvf.annJoin(spark, sfDir))
    val c = top3(operators.AnnIvf.annJoin(spark, sfDir, coarseK = 64))
    val agree = e.keys.toSeq.map(p => c.getOrElse(p, Set.empty)
      .intersect(e(p)).size / 3.0)
    val meanAgree = agree.sum / agree.size

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"ann_coarse_probe","sf":"$sfDir","build_sec":$buildSec%.1f,"exact_sec":${arr(exact)},"coarse64_sec":${arr(coarse)},"top3_agreement":$meanAgree%.3f}""")
    spark.stop()
  }
}
