package graft

import org.apache.spark.sql.functions._

/** Residual IVF-PQ operating-point probe (round-16 verdict item #3): the
  * r15 raw-code composition measured top-1-in-top-3 = 0.620 at the
  * defaults (nprobe 16, adcK 64) — barely above the 0.6 gate — and the
  * verdict's hypothesis was that RESIDUAL codes (IVFADC) lift it toward
  * 0.7. This probe separates the two candidate constraints:
  *
  *   - CEILING: the fraction of probes whose true top-1 lies in a probed
  *     list at all (exact within-list recall at the same nprobe) — no
  *     code fidelity can exceed this;
  *   - annJoinPq recall at nprobe ∈ {16, 20, 24} with residual codes,
  *     plus wall per point on the same 20k corpus.
  *
  * One JSON line per point; aggregate goes to BASELINE.md round 16.
  */
object PqResidualProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-pq-residual-probe")
    // Wall-only mode (SPARK_GRAFT_PQ_WALL_DIR): time annJoinPq at each
    // grid point on the given corpus — no exact reference (unaffordable
    // past sf1 density), one count() action per point, index/codes warmed
    // by an untimed defaults run first so the points time pure query cost.
    sys.env.get("SPARK_GRAFT_PQ_WALL_DIR").foreach { d =>
      val grid = sys.env.get("SPARK_GRAFT_PQ_GRID")
        .map(_.split(',').toSeq.map(_.trim.toInt)).getOrElse(Seq(16, 28))
      operators.AnnIvf.annJoinPq(spark, d).count() // warm index + codes
      for (nprobe <- grid) {
        val t0 = System.nanoTime()
        val rows = operators.AnnIvf.annJoinPq(spark, d, nprobe = nprobe).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"""{"dir":"$d","nprobe":$nprobe,"rows":$rows,"pq_wall_sec":$wall%.2f}""")
      }
      spark.stop()
      return
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_RECALL_SF_DIR",
      "target/graft-scratch/ann-recall-sf1")
    val emb = s"$dir/embeddings.parquet"
    if (!new java.io.File(s"$emb/_SUCCESS").exists())
      DataGen.embeddingsFrame(spark, 20000).write.mode("overwrite").parquet(emb)
    val n = Tables.embeddings(spark, dir).count()

    val sampleIds = Tables.embeddings(spark, dir)
      .select(col("vec_id")).filter(pmod(col("vec_id"), lit(n / 200)) === 0)
      .limit(200)
    val probes = Tables.embeddings(spark, dir).join(sampleIds, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val cands = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val fdot = org.apache.spark.sql.graftext.VectorExprs.fdotNative _
    def nrm(c: org.apache.spark.sql.Column) = sqrt(aggregate(
      transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (a, x) => a + x))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_id")).orderBy(col("cos").desc, col("c_id").asc)
    val exactTop1 = broadcast(probes).join(cands, col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"),
        (fdot(col("p_emb"), col("c_emb")) / (nrm(col("p_emb")) * nrm(col("c_emb")))).as("cos"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col("p_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sample = exactTop1.keySet

    val grid = sys.env.get("SPARK_GRAFT_PQ_GRID")
      .map(_.split(',').toSeq.map(_.trim.toInt))
      .getOrElse(Seq(16, 20, 24))
    for (nprobe <- grid) {
      // CEILING at this nprobe: exact rerank inside the probed lists
      // (queryIndex), top-3 containment of the true top-1.
      val index = operators.AnnIvf.ensureIndex(spark, dir)
      val ceil = operators.AnnIvf.queryIndex(spark, index, probes,
          nprobe = nprobe, k = 3)
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(2)).toSet }
      val ceilHits = exactTop1.count { case (p, t) => ceil.get(p).exists(_.contains(t)) }

      val t0 = System.nanoTime()
      val ann = operators.AnnIvf.annJoinPq(spark, dir, nprobe = nprobe)
        .filter(col("p_id").isin(sample.toSeq: _*))
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(2)).toSet }
      val wall = (System.nanoTime() - t0) / 1e9
      val hits = exactTop1.count { case (p, t) => ann.get(p).exists(_.contains(t)) }
      println(f"""{"nprobe":$nprobe,"ceiling":${ceilHits / 200.0}%.3f,"pq_recall":${hits / 200.0}%.3f,"pq_wall_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
