package graft

import org.apache.spark.sql.functions._

/** ml_ann_join operating-point sweep (round-5 verdict item #5): the sf10
  * tail was 104 s at the default (nlist = √n, nprobe = 8) — measure
  * whether configuration alone moves it at equal recall, plan shape
  * untouched. Grid: nlist ∈ {√n, 2√n, 4√n} × nprobe ∈ {4, 8}.
  *
  * Wall time is measured on SPARK_GRAFT_SF_DIR (sf10 for the verdict
  * item); recall on SPARK_GRAFT_RECALL_SF_DIR (default sf1 — 20 k vectors,
  * where a sampled exact reference is affordable) using the same
  * top-1-in-top-3 metric AnnSpec gates: for each sampled probe, is its
  * TRUE nearest neighbor inside the ANN top-3? Build time is reported
  * separately — the index is the offline artifact, the join is the
  * per-release cost.
  *
  * One JSON line per config on stdout; aggregate goes to BASELINE.md.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf10")
    val recallDir = sys.env.getOrElse("SPARK_GRAFT_RECALL_SF_DIR", "localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-ann-sweep")

    val n = Tables.embeddings(spark, sfDir).count()
    val nRecall = Tables.embeddings(spark, recallDir).count()

    // Exact reference at the recall corpus: true top-1 neighbor for a
    // deterministic 200-probe sample (broadcast sample x full corpus — 4M
    // dot products at sf1, one job).
    val sampleIds = Tables.embeddings(spark, recallDir)
      .select(col("vec_id")).filter(pmod(col("vec_id"), lit(nRecall / 200)) === 0)
      .limit(200)
    val probes = Tables.embeddings(spark, recallDir)
      .join(sampleIds, Seq("vec_id"))
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val cands = Tables.embeddings(spark, recallDir)
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

    // SPARK_GRAFT_SWEEP_GRID="mult:nprobe[:wsup],..." restricts the grid —
    // e.g. "4:4" for the one configuration whose spill fits a single
    // node's disk at sf100 (unset = the full r6 grid at the default wSup).
    // SPARK_GRAFT_SWEEP_RECALL_ONLY=1 skips the sfDir wall measurement
    // (recall is deterministic and load-independent; walls are not — the
    // r10 operating-point hunt ran recall under an active sf100 leg).
    val recallOnly = sys.env.get("SPARK_GRAFT_SWEEP_RECALL_ONLY").contains("1")
    val grid = sys.env.get("SPARK_GRAFT_SWEEP_GRID")
      .map(_.split(",").toSeq.map { p =>
        p.split(":").map(_.toInt) match {
          case Array(m, np) => (m, np, -1)
          case Array(m, np, w) => (m, np, w)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_SWEEP_GRID entry '$p': expected mult:nprobe[:wsup]")
        }
      })
      .getOrElse(for (m <- Seq(1, 2, 4); np <- Seq(4, 8)) yield (m, np, -1))
    for ((mult, nprobe, wsupRaw) <- grid) {
      val wsupArgs: Seq[Int] = if (wsupRaw > 0) Seq(wsupRaw) else Seq.empty
      val nlist = math.max(16, math.ceil(mult * math.sqrt(n.toDouble))).toInt
      val nlistRecall = math.max(16, math.ceil(mult * math.sqrt(nRecall.toDouble))).toInt
      def joinWith(dir: String, nl: Int) = wsupArgs match {
        case Seq(w) => operators.AnnIvf.annJoin(spark, dir, nprobe = nprobe,
          nlist = nl, wSup = w)
        case _ => operators.AnnIvf.annJoin(spark, dir, nprobe = nprobe, nlist = nl)
      }
      val (buildSec, joinSec) = if (recallOnly) (-1.0, -1.0) else {
        val tBuild0 = System.nanoTime()
        operators.AnnIvf.ensureIndex(spark, sfDir, nlist)
        val b = (System.nanoTime() - tBuild0) / 1e9
        val tJoin0 = System.nanoTime()
        joinWith(sfDir, nlist).write.format("noop").mode("overwrite").save()
        (b, (System.nanoTime() - tJoin0) / 1e9)
      }
      val ann = joinWith(recallDir, nlistRecall)
        .join(broadcast(sampleIds.select(col("vec_id").as("p_id"))), Seq("p_id"))
        .collect().groupBy(_.getLong(0))
        .map { case (p, rows) => p -> rows.map(_.getLong(2)).toSet }
      val hits = exactTop1.count { case (p, t1) => ann.get(p).exists(_.contains(t1)) }
      val recall = hits.toDouble / exactTop1.size
      val wsupShown = if (wsupRaw > 0) wsupRaw else -1
      println(f"""{"metric":"ann_sweep","sf":"$sfDir","n":$n,"nlist_mult":$mult,"nlist":$nlist,"nprobe":$nprobe,"wsup":$wsupShown,"build_sec":$buildSec%.1f,"join_sec":$joinSec%.1f,"recall_sf":"$recallDir","recall_nlist":$nlistRecall,"top1_in_top3":$recall%.3f}""")
    }
    spark.stop()
  }
}
