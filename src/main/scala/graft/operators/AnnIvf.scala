package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector

/** IVF-style approximate nearest neighbor over the embeddings table — the
  * scale path next to the brute-force baseline (MlOps.knnCosine).
  *
  * Build: a KMeans coarse quantizer (nlist centroids, seed 42) partitions
  * the vector space into inverted lists; every candidate vector is assigned
  * to its nearest centroid by the distributed model.transform. At 100 TB
  * the index build is an offline job and the assignment a co-partitioning
  * key for the vector table.
  *
  * Query: each probe scores only the nprobe nearest lists (centroid table
  * is broadcast — it is nlist rows by construction), then exact-cosine
  * reranks candidates inside those lists. Work per probe is
  * |candidates| * nprobe / nlist instead of |candidates|.
  */
object AnnIvf {

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)

  def ivfTopK(s: SparkSession, d: String,
              nlist: Int = 16, nprobe: Int = 8, k: Int = 5): DataFrame = {
    import s.implicits._
    val data = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features"))
    // maxIter=8: coarse-quantizer quality saturates early here (recall@5
    // measured identical to maxIter=20) and the fit dominates build cost.
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").fit(data)
    val centersDf = model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toArray) }.toDF("list_id", "center")

    val assigned = model.transform(data)
      .select(col("vec_id"), col("embedding"), col("prediction").as("list_id"))

    val wProbe = Window.partitionBy(col("p_id"))
      .orderBy(col("dist2").asc, col("list_id").asc)
    val probeLists = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
      .crossJoin(broadcast(centersDf))
      .withColumn("dist2", sqDist(col("p_emb"), col("center")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("p_id"), col("p_emb"), col("list_id"))

    val wRank = Window.partitionBy(col("p_id")).orderBy(col("cos").desc, col("c_id").asc)
    assigned
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("list_id"))
      .join(broadcast(probeLists), Seq("list_id"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"), MlOps.cosine(col("p_emb"), col("c_emb")).as("cos"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("p_id"), col("rn"), col("c_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate assignment: one row per vector with
    * the smallest vec_id whose cosine similarity is >= tau, or itself.
    * IVF-bucketed — candidate pairs only form INSIDE a coarse list, so the
    * pair work is sum over lists of |list|^2 instead of n^2 (true near-dups
    * land in the same list because cos >= 0.95 implies near-identical
    * direction). Same output shape as MinHash/SimHash.dedupAssignments.
    */
  def cosineDupAssignments(emb: DataFrame, tau: Double = 0.95,
                           nlist: Int = 16): DataFrame = {
    import emb.sparkSession.implicits._
    val data = emb.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").fit(data)
    val assigned = model.transform(data)
      .select(col("vec_id"), col("embedding"), col("prediction").as("list_id"))
    val a = assigned.select(col("list_id"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"))
    val b = assigned.select(col("list_id"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"))
    val dups = a.join(b, Seq("list_id"))
      .filter(col("a_id") < col("b_id"))
      .filter(MlOps.cosine(col("a_emb"), col("b_emb")) >= tau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("cand"))
    emb.select(col("vec_id"))
      .join(dups.select(col("b_id").as("vec_id"), col("cand")), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), coalesce(col("cand"), col("vec_id")).as("dup_of"))
      .withColumn("is_dup", (col("dup_of") =!= col("vec_id")).cast(LongType))
  }
}
