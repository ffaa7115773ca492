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

  /** Sign-LSH bits: 48 deterministic pseudo-random hyperplanes (constants
    * derived from a golden-ratio mix of the coordinate index — no RNG, no
    * fitting), generated at the caller's vector dimension (a plane shorter
    * than the vectors would silently bucket on a prefix projection). Two
    * vectors at cosine >= 0.95 (angle <= 18.2°) disagree on each sign bit
    * with p = angle/pi ≈ 0.10.
    */
  private val SignBits = 48
  private def hyperplanes(dim: Int): IndexedSeq[Array[Float]] =
    (0 until SignBits).map { j =>
      Array.tabulate(dim) { i =>
        val h = (j.toLong * dim + i + 1) * 0x9E3779B97F4A7C15L
        (((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0).toFloat
      }
    }

  /** Embedding-cosine near-duplicate assignment: one row per vector with
    * the smallest vec_id whose cosine similarity is >= tau, or itself.
    * Bucketed by random-hyperplane sign-LSH: a 48-bit sign signature,
    * banded 6x8 bits — a pair within 18° (cos 0.95) agrees on an 8-bit
    * chunk with p ≈ 0.9^8 = 0.43, so on >= 1 of 6 chunks with p ≈ 0.97,
    * while random pairs share a 256-value bucket rarely (pair work ≈
    * 6·n²/256, not n²) — and NO index fit at all (the KMeans-IVF route
    * costs a full clustering fit just to bucket).
    * Verification is exact cosine with norms computed once per vector.
    * Same output shape as MinHash/SimHash.dedupAssignments.
    */
  def cosineDupAssignments(emb: DataFrame, tau: Double = 0.95,
                           dim: Int = 64): DataFrame = {
    val fdot = org.apache.spark.sql.graftext.VectorExprs.fdotNative _
    val planes = hyperplanes(dim)
    val sig = (0 until SignBits).map { j =>
      val plane = array(planes(j).map(v => lit(v)): _*)
      when(fdot(col("embedding"), plane) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val signed = emb
      .select(col("vec_id"), col("embedding"), sig.as("sig"),
        sqrt(fdot(col("embedding"), col("embedding"))).as("norm"))
      .repartition(col("vec_id")) // signature/norm computed once; exchange reused
    val chunks = signed.select(col("vec_id"),
      explode(array((0 until 6).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), c * 8).bitwiseAND(lit(0xFFL)).as("cv"))): _*)).as("ch"))
      .select(col("vec_id"), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    // Candidate ids first, THEN one embedding join + one exact cosine per
    // distinct pair: true near-dups share all 6 chunks, so verifying inside
    // the chunk join would cost 6 dot products (and 6 shuffled embedding
    // copies) per hot pair.
    val candidates = chunks.select(col("chunk"), col("cv"), col("vec_id").as("a_id"))
      .join(chunks.select(col("chunk"), col("cv"), col("vec_id").as("b_id")),
        Seq("chunk", "cv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val vecs = signed.select(col("vec_id"), col("embedding"), col("norm"))
    val dups = candidates
      .join(vecs.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("norm").as("a_norm")), Seq("a_id"))
      .join(vecs.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("norm").as("b_norm")), Seq("b_id"))
      .filter(fdot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")) >= tau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("cand"))
    emb.select(col("vec_id"))
      .join(dups.select(col("b_id").as("vec_id"), col("cand")), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), coalesce(col("cand"), col("vec_id")).as("dup_of"))
      .withColumn("is_dup", (col("dup_of") =!= col("vec_id")).cast(LongType))
  }
}
