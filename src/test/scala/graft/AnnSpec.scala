package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIvf, MlOps}

/** IVF ANN quality gate: probing half the inverted lists must recover most
  * of the brute-force top-5 (measured 0.82 mean recall at sf0.001 with
  * nprobe=8/nlist=16; asserted with margin), deterministically.
  */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ivf recall@5 vs brute force >= 0.7 mean, deterministic") {
    val brute = MlOps.knnCosine(spark, TestSpark.sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val ivf1 = AnnIvf.ivfTopK(spark, TestSpark.sf0001).collect()
    val ivf2 = AnnIvf.ivfTopK(spark, TestSpark.sf0001).collect()
    assert(ivf1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted ==
      ivf2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted,
      "ivf with fixed seed must be deterministic")
    val byProbe = ivf1.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = brute.keys.toSeq.sorted
      .map(p => byProbe.getOrElse(p, Set.empty[Long]).intersect(brute(p)).size / 5.0)
    val mean = recalls.sum / recalls.size
    info(s"mean recall@5 = $mean")
    assert(mean >= 0.7, s"mean recall $mean (per-probe: $recalls)")
  }
}
