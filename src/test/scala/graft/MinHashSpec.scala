package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MinHash
import graft.Tables

/** SURVEY §2.11 dedup_minhash quality gate: banded minhash agreement with
  * exact token-set Jaccard on sf0.001 (theory: 1-(1-s^4)^8 ≈ 0.985 recall
  * at s = 0.8 for 8 bands x 4 rows).
  */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def exactPairs(): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val sz = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = tok.select(col("doc_id").as("a_id"), col("tok"))
    val b = tok.select(col("doc_id").as("b_id"), col("tok"))
    a.join(b, Seq("tok")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_int"))
      .join(sz.select(col("doc_id").as("a_id"), col("sz").as("sz_a")), Seq("a_id"))
      .join(sz.select(col("doc_id").as("b_id"), col("sz").as("sz_b")), Seq("b_id"))
      .filter(col("n_int") * 5 >= (col("sz_a") + col("sz_b") - col("n_int")) * 4)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash+banding agrees with exact Jaccard >= 95% (and verify step is exact)") {
    val exact = exactPairs()
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    val mined = MinHash.nearDuplicates(Tables.documents(spark, TestSpark.sf0001))
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The exact-Jaccard verification makes precision 1.0 by construction:
    assert(mined.subsetOf(exact), s"false positives: ${(mined -- exact).take(5)}")
    val recall = mined.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${mined.size}/${exact.size})")
  }

  test("dedupAssignments: one row per doc, canonical <= doc, dups verified against exact Jaccard") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val got = MinHash.dedupAssignments(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == docs.count())
    assert(got.forall { case (d, c, _) => c <= d })
    val exact = exactPairs()
    val dups = got.filter(_._3 == 1L)
    assert(dups.nonEmpty, "corpus has near-dups, assignments should find some")
    dups.foreach { case (d, c, _) =>
      assert(exact.contains((c, d)), s"assignment ($c <- $d) not an exact near-dup pair")
    }
  }
}
