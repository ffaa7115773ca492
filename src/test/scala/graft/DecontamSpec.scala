package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Decontam

/** Decontam.sweep knob equivalences on sf0.001: every regime (hash-gram,
  * bloom pre-pass, both) must produce the SAME flagged set as the
  * oracle-gated broadcast/string default — the knobs change the cost
  * shape, never the answer. Plus the gram-length monotonicity property
  * (shorter grams flag a superset) and the bloom plan-shape claim (no
  * broadcast relation of the eval grams).
  */
class DecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.documents(spark, TestSpark.sf0001)
  private def train = docs.filter(col("doc_id") >= 100)
  private def evalSet = docs.filter(col("doc_id") < 100)

  private def flagged(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val baseline = flagged(Decontam.sweep(train, evalSet))

  test("default sweep matches the registered q_text_decontam query") {
    assert(baseline.nonEmpty, "corpus has heavy near-duplication; sweep must fire")
    val registered = flagged(
      SparkEntry.queries("q_text_decontam")(spark, TestSpark.sf0001))
    assert(baseline == registered)
  }

  test("hash-gram regime flags the identical set with identical counts") {
    assert(flagged(Decontam.sweep(train, evalSet, hashGrams = true)) == baseline)
  }

  test("bloom regime (exact join after pre-filter) is result-identical, strings and hashes") {
    val bloom = Decontam.sweep(train, evalSet, bloomEvalItems = Some(100000L))
    assert(flagged(bloom) == baseline)
    assert(flagged(Decontam.sweep(train, evalSet, hashGrams = true,
      bloomEvalItems = Some(100000L))) == baseline)
    // The regime's point: the eval grams are no longer FORCED to broadcast
    // (only the fixed-size bloom bitmap ships with the task closures) —
    // the join strategy goes back to the planner's size-based choice. At
    // sf0.001 AQE rightly still picks broadcast (the gram set is tiny);
    // the invariant is the absence of the hint, not of the node.
    val hints = bloom.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"bloom regime must not hint a broadcast: $hints")
  }

  test("a high-fpp bloom still gives exact results (the join decides, not the filter)") {
    // fpp 0.5 floods the exact join with false positives; the answer must
    // not change — this is what makes the bloom a pre-filter, not a gate.
    assert(flagged(Decontam.sweep(train, evalSet,
      bloomEvalItems = Some(1000L), bloomFpp = 0.5)) == baseline)
  }

  test("shorter grams flag a superset of longer grams (every shared 5-gram contains shared 3-grams)") {
    val n3 = flagged(Decontam.sweep(train, evalSet, n = 3))
    assert(baseline.keySet.subsetOf(n3.keySet),
      s"5-gram flags not in 3-gram set: ${(baseline.keySet -- n3.keySet).take(5)}")
    assert(n3.size >= baseline.size)
  }
}
