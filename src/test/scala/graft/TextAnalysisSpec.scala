package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.SimHash

/** Golden gates for the text-analysis primitives (language ID, quality,
  * fingerprinting, simhash) on crafted inputs where the right answer is
  * computable by hand — the corpus draws all languages from one synthetic
  * vocabulary, so function quality MUST be asserted off-corpus.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toksOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "text").select(col("id"), split(col("text"), " ").as("toks"))
  }

  test("langId: crafted sentences resolve to their language") {
    val df = toksOf(Seq(
      (1L, "the cat and the dog is in a house"),
      (2L, "der hund und die katze ist von haus"),
      (3L, "el gato y la casa es en madrid"),
      (4L, "le chat est en paris et le chien")))
    val got = df.select(col("id"), TextAnalysis.langId(col("toks")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "es")
    assert(got(4L) == "fr")
  }

  test("qualityScoreMilli: diverse text beats repetitive stopword-heavy text") {
    val df = toksOf(Seq(
      (1L, "spark stream merge vector query batch"),  // diverse, no stopwords
      (2L, "the the the the a a of of")))             // repetitive + stopwords
    val got = df.select(col("id"), TextAnalysis.qualityScoreMilli(col("toks")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1000L)        // 6 uniq / 6 toks, 0 stop
    assert(got(2L) == -125L)        // 3000/8 = 375 minus 500*8/8 = 500
    assert(got(1L) > got(2L))
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = toksOf(Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c b a"), (4L, "a b d")))
    val got = df.select(col("id"), TextAnalysis.fingerprint(col("toks")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L), "same text, same fingerprint")
    assert(got(1L) != got(3L), "token order must matter (rolling, not bag)")
    assert(got(1L) != got(4L), "content must matter")
  }

  test("fingerprint: no collisions across the sf0.001 corpus's distinct texts") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val n = docs.select(col("text")).distinct().count()
    val nFp = docs
      .select(TextAnalysis.fingerprint(split(col("text"), " ")).as("fp"))
      .distinct().count()
    assert(nFp == n, s"$n distinct texts but $nFp distinct fingerprints")
  }

  test("simhash: identical texts at distance 0, disjoint texts far apart") {
    val df = toksOf(Seq(
      (1L, "agg batch big column customer data dup fast filter group"),
      (2L, "agg batch big column customer data dup fast filter group"),
      (3L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10")))
    val fps = df.select(col("id"), SimHash.fingerprint64(col("toks")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    val far = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(far > SimHash.MaxHamming, s"disjoint docs only $far bits apart")
  }

  test("simhash banded pipeline: finds exact-dup pair, excludes disjoint docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "agg batch big column customer data dup fast filter group"),
      (2L, "agg batch big column customer data dup fast filter group"),
      (3L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10"),
      (4L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
    val assign = SimHash.dedupAssignments(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(assign.toSeq == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 3L, 0L), (4L, 4L, 0L)))
  }
}
