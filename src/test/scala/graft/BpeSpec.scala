package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.BpeExprs
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the BPE tokenizer (SURVEY §2.28): the merge sequence against
  * a hand-derived classic corpus, lossless round-trip over the real
  * corpus, training determinism, and codegen-expression ≡ driver
  * reference. (BPE has no SQL twin — these specs ARE its correctness
  * contract, the minhash/ANN precedent.)
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The Sennrich-style textbook corpus: low×5 lower×2 newest×6 widest×3.
    * Hand derivation (weighted pair counts, tie-break count DESC then
    * pair ASC):
    *   1. (e,s) 9  (ties (s,t) 9, "e" < "s")
    *   2. (es,t) 9
    *   3. (l,o) 7  (ties (o,w) 7)
    *   4. (lo,w) 7
    */
  test("merge sequence matches the hand-derived classic corpus") {
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.toDF("text")
    val merges = Bpe.train(df, numMerges = 4, minPairCount = 1L)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("training stops early when the best pair drops below minPairCount") {
    val df = Seq("ab", "ab", "cd").toDF("text")
    // (a,b) count 2 qualifies at threshold 2; (c,d) count 1 does not.
    val merges = Bpe.train(df, numMerges = 10, minPairCount = 2L)
    assert(merges == Seq(("a", "b")))
  }

  test("corpus round-trip: tokens concatenate back to every distinct word") {
    val merges = Bpe.ensureMerges(spark, TestSpark.sf0001)
    assert(merges.size == 32, s"expected 32 merges, got ${merges.size}")
    val ranks = Bpe.ranksOf(merges)
    val words = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString == w, s"round-trip broke for '$w': ${toks.toSeq}")
    }
    // Learned subwords compress: strictly fewer tokens than characters
    // over the corpus vocabulary.
    val totalToks = words.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum
    val totalChars = words.map(_.length.toLong).sum
    assert(totalToks < totalChars,
      s"no compression: $totalToks tokens vs $totalChars chars")
  }

  test("training is deterministic (two independent fits agree)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = Bpe.train(docs, numMerges = 8)
    val b = Bpe.train(docs, numMerges = 8)
    assert(a == b)
  }

  test("codegen encode expression == driver reference on the real corpus") {
    val merges = Bpe.ensureMerges(spark, TestSpark.sf0001)
    val ranks = Bpe.ranksOf(merges)
    val got = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), BpeExprs.bpeEncode(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val want = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
      .map { case (id, text) =>
        id -> text.split(' ').filter(_.nonEmpty).flatMap(Bpe.encodeWord(_, ranks)).toSeq
      }
    assert(got.keySet == want.keySet)
    got.foreach { case (id, toks) =>
      assert(toks == want(id), s"doc $id: expression and reference disagree")
    }
  }

  test("null text encodes to null; empty text to an empty array") {
    val df = Seq((1L, Some("low lower")), (2L, None), (3L, Some("")))
      .toDF("id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val r = df.select(col("id"), BpeExprs.bpeEncode(col("text"), merges).as("t"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    // "low" -> [low]; "lower" -> [low, e, r]
    assert(r(1L).contains(Seq("low", "low", "e", "r")))
    assert(r(2L).isEmpty)
    assert(r(3L).contains(Seq.empty[String]))
  }
}
