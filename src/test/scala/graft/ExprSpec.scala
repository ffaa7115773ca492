package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LlmOps
import org.apache.spark.sql.graftext.VectorExprs

/** Pins the custom codegen expressions (graftext.QuantizedDot / FloatDot)
  * to built-in HOF semantics on real corpus vectors, including nulls, and
  * checks they stay inside WholeStageCodegen.
  */
class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs = {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .filter(col("a_id") < 40)
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      .filter(col("b_id") < 40)
    a.crossJoin(b)
  }

  test("QuantizedDot == HOF zip_with/aggregate on corpus vectors") {
    val df = pairs
      .select(col("a_id"), col("b_id"),
        LlmOps.qdot(LlmOps.quantize(col("a_emb")), LlmOps.quantize(col("b_emb"))).as("native"),
        LlmOps.qdotHof(LlmOps.quantize(col("a_emb")), LlmOps.quantize(col("b_emb"))).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.count() == 1600)
  }

  test("SignBands == driver-side reference loop over the pinned plane formula") {
    import org.apache.spark.sql.graftext.SignBands
    val (dim, bands, bits) = (64, 8, 12)
    val planes = SignBands.planes(dim, bands * bits)
    val rows = Tables.embeddings(spark, TestSpark.sf0001)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        col("embedding"),
        VectorExprs.signBands(col("embedding"), dim, bands, bits).as("bv"))
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val got = r.getSeq[Long](2)
      val want = (0 until bands).map { b =>
        (0 until bits).foldLeft(0L) { (acc, k) =>
          val base = (b * bits + k) * dim
          val dot = (0 until dim).foldLeft(0.0)((s, i) => s + emb(i).toDouble * planes(base + i))
          if (dot > 0.0) acc | (1L << k) else acc
        }
      }
      assert(got == want, s"vec ${r.getLong(0)}")
    }
  }

  test("FloatDot == HOF double accumulation, bitwise") {
    val hof = aggregate(
      zip_with(col("a_emb"), col("b_emb"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val df = pairs.select(
      VectorExprs.fdotNative(col("a_emb"), col("b_emb")).as("native"), hof.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null propagation: null on either side -> null out") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1L, 2L)), Some(Array(3L, 4L))),
      (None, Some(Array(3L, 4L))),
      (Some(Array(1L, 2L)), None)
    ).toDF("a", "b")
    val got = df.select(VectorExprs.qdotNative(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(11L), None, None))
  }

  test("MinHashSlots/SimHash64 == their HOF references on corpus token arrays") {
    import graft.operators.{MinHash, SimHash}
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), MinHash.baseHashes(col("toks")).as("base"), col("toks"))
    val sigDiff = toks.select(
      MinHash.signatureFromBase(col("base")).as("native"),
      MinHash.signatureFromBaseHof(col("base")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(sigDiff == 0, "minhash signatures diverge from HOF reference")
    val fpDiff = toks.select(
      SimHash.fingerprint64(col("toks")).as("native"),
      SimHash.fingerprint64Hof(col("toks")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(fpDiff == 0, "simhash fingerprints diverge from HOF reference")
  }

  test("SQL function registration: quantized_dot/float_dot resolve in spark.sql") {
    org.apache.spark.sql.graftext.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT quantized_dot(array(1L, 2L), array(3L, 4L)) AS q,
        |       float_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS f
        |""".stripMargin).head()
    assert(r.getLong(0) == 11L)
    assert(r.getDouble(1) == 3.0)
  }

  test("custom expressions stay inside WholeStageCodegen") {
    val df = pairs.select(sum(VectorExprs.fdotNative(col("a_emb"), col("b_emb"))))
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' is the WholeStageCodegen marker in AQE's final-plan rendering;
    // the aggregate evaluating float_dot must carry it (a CodegenFallback
    // expression would strip the star from its enclosing stage).
    assert(plan.contains("*(") && plan.contains("float_dot"), plan)
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plan).isDefined, plan)
  }

  test("NormText == the legacy lower/strip/collapse/trim regex chain, byte-for-byte") {
    import org.apache.spark.sql.graftext.TextExprs
    // The chain NormText replaced (LlmOps r15) — kept here as the reference.
    def legacy(c: org.apache.spark.sql.Column) = trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))
    val adversarial = Seq(
      "", " ", "   ", "a", "A", "  leading", "trailing  ", "a  b   c",
      "Hello, World!  42", "tabs\tand\nnewlines keep nothing",
      "punct...!!!???", "--- ---", "a-b_c.d", "0123456789",
      "MiXeD CaSe 123", "double  spaces   after, punct.  x",
      "İstanbul DİACRITICS", "ß sharp s", "Σίσυφος ΣΊΣΥΦΟΣ",
      "naïve café résumé", "emoji 😀 inside", "中文 mixed ascii 42",
      "combining ö umlaut", "ﬁ ligature", null
    ).zipWithIndex
    val df = spark.createDataFrame(adversarial.map { case (t, i) => (i, t) })
      .toDF("id", "text")
      .select(col("id"), col("text"),
        TextExprs.normText(col("text")).as("fast"), legacy(col("text")).as("slow"))
    val bad = df.filter(not(col("fast") <=> col("slow"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
    // And on real corpus text end to end: same md5 keys, same dup groups.
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val cmp = docs.select(
      md5(TextExprs.normText(col("text")).cast("binary")).as("fast"),
      md5(legacy(col("text")).cast("binary")).as("slow"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() == 0)
    // Codegen: the expression must not strip the star from its stage.
    val plan0 = docs.select(TextExprs.normText(col("text")).as("n"))
      .filter(col("n").isNotNull)
    plan0.collect()
    val plan = plan0.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("norm_text"), plan)
  }
}
