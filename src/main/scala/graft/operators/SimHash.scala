package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SimHash near-duplicate detection — the Hamming-space twin of MinHash.
  *
  * fingerprint64: bit b of the fingerprint is the majority vote of bit b
  * across the token hashes. Similar token sets flip few majority votes, so
  * near-dup docs land within small Hamming distance.
  *
  * Banding: a 64-bit fingerprint split into 4 x 16-bit chunks. By
  * pigeonhole, Hamming distance <= 3 forces at least one chunk to match
  * exactly, so the candidate join is a bucketed equi-join on
  * (chunk_id, chunk_value) — never an n² scan — and the exact bit_count
  * check runs on candidates only. All static bit positions: every shift
  * amount is a Scala constant, so nothing fights ANSI overflow rules.
  */
object SimHash {
  val Bits = 64
  val Chunks = 4
  val ChunkBits = 16 // Bits / Chunks
  val MaxHamming = 3 // pigeonhole-complete for Chunks = MaxHamming + 1

  /** 64-bit simhash of a token array (majority vote per bit) — the
    * codegen'd custom Expression (equivalence vs the HOF reference pinned
    * in ExprSpec).
    */
  def fingerprint64(toks: Column): Column =
    org.apache.spark.sql.graftext.VectorExprs.simhash64(
      transform(toks, t => xxhash64(t)))

  /** HOF reference implementation, kept only as the equivalence oracle for
    * the codegen'd SimHash64 expression.
    */
  def fingerprint64Hof(toks: Column): Column = {
    val base = transform(toks, t => xxhash64(t))
    val zero = array((0 until Bits).map(_ => lit(0L)): _*)
    val bitArrays = transform(base, h =>
      array((0 until Bits).map(b =>
        shiftrightunsigned(h, b).bitwiseAND(lit(1L))): _*))
    val counts = aggregate(bitArrays, zero, (acc, v) => zip_with(acc, v, _ + _))
    val n = size(base).cast(LongType)
    (0 until Bits).map { b =>
      when(element_at(counts, b + 1) * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** (doc_id, fp, chunk, cv) — one row per 16-bit chunk per doc. */
  def chunked(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        fingerprint64(array_distinct(split(col("text"), " "))).as("fp"))
      .repartition(col("doc_id")) // fingerprint computed once; exchange reused
      .select(col("doc_id"), col("fp"), explode(array((0 until Chunks).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("fp"), c * ChunkBits)
            .bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("ch"))
      .select(col("doc_id"), col("fp"), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))

  /** Verified near-dup pairs: Hamming(fp_a, fp_b) <= MaxHamming. */
  def nearDuplicatePairs(docs: DataFrame): DataFrame = {
    val ch = chunked(docs)
    val a = ch.select(col("chunk"), col("cv"), col("doc_id").as("a_id"), col("fp").as("a_fp"))
    val b = ch.select(col("chunk"), col("cv"), col("doc_id").as("b_id"), col("fp").as("b_fp"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast(LongType).as("hd"))
      .filter(col("hd") <= MaxHamming)
      .distinct()
  }

  /** Scale artifact (same shape as MinHash.dedupAssignments): one row per
    * doc with the smallest doc_id within MaxHamming, or itself. Unlike the
    * minhash path, this KEEPS the candidate-pair join: simhash chunk
    * buckets are near-singletons on non-identical docs (a 16-bit chunk
    * match is rare), so the per-bucket join is cheap — measured faster than
    * the window-min formulation, which pays two wide shuffles of the
    * fingerprint column.
    */
  def dedupAssignments(docs: DataFrame): DataFrame = {
    val pairs = nearDuplicatePairs(docs)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("cand"))
    docs.select(col("doc_id"))
      .join(pairs.select(col("b_id").as("doc_id"), col("cand")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cand"), col("doc_id")).as("dup_of"))
      .withColumn("is_dup", (col("dup_of") =!= col("doc_id")).cast(LongType))
  }
}
