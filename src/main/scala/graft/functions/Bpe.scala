package graft.functions

import graft.operators.AnnIvf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training + corpus encoding — the
  * subword-tokenizer member of the text family (token_count = whitespace,
  * tokens_tf = word stats, THIS = learned subword units), per the public
  * BPE formulation (Sennrich et al. 2016, ACL — neural MT subword units).
  *
  * Why it belongs in a 100 TB training-data engine: token budgeting and
  * dedup increasingly operate on SUBWORD counts, and the vocabulary must
  * be trained on the corpus itself. The classic algorithm is sequential
  * (each merge depends on the last), but its per-iteration work is one
  * weighted pair count over the DISTINCT-WORD table — which is Heap's-law
  * sized (vocab-scale, not corpus-scale). The distributed shape:
  *
  *   1. ONE corpus pass builds (word, freq) — tokenize-once, hash-groupBy;
  *      at 100 TB this is the only data-sized job, and it is the same
  *      aggregation q_text_tokens_tf already runs.
  *   2. K driver-controlled iterations over the cached word-freq table
  *      (the MLlib iterative-fit pattern): re-segment each distinct word
  *      under the merges learned so far (pure local compute), explode
  *      adjacent symbol pairs weighted by word freq, two-phase sum, and
  *      take the 1-row argmax back to the driver (count DESC, pair ASC —
  *      deterministic tie-break). Each pass shuffles only pair partials
  *      of a vocab-sized table.
  *   3. The learned merge list is KBs — it rides to executors as a plain
  *      closure/reference object; encoding is map-only codegen
  *      (graftext.BpeEncode), no shuffle, no UDF registry.
  *
  * Training uses the typed Dataset API (flatMap over distinct words):
  * acceptable here because the input is vocab-sized by construction —
  * the corpus-sized pass (step 1) stays in codegen'd SQL.
  */
object Bpe {

  /** Ordered merge list; rank = position. A merge is (left, right) over
    * current symbols (initially single characters).
    */
  type Merges = Seq[(String, String)]

  /** Greedy BPE segmentation of one word under a rank table
    * (key = left + " " + right) — delegates to the ONE merge-loop
    * implementation shared with the codegen'd encode expression.
    */
  def encodeWord(word: String, ranks: java.util.Map[String, Integer]): Array[String] =
    org.apache.spark.sql.graftext.BpeExprs.encodeWord(word, ranks)

  def ranksOf(merges: Merges): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }

  /** The one corpus-sized pass: (word, freq) over whitespace tokens. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Train `numMerges` merges; stops early when the best pair's weighted
    * count drops below `minPairCount`. Deterministic: argmax tie-break is
    * (count DESC, left ASC, right ASC).
    */
  def train(docs: DataFrame, numMerges: Int, minPairCount: Long = 2L): Merges = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Distinct-word table (vocab-sized, Heap's law) cached once; every
    // training pass is a distributed job over it — the 1000-executor
    // shape — and only the 1-row argmax ever reaches the driver.
    val wf = wordFreq(docs).as[(String, Long)].cache()
    try {
      var merges = Vector.empty[(String, String)]
      var stop = false
      while (!stop && merges.size < numMerges) {
        val ranks = ranksOf(merges)
        val best = wf.flatMap { case (w, f) =>
          val syms = encodeWord(w, ranks)
          (0 until syms.length - 1).map(i => ((syms(i), syms(i + 1)), f))
        }
          .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .map { case ((l, r), c) => (l, r, c) }
          .orderBy(col("_3").desc, col("_1").asc, col("_2").asc)
          .take(1)
        best match {
          case Array((l, r, c)) if c >= minPairCount => merges :+= ((l, r))
          case _ => stop = true
        }
      }
      merges
    } finally { wf.unpersist(); () }
  }

  /** Merge memo keyed by (corpus dir + fingerprint, numMerges) — the
    * AnnIvf/Pq caching contract: a regenerated corpus retrains, repeat
    * queries never refit.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Merges]()

  def ensureMerges(s: SparkSession, d: String, numMerges: Int = 32): Merges = {
    val fp = AnnIvf.corpusFingerprint(d, "documents")
    cache.computeIfAbsent((s"$d#$fp", numMerges),
      _ => train(graft.Tables.documents(s, d), numMerges))
  }
}
