package graft.operators

import graft.QueryPack
import graft.Tables._
import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.BpeExprs
import org.apache.spark.sql.types.LongType

/** SURVEY.md §2.28 — the learned-subword-tokenizer queries over the BPE
  * module (functions/Bpe.scala trains, graftext.BpeEncode encodes).
  * Both are spec-gated (BpeSpec: hand-derived merge sequence, round-trip,
  * determinism, expression≡reference) — BPE is not SQL-expressible, so
  * the driver records the weaker rows-only check, same as minhash/ANN.
  *
  * Scale: training is K driver-controlled vocab-sized jobs after ONE
  * corpus-sized word count (see Bpe.scala scaladoc); the encode query is
  * the map-only codegen'd pass + the same two-phase count every other
  * token query runs. The trained merge list is memoized per corpus
  * fingerprint, so repeated queries (and the driver's determinism rerun)
  * never refit.
  */
object BpeOps extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The trained vocabulary itself: one row per merge, in training
    // order. Driver-local by nature (the merge list IS the model, KBs).
    "q_text_bpe_vocab" -> ((s, d) => {
      import s.implicits._
      Bpe.ensureMerges(s, d).zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
        .toDF("rank", "left", "right", "merged")
        .orderBy(col("rank").asc)
    }),

    // Corpus re-tokenized under the learned vocabulary: top-30 subword
    // tokens by occurrence. The encode is map-only codegen; the count is
    // the standard two-phase aggregate; top-30 fuses into
    // TakeOrderedAndProject.
    "q_text_bpe_encode" -> ((s, d) => {
      val merges = Bpe.ensureMerges(s, d)
      documents(s, d)
        .select(explode(BpeExprs.bpeEncode(col("text"), merges)).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).cast(LongType).as("n"))
        .orderBy(col("n").desc, col("tok").asc)
        .limit(30)
    })
  )

  override def oracle: Map[String, String] = Map.empty
}
