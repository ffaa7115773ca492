package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for training-data pipelines: quality features,
  * BPE-ish token counting, language ID, and document fingerprinting — all
  * pure Catalyst expressions (codegen where Spark supports it, no UDFs, no
  * driver-side state), so they run unchanged at any scale.
  */
object TextAnalysis {

  /** Stopword list used by quality scoring and language ID. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic (public-knowledge function-word lists).
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "a", "in", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "que", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "en", "que", "un"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1"))

  /** Number of word tokens ([a-z]+ runs) — the whitespace-free counter. */
  def wordCount(text: Column): Column = regexp_count(text, lit("[a-z]+"))

  /** BPE-ish subword piece count: consonant clusters and vowel runs counted
    * separately (a crude but deterministic stand-in for a merge-table
    * tokenizer's piece count).
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[bcdfghjklmnpqrstvwxyz]+")) +
      regexp_count(text, lit("[aeiou]+"))

  /** Stopword count over a token array (integer; ratio left to the caller
    * so oracle math can stay in integers). Codegen'd CountInSet, NOT
    * size(filter(isInCollection)) — the HOF is CodegenFallback and
    * interpreted per element.
    */
  def stopwordCount(toks: Column): Column =
    org.apache.spark.sql.graftext.VectorExprs.countInSet(toks, EnStopwords)

  /** Integer division for non-negative longs (matches DuckDB `//`). Exact
    * long division — `a div b` in Spark SQL is integral division on longs,
    * never touching doubles. (The earlier floor(double/double) form was
    * exact only while a < 2^53 and the quotient wasn't within one ulp of an
    * integer — a corpus-shape lottery; see IDivPropertySpec.)
    */
  def idiv(a: Column, b: Column): Column =
    call_function("div", a.cast(LongType), b.cast(LongType))

  /** Quality score in integer milli-units: rewards vocabulary diversity and
    * penalizes stopword share. score = 1000*uniq/toks - 500*stop/toks,
    * all-integer (identical across engines).
    */
  def qualityScoreMilli(toks: Column): Column = {
    val n = size(toks).cast(LongType)
    val uniq = size(array_distinct(toks)).cast(LongType)
    val stop = stopwordCount(toks)
    idiv(uniq * 1000, n) - idiv(stop * 500, n)
  }

  /** Language ID: argmax over per-language stopword-profile hit counts,
    * ties broken by language code order (earliest wins).
    *
    * Shaped as ONE array_max over (score, rev-rank) structs — lexicographic
    * struct comparison picks the highest score, then the highest rev = the
    * alphabetically earliest language, exactly the old strict-> fold
    * semantics. The fold formulation it replaces nested each score
    * expression into every later when() branch, so the interpreted HOF
    * profile counts were re-evaluated many times per row — measured
    * 19.4 s -> 7.5 s at sf3 from the argmax shape alone; the codegen'd
    * CountInSet profile counts (vs CodegenFallback filter/isInCollection)
    * cut the rest. Each profile count is evaluated exactly once.
    */
  def langId(toks: Column): Column = {
    val ordered = LangProfiles.toSeq.sortBy(_._1)
    val n = ordered.size
    val entries = ordered.zipWithIndex.map { case ((lang, words), i) =>
      struct(org.apache.spark.sql.graftext.VectorExprs.countInSet(toks, words).as("score"),
        lit(n - 1 - i).as("rev"))
    }
    val langsByRev = array(ordered.reverse.map(p => lit(p._1)): _*)
    element_at(langsByRev, array_max(array(entries: _*)).getField("rev") + 1)
  }

  /** Order-sensitive 64-bit document fingerprint: xor-rotate fold of token
    * hashes (a rolling hash without multiplication — Spark 4 ANSI mode
    * throws on long overflow; rotate+xor cannot overflow and stays
    * order-sensitive, unlike plain xor).
    */
  def fingerprint(toks: Column): Column =
    aggregate(transform(toks, t => xxhash64(t)), lit(0L),
      (acc, h) => shiftleft(acc, 7).bitwiseOR(shiftrightunsigned(acc, 57)).bitwiseXOR(h))
}
