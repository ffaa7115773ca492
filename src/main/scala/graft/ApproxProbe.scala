package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHash

/** Throwaway measurement main (contents change per investigation). */
object ApproxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1")
    val spark = Sessions.build("local[32]", 32, "graft-probe")
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(act: => Unit): Unit = {
      val t0 = System.nanoTime()
      act
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val toks = array_distinct(split(col("text"), " "))
    val sh = MinHash.shingles(array_distinct(split(col("text"), " ")), 2)
    val justShingles = docs.select(col("doc_id"), sh.as("s"))
    time("shingle arrays only")(justShingles.write.format("noop").mode("overwrite").save())
    val baseH = docs.select(col("doc_id"), MinHash.baseHashes(sh).as("base"))
    time("shingle base hashes")(baseH.write.format("noop").mode("overwrite").save())
    val sig = baseH.select(col("doc_id"), MinHash.signatureFromBase(col("base")).as("sig"))
    time("shingle signatures")(sig.write.format("noop").mode("overwrite").save())
    val bands = MinHash.bandedSignatures(docs, sh)
    time("shingled bandedSignatures")(bands.write.format("noop").mode("overwrite").save())
    time("bucket stats")(println("  buckets=" +
      bands.groupBy(col("band"), col("bh")).count()
        .agg(count(lit(1)), max(col("count")), sum(col("count") * col("count"))).collect().mkString))
    time("full shingled dedupAssignments")(
      MinHash.dedupAssignments(docs, sh).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
