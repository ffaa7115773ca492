package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, MinHash}

/** Throwaway measurement main (contents change per investigation). */
object ApproxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf10")
    val spark = Sessions.build("local[32]", 32, "graft-probe")
    val docs = Tables.documents(spark, sfDir)
    def time(label: String)(act: => Unit): Unit = {
      val t0 = System.nanoTime()
      act
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // replicate dedupClusters internals to split edge cost from iteration
    import org.apache.spark.sql.expressions.Window
    val toksExpr = array_distinct(split(col("text"), " "))
    val toks = docs.select(col("doc_id"), toksExpr.as("toks")).repartition(col("doc_id"))
    val wB = Window.partitionBy(col("band"), col("bh")).orderBy(col("doc_id"))
    val edges = MinHash.bandedFromToks(toks)
      .select(col("doc_id"),
        min(col("doc_id")).over(wB).as("bmin"),
        lag(col("doc_id"), 1).over(wB).as("prev"))
      .select(col("doc_id"), explode(array(col("bmin"), col("prev"))).as("nbr"))
      .filter(col("nbr").isNotNull && col("nbr") < col("doc_id"))
      .select(col("nbr").as("a_id"), col("doc_id").as("b_id"))
      .distinct()
    val verified = edges
      .join(toks.select(col("doc_id").as("a_id"), col("toks").as("ta")), Seq("a_id"))
      .join(toks.select(col("doc_id").as("b_id"), col("toks").as("tb")), Seq("b_id"))
      .filter(size(array_intersect(col("ta"), col("tb"))) * 5 >=
        size(array_union(col("ta"), col("tb"))) * 4)
      .select(col("a_id"), col("b_id"))
    time("raw edge count")(println("  edges=" + edges.count()))
    time("verified edge count")(println("  verified=" + verified.count()))
    time("minLabel over verified")(println("  labels=" +
      Components.minLabel(docs.select(col("doc_id")), verified, "doc_id").count()))
    time("full dedupClusters")(
      MinHash.dedupClusters(docs).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
