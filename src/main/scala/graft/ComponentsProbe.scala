package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement main for the dedup_clusters tail (round-6 verdict: 235 s at
  * sf100): does the alternating large-star/small-star formulation
  * (Components.altStar) beat iterated min-label propagation + pointer
  * jumping (Components.minLabel) over the REAL verified-edge pipeline?
  *
  * §4 decision-gate pattern: assert label-identical output first, then 3
  * timed noop-write runs per variant over SPARK_GRAFT_SF_DIR; the winner
  * becomes (or stays) the registered dedup_clusters implementation, and
  * the numbers land in BASELINE.md either way.
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt, "graft-components-probe")
    val docs = Tables.documents(spark, sfDir)
    val toksExpr = array_distinct(split(col("text"), " "))

    def viaMinLabel: DataFrame = {
      val verified = operators.MinHash.verifiedEdges(docs, toksExpr)
      operators.Components.minLabel(docs.select(col("doc_id")), verified, "doc_id")
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    }
    def viaStar: DataFrame = {
      val verified = operators.MinHash.verifiedEdges(docs, toksExpr)
      operators.Components.altStar(docs.select(col("doc_id")), verified, "doc_id")
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    }

    // Equivalence first (the measurement is meaningless if they differ):
    // order-independent checksum over the full label table.
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(doc_id, cluster_id))")).head()
      (r.getLong(0), r.getLong(1))
    }
    val sa = sig(viaMinLabel)
    val sb = sig(viaStar)
    require(sa == sb, s"label tables diverge: minLabel=$sa star=$sb")
    println(s"[components-probe] label tables identical: $sa")

    def time(label: String)(mk: => DataFrame): Double = {
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(1)
      println(f"[components-probe] $label%-9s median=$med%.3f s (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }
    val tm = time("minlabel")(viaMinLabel)
    val ts = time("star")(viaStar)
    println(f"[components-probe] sfDir=$sfDir minlabel=$tm%.3f s star=$ts%.3f s speedup=${tm / ts}%.2f")
    spark.stop()
  }
}
