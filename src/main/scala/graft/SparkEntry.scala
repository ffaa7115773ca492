package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §3 (lifecycle).
  * Queries live in per-section packs; this object only concatenates them.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    operators.ScanOps,
    operators.JoinOps,
    operators.AggOps,
    operators.WinOps,
    operators.SubqOps,
    operators.TpchOps,
    operators.TpchOps2,
    operators.LinkOps,
    operators.BpeOps,
    operators.ModernSqlOps,
    operators.LlmOps,
    operators.MlOps,
    streaming.StreamOps,
    functions.FnOps
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.AggOps.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    require(all.size == all.map(_._1).distinct.size, "duplicate query keys across packs")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = {
    val all = packs.flatMap(_.oracle).toMap
    val orphans = all.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracle sql without matching query: $orphans")
    all
  }
}
