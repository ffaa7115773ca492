package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema evolution over long-lived parquet datasets (SURVEY §2.21).
  *
  * A 100 TB corpus is written over months: late batches grow columns
  * (a new quality score, a new provenance tag) and old files never get
  * rewritten. Two ways to read the union:
  *
  *  - `readMerged` — parquet `mergeSchema=true`. Correct, but planning
  *    cost is a FOOTER READ OF EVERY FILE before the first task runs:
  *    at millions of files that is a driver-side metadata sweep per
  *    query. Use it once, to DISCOVER the unified schema.
  *  - `readUnified` — the discovered schema declared explicitly.
  *    Planning is O(1) in file count (no footer sweep); files missing a
  *    column yield nulls, exactly like mergeSchema. This is the form a
  *    production pipeline ships: discover once (or read the catalog),
  *    pin the schema, read cheap forever.
  *
  * `unionEvolved` is the DataFrame-level analogue for frames that are
  * already loaded: positional `union` would silently misalign evolved
  * schemas (or refuse); by-name union with missing columns null-filled
  * is the only shape that survives column addition.
  */
object Evolution {

  /** Schema-discovery read: merges every file footer's schema. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Production read: explicit unified schema, no footer sweep; files
    * written before a column existed return null for it.
    */
  def readUnified(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(dir)

  /** By-name union across evolved frames; columns absent on one side
    * are null-filled (never positionally misbound).
    */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionEvolved of zero frames")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
