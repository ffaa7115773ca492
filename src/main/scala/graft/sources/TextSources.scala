package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** SURVEY.md §2.1 — explicit-schema CSV and JSON ingest.
  *
  * Policy: schemas are always explicit (inference samples the input — an
  * extra pass at scale, and nondeterministic-ish across engines), malformed
  * rows land in a rescue column instead of being silently dropped, and the
  * reader is the stock vectorized text source (splittable files, predicate
  * pushdown on parsed columns).
  */
object TextSources {

  /** The UCI-Iris-shaped schema the reference ingests (FIXTURES.md §4).
    * Fields stay nullable: Spark's file sources force nullable=true on read
    * (a missing value is representable in any row of a text file).
    */
  val irisSchema: StructType = StructType(Seq(
    StructField("sepal_length", DoubleType),
    StructField("sepal_width", DoubleType),
    StructField("petal_length", DoubleType),
    StructField("petal_width", DoubleType),
    StructField("species", StringType)))

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  def readIrisCsv(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, irisSchema)

  /** ORC read — the second columnar lake format Spark ships natively
    * (vectorized reader, predicate pushdown, column pruning — the same
    * levers as parquet; spark-avro is a separate connector and not on this
    * classpath, so ORC is the supported alternative). Schema explicit for
    * the same determinism reasons as the text sources, though ORC embeds
    * one.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** XML ingest — Spark 4 ships the XML data source natively (the former
    * spark-xml connector folded into spark-sql). Same explicit-schema
    * discipline as CSV/JSON: inference would cost an extra pass and XML
    * type guessing is looser than either text format. Row granularity is
    * the repeated `rowTag` element, so files split on element boundaries;
    * PERMISSIVE mode rescues malformed elements instead of dropping them.
    */
  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String = "row"): DataFrame =
    spark.read
      .schema(schema)
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite")
      .option("rowTag", rowTag)
      .option("rootTag", "rows")
      .xml(path)
}
