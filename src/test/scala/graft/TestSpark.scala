package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession per test JVM (Test / fork := true), built through the
  * library's supported construction path (Sessions.build: UTC,
  * nanos-as-long, pinned shuffle partitions).
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.build("local[8]", 8, "graft-test")

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
