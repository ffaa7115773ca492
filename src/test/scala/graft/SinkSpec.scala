package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.sources.Sinks
import graft.streaming.StreamOps

/** Output-layout and stream-equals-batch gates:
  *  - date-partitioned writes produce Hive-style directories and later
  *    reads PRUNE non-matching partitions (PartitionFilters in the scan);
  *  - the event-time aggregations produce identical results via the
  *    streaming file source (Trigger.AvailableNow) and the batch path.
  */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned-by-date write prunes on read") {
    val out = Files.createTempDirectory("graft_part_").toString
    Sinks.writePartitionedByDate(
      Tables.orders(spark, TestSpark.sf0001), "o_orderdate", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("p_date=")), dirs.mkString(","))

    val read = spark.read.parquet(out).filter(col("p_date") === "1995-03-01")
    read.collect()
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("p_date"), scan)
    assert(!scan.contains("PartitionFilters: []"), "date filter did not prune: " + scan)

    val expected = Tables.orders(spark, TestSpark.sf0001)
      .filter(to_date(col("o_orderdate")) === "1995-03-01").count()
    assert(read.count() == expected)
  }

  test("streaming file source produces the same tumbling aggregation as batch") {
    // stage the events file into a directory (the file stream source lists dirs)
    val dir = Files.createTempDirectory("graft_stream_src_")
    Files.copy(
      java.nio.file.Paths.get(TestSpark.sf0001, "events.parquet"),
      dir.resolve("events.parquet"))
    val q = StreamOps.tumblingAgg(StreamOps.eventsStream(spark, dir.toString))
      .writeStream.format("memory").queryName("stream_vs_batch")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("stream_vs_batch")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val batch = StreamOps.tumblingAgg(Tables.events(spark, TestSpark.sf0001))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      "streaming and batch must agree on the same data")
  }
}
