package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via flatMapGroupsWithState — the escape
  * hatch for semantics the built-in windows/dedup operators cannot express
  * (here: a cross-batch running counter with a per-key high-water mark).
  * State is one fixed-size record per key, bounded regardless of stream
  * length; at scale the state store shards by the grouping key.
  */
object StatefulOps {

  case class CounterState(count: Long, maxValueCents: Long)
  case class CounterUpdate(userId: Long, count: Long, maxValueCents: Long)

  /** Per-user running event count + max value (cents), emitted once per
    * user per micro-batch in which the user appears.
    */
  def runningCounter(
      grouped: KeyValueGroupedDataset[Long, (Long, Long)]): Dataset[CounterUpdate] = {
    implicit val stateEnc: Encoder[CounterState] = ExpressionEncoder()
    implicit val outEnc: Encoder[CounterUpdate] = ExpressionEncoder()
    grouped.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[CounterState]) =>
        val prev = state.getOption.getOrElse(CounterState(0L, Long.MinValue))
        var n = prev.count
        var mx = prev.maxValueCents
        rows.foreach { case (_, cents) =>
          n += 1
          if (cents > mx) mx = cents
        }
        state.update(CounterState(n, mx))
        Iterator(CounterUpdate(userId, n, mx))
    }
  }

  /** foreachBatch exactly-once upsert onto plain parquet: DYNAMIC partition
    * overwrite keyed by `partCol` replaces only the partitions present in
    * the micro-batch, so an update-mode aggregation lands as a keyed upsert
    * — and a restart that REPLAYS the last batch rewrites those same
    * partitions with identical content (the batch is deterministic from the
    * checkpointed offsets), giving exactly-once EFFECT on an at-least-once
    * sink with no transaction log.
    *
    * Scale note: the overwrite unit is the partition directory, so partCol
    * must be the upsert key itself (every key in a partition is rewritten).
    * File-per-key is fine for bounded key spaces (per-entity rollups); an
    * unbounded key space needs a transactional table format (MERGE) — this
    * helper is the no-dependency idiom, not a replacement for one.
    */
  def upsertByPartition(outDir: String, partCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      batch.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(outDir)
    }
  }
}
