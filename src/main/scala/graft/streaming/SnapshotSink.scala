package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.sources.SnapshotStore

/** Transactional streaming sink: Structured Streaming micro-batches
  * committed into a [[SnapshotStore]] table — the composition that turns
  * the store into a streaming-writable lakehouse table.
  *
  * Why the plain `foreachBatch` + parquet-upsert pattern
  * (StatefulOps.upsertByPartition) isn't enough: dynamic partition
  * overwrite gives exactly-once CONTENT, but a reader racing the
  * overwrite can observe a half-replaced partition. Routing each batch
  * through `SnapshotStore.merge` instead gives every micro-batch commit
  * snapshot isolation (readers see whole versions only), time travel
  * across batch boundaries, and a version history that doubles as the
  * stream's audit log.
  *
  * Exactly-once across RESTARTS is the `(appId, batchId)` transaction
  * marker ([[SnapshotStore.lastTxn]], the Delta `txn` action): after a
  * crash between sink-commit and checkpoint-commit, Structured Streaming
  * replays the last batch with the SAME batchId — the guard sees
  * `lastTxn >= batchId` and skips, so the replay is a no-op instead of a
  * double-merge. (Within one run, batchIds are strictly increasing, so
  * the guard never skips fresh work.)
  *
  * A CONCURRENT batch writer to the same table surfaces as
  * [[SnapshotStore.SnapshotConflictException]] from the losing merge —
  * the stream fails loudly and restarts from its checkpoint rather than
  * silently interleaving (the store's single-writer-per-commit contract).
  *
  * Scale posture: per micro-batch cost is the merge's — proportional to
  * the batch plus its touched partitions, never the table; the manifest
  * chain grows by one KB-sized entry per batch and is the thing
  * [[SnapshotStore.vacuum]] trims. Pair with periodic
  * [[SnapshotStore.compact]] (selected partitions, sorted range-split)
  * to fold the per-batch small files back into stats-prunable layout —
  * compaction is its own atomic commit, safe to run beside the stream
  * (a lost race simply surfaces as the store's conflict and is retried).
  */
object SnapshotSink {

  /** The `foreachBatch` function: merge each micro-batch into the store
    * by key within partition, replay-safe via the txn marker. Usage:
    *
    * {{{
    * df.writeStream
    *   .foreachBatch(SnapshotSink.mergeBatch(root, "k", "part", "appX"))
    *   .option("checkpointLocation", ckpt).start()
    * }}}
    */
  /** The append-mode twin of [[mergeBatch]]: each micro-batch lands as an
    * append commit (the event-log shape — no key, rows only ever added),
    * with the SAME txn-marker replay guard and empty-batch skip. First
    * batch bootstraps the table; `partCol = None` writes an unpartitioned
    * log (or follows the table's recorded layout if one exists).
    */
  def appendBatch(root: String, partCol: Option[String],
                  appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      // Pin + full count FIRST (the documented foreachBatch pattern for
      // multi-action use): a limit-1 emptiness probe executes only a
      // partition prefix, which (a) re-runs the micro-batch scan per
      // action and (b) leaves stateful-upstream state stores uncommitted
      // — Spark 4's state-store commit validation fails the batch
      // (StreamingSpec's chained-topology scenario caught it).
      batch.persist()
      try {
        val n = batch.count()
        if (n == 0L) ()
        else if (SnapshotStore.lastTxn(root, appId).exists(_ >= batchId)) ()
        else if (SnapshotStore.currentVersion(root).isEmpty)
          SnapshotStore.overwrite(batch, root, partCol, txn = Some(appId -> batchId))
        else
          SnapshotStore.append(batch, root, partCol, txn = Some(appId -> batchId))
      } finally { batch.unpersist(); () }
    }

  def mergeBatch(root: String, keyCol: String, partCol: String,
                 appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      // Pin + full count first — see appendBatch (state-store commit
      // validation + one scan for the commit path's several actions).
      batch.persist()
      try {
      if (batch.count() == 0L) {
        // Empty micro-batches are routine (no new offsets in the trigger
        // window). Publishing one is worse than pointless: an empty FIRST
        // batch would bootstrap a zero-file table via a partitioned write
        // that emits no parquet at all. Skip — replay of a skipped empty
        // batch is trivially idempotent, so no txn marker is needed.
        ()
      } else if (SnapshotStore.lastTxn(root, appId).exists(_ >= batchId)) {
        // Replayed batch (restart raced the checkpoint): already
        // published — the no-op IS the exactly-once guarantee.
        ()
      } else if (SnapshotStore.currentVersion(root).isEmpty) {
        // First batch bootstraps the table (partitioned, so merges work).
        SnapshotStore.overwrite(batch, root, Some(partCol),
          txn = Some(appId -> batchId))
      } else {
        SnapshotStore.merge(batch.sparkSession, root, batch, keyCol, partCol,
          txn = Some(appId -> batchId))
      }
      } finally { batch.unpersist(); () }
    }
}
