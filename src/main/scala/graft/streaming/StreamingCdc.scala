package graft.streaming

import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous CDC ingest — the streaming face of `EventOps.cdcUpsert`
  * (reference analogue: the payments services consuming a Kafka changelog
  * and maintaining materialized state, `PaymentsService.java` consume
  * loop; re-expressed as Structured Streaming + per-micro-batch MERGE,
  * which is exactly how lakehouse CDC ingest ships in production:
  * `foreachBatch` + MERGE INTO).
  *
  * Each micro-batch of the change stream is folded into the parquet
  * snapshot with [[EventOps.cdcApplyChanges]]. Because the snapshot
  * retains delete tombstones with their (ts_us, event_id) ordering
  * tuple, the fold is ORDER-INSENSITIVE across batches — late batches
  * carrying older changes lose the per-key comparison instead of
  * clobbering newer state, so the final snapshot equals the one-shot
  * batch MERGE over the full changelog regardless of how the stream
  * was micro-batched (spec-asserted; the batch twin
  * `cdc_upsert_incremental` proves the same property against the
  * DuckDB oracle).
  *
  * Write protocol: the next snapshot generation is written to a sibling
  * `__next` dir and published via [[graft.sources.SnapshotSwap]] —
  * retire-then-swap with `_SUCCESS`-gated recovery, so every crash
  * window leaves a complete generation on disk and a restart resumes
  * instead of silently re-initializing (a real deployment gets this
  * from a table format's commit protocol — Delta/Iceberg).
  *
  * Scale shape per batch: one delta-sized window + one key-partitioned
  * full-outer join against the snapshot — MERGE's irreducible cost.
  * Snapshot file count is re-bounded every batch by `numFiles`
  * (unbounded growth in file count, not bytes, is what kills
  * long-running ingest).
  */
object StreamingCdc {

  /** Initialize `snapshotDir` from a base table if it does not exist
    * (after repairing any interrupted publish — an existing snapshot
    * must NEVER be silently re-initialized: the streaming checkpoint
    * already marks merged batches committed, so re-init would lose them
    * without error).
    */
  def initSnapshot(spark: SparkSession, base: DataFrame, snapshotDir: String,
                   numFiles: Int = 8): Unit =
    if (!graft.sources.SnapshotSwap.recover(spark, snapshotDir)) {
      EventOps.cdcInitSnapshot(base).repartition(numFiles)
        .write.parquet(graft.sources.SnapshotSwap.nextPath(snapshotDir))
      graft.sources.SnapshotSwap.publish(spark, snapshotDir)
    }

  /** Merge ONE changelog slice into the on-disk snapshot (the foreachBatch
    * body, callable directly for deterministic tests). The swap is the
    * crash-safe [[graft.sources.SnapshotSwap]] publish — every crash
    * window leaves a complete generation recoverable on restart.
    */
  def mergeBatch(spark: SparkSession, changes: DataFrame, snapshotDir: String,
                 numFiles: Int = 8): Unit = {
    if (changes.isEmpty) return
    graft.sources.SnapshotSwap.recover(spark, snapshotDir)
    val next = EventOps.cdcApplyChanges(spark.read.parquet(snapshotDir), changes)
    next.repartition(numFiles).write.mode("overwrite")
      .parquet(graft.sources.SnapshotSwap.nextPath(snapshotDir))
    graft.sources.SnapshotSwap.publish(spark, snapshotDir)
  }

  /** The queryable state: tombstones hidden, one-shot-MERGE columns. */
  def currentView(spark: SparkSession, snapshotDir: String): DataFrame = {
    graft.sources.SnapshotSwap.recover(spark, snapshotDir)
    EventOps.cdcCurrentView(spark.read.parquet(snapshotDir))
  }

  /** Wire a change stream (events schema) into a continuously merged
    * snapshot. `changes` must be a STREAMING DataFrame with the events
    * columns (event_id, ts, user_id, event_type, value).
    */
  def cdcSink(spark: SparkSession, changes: DataFrame, base: DataFrame,
              snapshotDir: String, checkpointDir: String,
              numFiles: Int = 8): StreamingQuery = {
    initSnapshot(spark, base, snapshotDir, numFiles)
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(spark, batch, snapshotDir, numFiles)
      }
      .start()
  }
}
