package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.table.TableLog

/** Continuous ingest into a [[TableLog]] table: each micro-batch commits
  * as its own bucket snapshot (`batch-<id>`), so the table log records
  * per-batch rows/millis lineage and a crashed stream RESUMES exactly-once:
  * Structured Streaming replays the last uncommitted batch id from its
  * checkpoint, and the bucket write is idempotent (data dir overwritten,
  * then the manifest CAS flips) — a replayed batch id lands on the same
  * bucket name and replaces its own partial output.
  *
  * This is the streaming analog of the reference's bulk load (K1): the
  * same sink discipline, micro-batch-grained instead of whole-file.
  */
object StreamIngest {

  def ingest(stream: DataFrame, table: String, checkpoint: String,
             srid: Int = 4326, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val base = TableLog.current(table).getOrElse(
          TableLog.Snapshot(0L, None, "", srid, "stream", System.currentTimeMillis(), Map.empty))
        if (base.buckets.contains(s"batch-$id")) {
          // replay of a batch whose manifest already committed: skip (the
          // streaming checkpoint lagged the table commit) — exactly-once
          System.err.println(s"[stream-ingest] batch $id already committed, skipping")
        } else {
          TableLog.commitBucket(table, base, s"batch-$id", batch, "stream", srid)
          ()
        }
      }
      .start()
}
