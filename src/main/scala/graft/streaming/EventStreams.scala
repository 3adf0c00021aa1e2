package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The reference has no
  * streaming surface (SURVEY §2a) — this is the Spark-first growth path
  * for continuous ingest: the same declarative ops run on `readStream`
  * (file/kafka sources) and are unit-tested with MemoryStream.
  */
object EventStreams {

  /** Watermarked sliding-window aggregation: late events beyond
    * `watermark` are dropped; state is bounded (the 100 TB streaming
    * requirement — unbounded state is the streaming analog of a skewed
    * shuffle). */
  def windowedStats(events: DataFrame, windowLen: String = "10 minutes",
                    slide: String = "5 minutes", watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total"))

  /** Streaming exact dedup over a `(doc_id, ts, text)` document stream:
    * keep the FIRST occurrence of each content hash; duplicates arriving
    * within the watermark window are dropped and the hash state is evicted
    * once the watermark passes (`dropDuplicatesWithinWatermark`), so state
    * stays bounded — the streaming counterpart of [[graft.ops.Dedup.exact]]
    * for continuous ingest, where a batch-global dedup would mean unbounded
    * state. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .dropDuplicatesWithinWatermark("text_hash")

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n_events: Long, total: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Event-time sessionization with `flatMapGroupsWithState`: a session
    * closes when no event arrives within `gapSeconds` (tracked by event-time
    * timeout against the watermark). Custom keyed state — the reference has
    * nothing like it; this is the KeyValueGroupedDataset state API the
    * north-rule generalization calls for. See [[StreamSessionize]] for the
    * variant with exact output parity to the batch q82 operator (session
    * ordinals, microsecond rollups). */
  def sessionize(events: Dataset[Ev], gapSeconds: Long,
                 watermark: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
                case Some(s) => // gap exceeded within the batch: close, start anew
                  closed ::= Session(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
