package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming MinHash-LSH near-dup detection over a continuous document
  * stream — the streaming counterpart of [[graft.ops.Dedup.minhashPairsProd]]
  * for continuous ingest, where re-running batch LSH over the full corpus
  * per arrival is quadratic in time.
  *
  * Per arriving doc `(doc_id, ts, text)`:
  *  1. the 12-hash MinHash signature is computed STATELESSLY in pure column
  *     math — `array_min(transform(shingles, s -> (xxhash64(s)%P*A_i+B_i)%P))`
  *     per hash i. min over the shingle ARRAY (with duplicates) equals the
  *     batch path's min over DISTINCT (doc, shingle) rows, so signatures are
  *     bit-identical to [[Dedup.minhashPairsProd]]'s — asserted in
  *     StreamingSpec;
  *  2. the signature explodes to its 3 LSH band keys (same band layout as
  *     batch);
  *  3. per band-bucket, keyed state retains recently seen doc ids; each new
  *     doc emits one candidate pair per retained bucket member.
  *
  * State is bounded two ways — the 100 TB streaming requirement:
  *  - event-time timeout: a bucket idle past the watermark is evicted whole;
  *  - `maxPerBucket` cap: a hot bucket (degenerate boilerplate signature)
  *    retains only the newest docs — the streaming analog of the batch
  *    heavy-hitter bucket cap, bounding per-arrival pair fan-out.
  *
  * The same pair can surface from multiple bands (batch runs a global
  * `distinct()`; a stream cannot). Chain
  * `.withWatermark("ts", w).dropDuplicatesWithinWatermark("doc_a", "doc_b")`
  * for at-most-once pair emission within the watermark horizon, or dedup
  * downstream — the parity test distincts on collect.
  */
object StreamDedup {

  final case class BandRow(band: Int, bkey: String, doc_id: Long, ts: java.sql.Timestamp)
  /** (doc_id, arrival millis), newest-last; size <= maxPerBucket. */
  final case class BucketState(docs: List[(Long, Long)])
  final case class CandidatePair(doc_a: Long, doc_b: Long, ts: java.sql.Timestamp)

  /** Stateless signature + band-key explode for a `(doc_id, ts, text)`
    * frame: one output row per (doc, band), columns (band, bkey, doc_id, ts).
    * Docs shorter than 3 tokens have no shingles — no signature, no rows
    * (batch parity). */
  def bandKeys(docs: DataFrame): DataFrame = {
    Dedup.withProdSig(docs, Seq(col("doc_id"), col("ts")))
      .select(col("doc_id"), col("ts"),
        explode(array(Dedup.bandKeyStructs: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"), col("doc_id"), col("ts"))
  }

  /** @param watermark     how late a doc may arrive; also the horizon after
    *                      which an idle bucket's state is evicted
    * @param maxPerBucket  newest docs retained per band-bucket (hot-bucket
    *                      guard; pairs against evicted members are missed —
    *                      by design, same trade as the batch bucket cap) */
  def nearDupPairs(docs: DataFrame, watermark: String = "1 hour",
                   maxPerBucket: Int = 64,
                   evictDelayMs: Long = 3600000L): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    bandKeys(docs)
      .withWatermark("ts", watermark)
      .as[BandRow]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic in-batch order: arrival time, then doc id
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var retained = state.getOption.map(_.docs).getOrElse(Nil)
            val out = Seq.newBuilder[CandidatePair]
            sorted.foreach { r =>
              retained.foreach { case (other, _) =>
                if (other != r.doc_id)
                  out += CandidatePair(math.min(other, r.doc_id),
                    math.max(other, r.doc_id), r.ts)
              }
              retained = (retained :+ (r.doc_id, r.ts.getTime)).takeRight(maxPerBucket)
            }
            state.update(BucketState(retained))
            // evict once the bucket has been idle for evictDelayMs past its
            // newest arrival (timeout must sit beyond the current watermark)
            retained.lastOption.foreach { case (_, newest) =>
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1, newest + evictDelayMs))
            }
            out.result().iterator
          }
      }
  }
}
