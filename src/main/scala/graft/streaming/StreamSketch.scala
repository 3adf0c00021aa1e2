package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Sketches under Structured Streaming: a watermarked windowed aggregation
  * whose aggregate IS the mergeable count-min sketch ([[Sketches.cms]],
  * a TypedImperativeAggregate — partials serialize into the state store
  * and merge across micro-batches). Streaming state per window is ONE
  * depth x width counter array, regardless of key cardinality — the
  * reason sketches exist at this scale: an exact per-key windowed count
  * holds every key in state; this holds 1 KB. Watermark closes windows
  * and evicts their state. Batch/stream parity (identical arrays, because
  * counter sums are order-independent) is pinned by StreamSketchSpec.
  */
object StreamSketch {

  /** Per-event-time-window CMS over a keyed stream (`ts`, `key` BIGINT).
    * Output: (window, cms array<bigint>). */
  def windowedCms(keyed: DataFrame, windowLen: String = "10 minutes",
                  watermark: String = "1 hour",
                  depth: Int = 4, width: Int = 256): DataFrame =
    keyed
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(Sketches.cms(col("key"), lit(1L), depth, width).as("cms"))
      .select(col("w.start").as("win_start"), col("cms"))
}
