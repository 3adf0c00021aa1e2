package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the continuous counterpart of the batch
  * as-of/range joins ([[graft.ops.AsofJoin]], [[graft.ops.RangeJoin]]):
  * each click matched to the same user's views in the trailing `lookback`
  * window.
  *
  * This is the one Structured Streaming join shape that needs BOTH sides
  * stateful, and the two things that make it survive an unbounded run are
  * in the join condition itself: the equality on `user_id` keys the state
  * store, and the event-time range (`v.ts BETWEEN c.ts - lookback AND
  * c.ts`) is what lets Spark derive a state-cleanup watermark for each
  * side — without it both state stores grow forever and the join is
  * rejected in append mode. Inner matches emit as they arrive; rows older
  * than watermark + lookback are evicted from state.
  *
  * StreamJoinSpec replays the events table through both this and the
  * identical batch join and asserts row parity.
  */
object StreamJoin {

  /** @param clicks   streaming frame (event_id, user_id, ts)
    * @param views    streaming frame (view_id, user_id, ts)
    * @param lookback how far back a view may precede the click
    * @param watermark max event-time disorder tolerated on both sides */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
                    lookback: String = "1 hour",
                    watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val v = views.select(col("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark).alias("v")
    c.join(v,
      col("c.user_id") === col("v.v_user_id") &&
        col("v.v_ts") >= col("c.ts") - expr(s"INTERVAL $lookback") &&
        col("v.v_ts") <= col("c.ts"))
      .select(col("c.event_id"), col("c.user_id"), col("v.view_id"))
  }
}
