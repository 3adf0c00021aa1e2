package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the standard clickstream
  * primitive (a "session" = a maximal run of a user's events with no gap
  * longer than `gapUs` between consecutive ones).
  *
  * Shape: lag + running-sum windows, both over the SAME
  * `partitionBy(user) orderBy(time, id)` spec, so Catalyst plans ONE
  * exchange + one sort and evaluates both window functions in a single
  * Window operator (verified by SessionizeSpec's plan assertion). The
  * session rollup then partial-aggregates map-side. At 100 TB the
  * parallelism unit is the user key — hundreds of millions of users spread
  * over the shuffle; one pathological user bounds a single task the same
  * way it does in every engine's sessionizer (if that user is known-hot,
  * pre-split by a coarse time bucket first — [[AsofJoin.asofBucketed]]
  * shows the carry pattern).
  *
  * Time math is integer microseconds (`unix_micros`) end to end; the
  * DuckDB oracle mirrors it with `epoch_us`, so the hash compare is exact.
  * The (time, id) ordering key is unique per user, which keeps the
  * RANGE-frame running sum deterministic on both engines.
  */
object Sessionize {

  /** Default inactivity gap: 6 hours, in microseconds. */
  val DefaultGapUs: Long = 6L * 3600 * 1000000

  /** Per-session rollup: (user_id, sess_idx, n_events, start_us, dur_us).
    * `sess_idx` is the user's 1-based session number in time order.
    * Input needs (user_id, event_id, ts: timestamp). */
  def sessionize(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    // explicit ROWS frame: the default RANGE frame rejects the two-column
    // ordering key (which is what makes the running sum deterministic)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // parquet holds TIMESTAMP_NTZ; all graft sessions pin UTC, so the
      // cast + unix_micros equals DuckDB's epoch_us over the naive value
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("new_sess",
        when(col("tus") - lag("tus", 1).over(w) <= gapUs, 0L).otherwise(1L))
      .withColumn("sess_idx", sum("new_sess").over(wRun))
      .groupBy("user_id", "sess_idx")
      .agg(count(lit(1)).as("n_events"),
        min("tus").as("start_us"),
        (max("tus") - min("tus")).as("dur_us"))
  }

  /** DuckDB replica of [[sessionize]] over the events table. */
  def sessionizeSql(gapUs: Long = DefaultGapUs): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
       | m AS (SELECT user_id, event_id, tus,
       |   CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) <= $gapUs
       |        THEN 0 ELSE 1 END AS new_sess FROM e),
       | s AS (SELECT user_id, tus,
       |   sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx FROM m)
       | SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx, count(*) AS n_events,
       |   CAST(min(tus) AS BIGINT) AS start_us, CAST(max(tus) - min(tus) AS BIGINT) AS dur_us
       | FROM s GROUP BY user_id, sess_idx""".stripMargin.replace("\n", " ")
}
