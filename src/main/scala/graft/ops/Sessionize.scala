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
  * The (time, id) ordering key is unique per user, which is what makes the
  * running sum deterministic on both engines; the sum itself uses an
  * explicit ROWS frame (the default RANGE frame rejects a two-column
  * ordering key).
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

  /** Skew-safe sessionization — identical output contract to [[sessionize]],
    * but every per-event window partitions on (user, coarse-time-bucket)
    * instead of user alone, so one pathological user (the hot key that
    * serializes a [[sessionize]] task) parallelizes over `nBuckets`
    * partitions — the sessionizer analog of [[AsofJoin.asofBucketed]].
    *
    * Buckets partition the time axis, so within a user every event of
    * bucket b precedes every event of bucket b+1; the two window results
    * that [[sessionize]] computes globally are then recoverable from
    * within-bucket windows plus per-(user, bucket) summaries:
    *  1. the lag (previous event time) of a bucket's FIRST events is the
    *     max event time of the user's earlier buckets — a map-side-
    *     combinable max, prefix-expanded over the <= nBuckets summary rows
    *     per user and equi-joined back (never a row-level carry);
    *  2. the running session count splits into the within-bucket ROWS-frame
    *     running sum plus a per-(user, bucket) offset — the prefix sum of
    *     earlier buckets' new-session totals (a two-level prefix sum, the
    *     [[CorpusOps.packShards]] pattern applied to session ordinals).
    * The session rollup itself is a groupBy — partial aggregation absorbs
    * the hot user there regardless of bucketing.
    *
    * The windows over the per-(user, bucket) SUMMARY table partition on
    * user alone, but carry <= nBuckets rows per user — bounded work per
    * key by construction. Bucket bounds come from one min/max pass (pass
    * `tsRange` in microseconds to skip it when known). Falls back to
    * [[sessionize]] when the time axis has zero width.
    *
    * SessionizeSpec pins hash-equality to [[sessionize]] on the events
    * fixture AND on a planted pathological user, plus the plan shape
    * (every event-level window partitioned by (user_id, bucket)). */
  def sessionizeBucketed(events: DataFrame, gapUs: Long = DefaultGapUs,
                         nBuckets: Int = 8,
                         tsRange: Option[(Long, Long)] = None): DataFrame = {
    val ev0 = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("tus"))
    val (lo, hi) = tsRange.getOrElse {
      val mm = ev0.agg(min("tus"), max("tus")).head()
      if (mm.isNullAt(0)) return sessionize(events, gapUs)
      (mm.getLong(0), mm.getLong(1))
    }
    if (hi <= lo) return sessionize(events, gapUs) // zero width: nothing to split
    // integer bucket of the tus axis; +1 keeps hi inside the last bucket
    val ev = ev0.withColumn("_b",
      (((col("tus") - lo) * nBuckets) / (hi - lo + 1)).cast("int"))

    val w = Window.partitionBy("user_id", "_b").orderBy("tus", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(user, bucket) summary: latest event time (the carry for the next
    // bucket's first lag). <= nBuckets rows per user from here on.
    val bmax = ev.groupBy("user_id", "_b").agg(max("tus").as("_bmax"))
    val wPrev = Window.partitionBy("user_id").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bmax.withColumn("_carry", max("_bmax").over(wPrev)).drop("_bmax")

    // materialized once for its two consumers (bucket totals + final join):
    // the scan->join->window chain would otherwise run twice
    val flagged = ev.join(carry, Seq("user_id", "_b"), "left")
      .withColumn("_prev", coalesce(lag("tus", 1).over(w), col("_carry")))
      .withColumn("new_sess",
        when(col("tus") - col("_prev") <= gapUs, 0L).otherwise(1L))
      .withColumn("_run", sum("new_sess").over(wRun))
      .localCheckpoint(false)
    // bucket offsets: prefix sum of earlier buckets' new-session totals
    val btot = flagged.groupBy("user_id", "_b").agg(sum("new_sess").as("_btot"))
    val offs = btot.withColumn("_off", coalesce(sum("_btot").over(wPrev), lit(0L)))
      .drop("_btot")
    flagged.join(offs, Seq("user_id", "_b"))
      .withColumn("sess_idx", col("_run") + col("_off"))
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
