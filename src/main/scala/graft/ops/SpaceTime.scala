package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Space-time cube trend analysis — the "emerging hot spot" statistic
  * (ArcGIS emerging-hot-spot / Mann-Kendall trend test, Kendall 1975):
  * bucket an event stream into (cell, day) counts, zero-fill each
  * occupied cell's series over the GLOBAL day domain, and compute the
  * exact Mann-Kendall S statistic per cell — S = sum over day pairs
  * i < j of sign(n_j - n_i). S > 0 = intensifying cell, S < 0 =
  * diminishing; the variance normalization (z-score) is a closed-form
  * function of (n_days, tie counts) left to the consumer so the output
  * stays BIGINT/VARCHAR-exact.
  *
  * Event location: the closed-form user home cell (same derived-column
  * discipline as [[LinkGraph.synthEdges]]) — integer-only math
  * `((user_id * 467 + 3) % 7200) * 64 // 7200`, so no float ever enters.
  *
  * Scale shape: ONE map-side-combinable groupBy over the event stream is
  * the only fact-table exchange; everything after (domain scalars,
  * zero-fill explode, day-pair self-join) runs on <= cells x days rows —
  * lattice- and window-bounded regardless of event count. The day-pair
  * join is an equi-join on the cell key with a range predicate inside
  * the bounded group, never a theta join over events. */
object SpaceTime {

  /** Microseconds per day (ts bucketing: integer floor division). */
  val DayUs = 86400000000L

  /** q130 entry: Mann-Kendall S per occupied cell over the events table.
    * Output (cx, cy, n_days, s_stat, trend), BIGINT + VARCHAR. */
  def mannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    // integer `div` end to end — Column./ is double division and would
    // put a float in the op sequence the oracle must mirror exactly
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        expr("(((user_id * 467 + 3) % 7200) * 64) div 7200").as("cx"),
        expr("(((user_id * 911 + 5) % 2800) * 64) div 2800").as("cy"),
        expr(s"unix_micros(CAST(ts AS TIMESTAMP)) div ${DayUs}L").as("day"))
    val cnt = ev.groupBy("cx", "cy", "day").agg(count(lit(1)).as("n"))
    val dom = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val cells = cnt.select("cx", "cy").distinct()
    val grid = Scalars.join(cells, dom)
      .select(col("cx"), col("cy"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(cnt, Seq("cx", "cy", "day"), "left").na.fill(0L, Seq("n"))
    val a = grid.select(col("cx"), col("cy"), col("day").as("di"), col("n").as("ni"))
    val b = grid.select(col("cx"), col("cy"), col("day").as("dj"), col("n").as("nj"))
    val s = a.join(b, Seq("cx", "cy")).filter(col("dj") > col("di"))
      .groupBy("cx", "cy")
      .agg(
        (max("dj") - min("di") + 1).as("n_days"),
        sum(when(col("nj") > col("ni"), 1L)
          .when(col("nj") < col("ni"), -1L).otherwise(0L)).as("s_stat"))
    s.select(col("cx"), col("cy"), col("n_days"), col("s_stat"),
      when(col("s_stat") > 0, "UP").when(col("s_stat") < 0, "DOWN")
        .otherwise("FLAT").as("trend"))
  }

  /** DuckDB replica: same integer cell math, same day bucketing, same
    * zero-filled domain and sign pairs. */
  def mannKendallSql(): String =
    s"""WITH ev AS (SELECT
       |     (((user_id * 467 + 3) % 7200) * 64) // 7200 AS cx,
       |     (((user_id * 911 + 5) % 2800) * 64) // 2800 AS cy,
       |     epoch_us(ts) // $DayUs AS day FROM events),
       | cnt AS (SELECT cx, cy, day, count(*) AS n FROM ev GROUP BY 1, 2, 3),
       | dom AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
       | cells AS (SELECT DISTINCT cx, cy FROM cnt),
       | gridd AS (SELECT cx, cy, unnest(range(d0, d1 + 1)) AS day
       |   FROM cells CROSS JOIN dom),
       | grid AS (SELECT g.cx, g.cy, g.day, coalesce(t.n, 0) AS n
       |   FROM gridd g
       |   LEFT JOIN cnt t ON t.cx = g.cx AND t.cy = g.cy AND t.day = g.day),
       | s AS (SELECT a.cx, a.cy,
       |     max(b.day) - min(a.day) + 1 AS n_days,
       |     sum(CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END) AS s_stat
       |   FROM grid a JOIN grid b ON b.cx = a.cx AND b.cy = a.cy AND b.day > a.day
       |   GROUP BY 1, 2)
       | SELECT cx, cy, CAST(n_days AS BIGINT) AS n_days,
       |   CAST(s_stat AS BIGINT) AS s_stat,
       |   CASE WHEN s_stat > 0 THEN 'UP' WHEN s_stat < 0 THEN 'DOWN'
       |        ELSE 'FLAT' END AS trend
       | FROM s"""
      .stripMargin.replace("\n", " ")
}
