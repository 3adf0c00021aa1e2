package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection (median / MAD): flag values more
  * than k median-absolute-deviations from the group median — the
  * data-cleaning filter that survives the outliers it hunts (mean/stddev
  * is dragged by them; a median needs >50% contamination to move).
  *
  * Exactness: values are fixed-point (floor(value * 1000) — the same
  * IEEE multiply+floor both engines run), both medians come from
  * [[CorpusOps.groupQuantiles]]'s histogram method (lower-discrete
  * semantics, shuffles move histograms, never event rows), and the flag
  * is the integer compare dev > k * MAD — so the whole classification is
  * hash-checked. Scale shape: two histogram passes + two group-keyed
  * joins of group-sized stat tables back onto the events.
  */
object Outliers {

  /** Per-event robust flags over (event_id, user_id, value).
    * Output: (event_id, user_id, v, med, mad, is_outlier). */
  def robustOutliers(events: DataFrame, k: Long = 5L): DataFrame = {
    // NULL values carry no deviation signal and would diverge from the
    // oracle (groupQuantiles drops them from the medians but the final
    // flag join would keep them) — exclude them from the row set outright,
    // mirrored by WHERE value IS NOT NULL in [[robustOutliersSql]]
    val ev = events.filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 1000).cast("long").as("v"))
    val med = CorpusOps.groupQuantiles(ev, "v", "user_id", Seq(50))
      .select(col("user_id"), col("qval").as("med"))
    // two consumers (MAD histogram + final flags): materialize once
    val withMed = ev.join(med, "user_id")
      .withColumn("dev", abs(col("v") - col("med")))
      .localCheckpoint(false)
    val mad = CorpusOps.groupQuantiles(withMed, "dev", "user_id", Seq(50))
      .select(col("user_id"), col("qval").as("mad"))
    withMed.join(mad, "user_id")
      .select(col("event_id"), col("user_id"), col("v"), col("med"), col("mad"),
        when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L).as("is_outlier"))
  }

  /** Sampled quantiles — the scale path for CONTINUOUS-valued quantiles,
    * where [[CorpusOps.groupQuantiles]]'s exact histogram needs bounded
    * distinct-value cardinality: a deterministic multiplicative-hash
    * sample (rate = keep/DrawP, a pure function of the row id — the same
    * portable draw as stratifiedSample) followed by the exact
    * lower-discrete quantile OF THE SAMPLE. Deterministic end to end, so
    * the whole approximate operator hash-checks; its closeness to the
    * exact quantiles is probabilistic and pinned by OutliersSpec.
    * `keep` of DrawP = 2^31-1, e.g. keep = DrawP/20 samples ~5%. */
  def sampledQuantiles(events: DataFrame, keep: Long, pcts: Seq[Int]): DataFrame = {
    val drawP = 2147483647L
    val draw = pmod(pmod(col("event_id"), lit(drawP)) * lit(2654435761L), lit(drawP))
    val sampled = events
      .filter(col("value").isNotNull) // mirrored in [[sampledQuantilesSql]]
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 1000).cast("long").as("v"))
      .filter(draw < keep)
    CorpusOps.groupQuantiles(sampled, "v", "user_id", pcts)
  }

  /** DuckDB replica of [[sampledQuantiles]]. */
  def sampledQuantilesSql(keep: Long, pcts: Seq[Int]): String = {
    val values = pcts.map(p => s"($p)").mkString(", ")
    s"""WITH ev AS (SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v FROM events
       |   WHERE value IS NOT NULL
       |     AND ((event_id % 2147483647) * 2654435761) % 2147483647 < $keep),
       | hist AS (SELECT user_id AS grp, v, count(*) AS cnt FROM ev GROUP BY 1, 2),
       | c AS (SELECT grp, v, cnt,
       |   SUM(cnt) OVER (PARTITION BY grp ORDER BY v
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |   SUM(cnt) OVER (PARTITION BY grp) AS n FROM hist),
       | q(pct) AS (VALUES $values)
       | SELECT grp AS user_id, CAST(pct AS BIGINT) AS pct, CAST(v AS BIGINT) AS qval
       | FROM c, q
       | WHERE cum >= (pct * n + 99) // 100 AND cum - cnt < (pct * n + 99) // 100"""
      .stripMargin.replace("\n", " ")
  }

  /** One lower-discrete-median CTE pair over (grp, value) rows — the SQL
    * twin of the histogram+window method in [[CorpusOps.groupQuantiles]]. */
  private def medianCtes(tag: String, src: String, valueExpr: String): String =
    s"""h$tag AS (SELECT user_id AS grp, $valueExpr AS v, count(*) AS cnt FROM $src GROUP BY 1, 2),
       | c$tag AS (SELECT grp, v, cnt,
       |   SUM(cnt) OVER (PARTITION BY grp ORDER BY v
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |   SUM(cnt) OVER (PARTITION BY grp) AS n FROM h$tag),
       | m$tag AS (SELECT grp AS user_id, CAST(v AS BIGINT) AS q FROM c$tag
       |   WHERE cum >= (50 * n + 99) // 100 AND cum - cnt < (50 * n + 99) // 100)"""
      .stripMargin.replace("\n", " ")

  /** DuckDB replica of [[robustOutliers]] over the events table. */
  def robustOutliersSql(k: Long = 5L): String =
    s"""WITH ev AS (SELECT event_id, user_id, CAST(floor(value * 1000) AS BIGINT) AS v FROM events
       |   WHERE value IS NOT NULL),
       | ${medianCtes("1", "ev", "v")},
       | wm AS (SELECT e.event_id, e.user_id, e.v, m.q AS med, abs(e.v - m.q) AS dev
       |   FROM ev e JOIN m1 m USING (user_id)),
       | ${medianCtes("2", "wm", "dev")}
       | SELECT wm.event_id, wm.user_id, wm.v, wm.med, d.q AS mad,
       |   CAST(CASE WHEN wm.dev > $k * d.q THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
       | FROM wm JOIN m2 d USING (user_id)""".stripMargin.replace("\n", " ")
}
