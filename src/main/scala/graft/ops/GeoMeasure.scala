package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geometry measurement over grouped point sequences — the ST_MakeLine +
  * ST_Length pair: each group's points, ordered by a sequence column, form
  * a polyline whose planar length is reported in scaled integer units.
  *
  * Determinism across engines: the per-segment math is `floor(sqrt(dx²+dy²)
  * · 1e6)` with a FIXED op sequence. `-`, `*`, `+` and `sqrt` are all
  * correctly-rounded IEEE 754 ops, so on bit-identical inputs (the /20
  * coordinate lattice both engines derive with the same expression) every
  * intermediate double is bit-identical, the floor is exact, and the BIGINT
  * sum is order-independent — the full output hash-checks. (This is the
  * reason for planar-not-haversine: sin/cos have no cross-engine bit
  * contract; sqrt does.)
  *
  * Scale shape: ONE hash exchange on the group key serves both the lag
  * window and the final groupBy (the aggregation reuses the window's
  * partitioning — no second exchange), and the shuffled rows carry only
  * (key, seq, lon, lat). Group size bounds a task exactly as in
  * [[Sessionize]]; the same bucketed two-level pattern applies if a single
  * polyline ever holds ~10^8 vertices.
  */
object GeoMeasure {

  /** Integer length unit: 1e-6 degrees. */
  val ScaleU = 1000000.0

  /** @param pts    rows of (`keyCol`, `seqCol`, `lonCol`, `latCol`)
    * @return (`keyCol`, n_points, len_u): vertex count and polyline length
    *         in floor-scaled 1e-6-degree units, both BIGINT */
  def trackLength(pts: DataFrame, keyCol: String = "url", seqCol: String = "ent_idx",
                  lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
    val dx = col(lonCol) - lag(col(lonCol), 1).over(w)
    val dy = col(latCol) - lag(col(latCol), 1).over(w)
    pts
      .withColumn("_seg", floor(sqrt(dx * dx + dy * dy) * ScaleU))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_points"),
        coalesce(sum(col("_seg")), lit(0L)).as("len_u"))
  }

  /** q126 gap threshold: squared lattice distance (1000 units = 50 deg). */
  val GapD2 = 1000000L

  /** Trajectory gap segmentation (the GPS-track splitting op, applied to
    * per-page geo-entity trails): within each group ordered by `seqCol`,
    * a new segment starts where the squared lattice jump from the
    * previous point exceeds `threshold` — gaps-and-islands on SPATIAL
    * jumps, the spatial sibling of [[Sessionize]]'s time gaps. Output one
    * row per (key, segment): point count and the seq range. All-BIGINT
    * (exact lonm/latm deltas), so it hash-checks.
    *
    * Scale shape: ONE hash exchange on the group key serves the lag
    * window, the running-sum window, AND the final (key, seg) groupBy —
    * HashPartitioning(key) satisfies the ClusteredDistribution(key, seg)
    * the aggregate requires, so Catalyst inserts no second exchange. */
  def trailSegments(pts: DataFrame, keyCol: String = "url",
                    seqCol: String = "ent_idx",
                    threshold: Long = GapD2): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
    val dx = col("lonm") - lag(col("lonm"), 1).over(w)
    val dy = col("latm") - lag(col("latm"), 1).over(w)
    // explicit ROWS frame: matches the oracle's frame exactly (the unique
    // (key, seq) ordering already makes the sum deterministic)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("_gap",
        when(lag(col("lonm"), 1).over(w).isNull, 0L)
          .when(dx * dx + dy * dy > threshold, 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("_gap")).over(run))
      .groupBy(col(keyCol), col("seg"))
      .agg(count(lit(1)).as("n_pts"),
        min(col(seqCol)).cast("long").as("start_idx"),
        max(col(seqCol)).cast("long").as("end_idx"))
  }

  /** DuckDB replica of [[trailSegments]]: same lag + running-sum windows,
    * same integer threshold. */
  def trailSegmentsSql(entsCte: String, threshold: Long = GapD2): String =
    s"""WITH $entsCte,
       | pt AS (SELECT url, ent_idx, lonm, latm FROM ents e),
       | g AS (SELECT url, ent_idx,
       |     CASE WHEN lag(lonm) OVER w IS NULL THEN 0
       |          WHEN (lonm - lag(lonm) OVER w) * (lonm - lag(lonm) OVER w)
       |             + (latm - lag(latm) OVER w) * (latm - lag(latm) OVER w)
       |             > $threshold THEN 1 ELSE 0 END AS gap
       |   FROM pt WINDOW w AS (PARTITION BY url ORDER BY ent_idx)),
       | s AS (SELECT url, ent_idx, sum(gap) OVER (PARTITION BY url
       |     ORDER BY ent_idx ROWS UNBOUNDED PRECEDING) AS seg FROM g)
       | SELECT url, CAST(seg AS BIGINT) AS seg, count(*) AS n_pts,
       |   CAST(min(ent_idx) AS BIGINT) AS start_idx,
       |   CAST(max(ent_idx) AS BIGINT) AS end_idx
       | FROM s GROUP BY 1, 2"""
      .stripMargin.replace("\n", " ")

  /** DuckDB replica over a CTE chain providing `ents` with the lattice
    * coordinate expressions (`lonExpr`/`latExpr` reference alias `e`) —
    * same lag window, same op sequence, same floor/scale. */
  def trackLengthSql(entsCte: String, lonExpr: String, latExpr: String): String =
    s"""WITH $entsCte,
       | pt AS (SELECT url, ent_idx, $lonExpr AS lon, $latExpr AS lat FROM ents e),
       | seg AS (SELECT url,
       |     CAST(floor(sqrt((lon - lag(lon) OVER w) * (lon - lag(lon) OVER w)
       |       + (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)) * $ScaleU) AS BIGINT) AS s
       |   FROM pt WINDOW w AS (PARTITION BY url ORDER BY ent_idx))
       | SELECT url, count(*) AS n_points, CAST(COALESCE(sum(s), 0) AS BIGINT) AS len_u
       | FROM seg GROUP BY url"""
      .stripMargin.replace("\n", " ")
}
