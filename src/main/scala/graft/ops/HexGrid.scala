package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** H3-style hexagonal binning (flat planar variant): points land in
  * pointy-top hexagons of edge [[SizeDeg]] via the standard axial
  * transform + cube rounding (Uber H3 and the common hex-grid literature
  * use exactly this rounding to resolve fractional axial coordinates to
  * the containing cell). Hex cells, unlike squares, have uniform
  * center-to-center distance to all 6 neighbors — the reason H3 wins for
  * density surfaces and movement analytics; this operator provides the
  * binning/aggregation layer of that stack on the same engine paths the
  * quadtree/geohash/quadkey cells use.
  *
  * Determinism: the transform is ~20 IEEE ops (mul/add/div/floor/abs/
  * compare) in a FIXED sequence; the irrational constants are computed
  * once here and embedded as shortest-round-trip literals in the oracle
  * SQL, so both engines see bit-identical doubles end to end and the
  * branchy cube rounding takes identical branches. `floor(x + 0.5)`
  * replaces `round` (Spark HALF_UP vs DuckDB half-away semantics differ;
  * floor has one semantics).
  *
  * Scale shape: cell assignment is pure codegen column math (no UDF, no
  * shuffle); the density rollup is one map-side-combined groupBy on the
  * (hq, hr) key — the same single-exchange profile as q17's square-cell
  * counts.
  */
object HexGrid {

  /** Hex edge length in degrees. */
  val SizeDeg = 2.5
  /** sqrt(3)/3 and 2/3, computed once; the SQL side embeds these exact
    * doubles via shortest-round-trip printing. */
  val C1: Double = math.sqrt(3.0) / 3.0
  val C3: Double = 1.0 / 3.0
  val C2: Double = 2.0 / 3.0

  /** Axial (hq, hr) of a lon/lat point — both BIGINT columns. */
  def hexCell(lon: Column, lat: Column): (Column, Column) = {
    val qf = (lon * C1 - lat * C3) / SizeDeg
    val rf = lat * C2 / SizeDeg
    val xf = qf
    val zf = rf
    val yf = -qf - rf
    val rx = floor(xf + 0.5)
    val ry = floor(yf + 0.5)
    val rz = floor(zf + 0.5)
    val dx = abs(rx - xf)
    val dy = abs(ry - yf)
    val dz = abs(rz - zf)
    val hq = when(dx > dy && dx > dz, -ry - rz).otherwise(rx)
    val hr = when(dx > dy && dx > dz, rz)
      .otherwise(when(dy > dz, rz).otherwise(-rx - ry))
    (hq.cast("long"), hr.cast("long"))
  }

  /** Per-hex-cell density: (hq, hr, n) — the hex analog of q17. */
  def hexCounts(points: DataFrame, lonCol: String, latCol: String): DataFrame = {
    val (hq, hr) = hexCell(col(lonCol), col(latCol))
    points.select(hq.as("hq"), hr.as("hr"))
      .groupBy("hq", "hr").agg(count(lit(1)).as("n"))
  }

  /** DuckDB replica over the `ents` CTE (alias `e`) with its lattice
    * coordinate expressions — same constants (exact double literals),
    * same op order, same floor(+0.5) rounding, same branch structure. */
  def hexCountsSql(entsCte: String, lonExpr: String, latExpr: String): String =
    s"""WITH $entsCte,
       | hp AS (SELECT ($lonExpr * $C1 - $latExpr * $C3) / $SizeDeg AS xf,
       |    $latExpr * $C2 / $SizeDeg AS zf FROM ents e),
       | cube AS (SELECT xf, zf, -xf - zf AS yf,
       |    floor(xf + 0.5) AS rx, floor(-xf - zf + 0.5) AS ry,
       |    floor(zf + 0.5) AS rz FROM hp),
       | cell AS (SELECT
       |    CASE WHEN abs(rx - xf) > abs(ry - yf) AND abs(rx - xf) > abs(rz - zf)
       |      THEN -ry - rz ELSE rx END AS hqf,
       |    CASE WHEN abs(rx - xf) > abs(ry - yf) AND abs(rx - xf) > abs(rz - zf)
       |      THEN rz
       |      ELSE CASE WHEN abs(ry - yf) > abs(rz - zf) THEN rz ELSE -rx - ry END
       |    END AS hrf FROM cube)
       | SELECT CAST(hqf AS BIGINT) AS hq, CAST(hrf AS BIGINT) AS hr, count(*) AS n
       | FROM cell GROUP BY 1, 2"""
      .stripMargin.replace("\n", " ")
}
