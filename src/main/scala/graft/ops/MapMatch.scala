package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Map matching — snap each point to its nearest road segment within a
  * radius (the GPS-trace / geocoding primitive; PostGIS users spell it
  * `ST_ClosestPoint` + a lateral kNN). The reference loads linework but
  * never matches against it; at web scale snapping 10^12 points to 10^8
  * segments must be a blocked equi-join + per-point argmin, never a
  * lateral nested loop.
  *
  * Exactness: the squared point-to-segment distance is the rational
  * n/L with L = |b-a|^2 and n the CASE over the three projection zones
  * (before a, past b, interior: n = |p-a|^2 L - dot^2, >= 0 by
  * Cauchy-Schwarz). Candidates compare in 2^-20 fixed point —
  * d2fx = (n << 20) div L — an EXACT integer both engines compute
  * identically (n * 2^20 < 2^55 at lattice scale, no overflow); ties
  * break on segment id, so the argmin is fully deterministic and the
  * output hash-checks.
  *
  * Scale shape: each segment explodes to the grid cells of its
  * R-expanded bbox (dim-side, bounded by segment length / CellU); each
  * point carries ONE cell key — the fact side never amplifies. One hash
  * equi-join on the cell, then a map-side-combinable min(struct) per
  * point. Unmatched points (nothing within R) drop out of the inner
  * join on both engines — same semantics.
  */
object MapMatch {

  /** Grid cell edge in lattice units (matches [[SegmentJoin.CellU]]). */
  val CellU = 16L

  /** Match radius in lattice units (24 u = 1.2 degrees). */
  val Radius = 24L

  /** Fixed-point scale for the rational distance compare. */
  val Scale = 1L << 20

  private def sq(c: Column): Column = c * c

  /** @param pts  rows of (url, ent_idx, lonm, latm) — integer lattice
    * @param segs rows of (a_id, ax1, ay1, ax2, ay2) — integer endpoints,
    *             non-degenerate (L > 0), all coordinates >= 0
    * @return (url, ent_idx, seg_id, d2fx): each point within `Radius` of
    *         some segment, its nearest segment (fixed-point distance,
    *         id tie-break) and the 2^-20-scaled squared distance */
  def snap(pts: DataFrame, segs: DataFrame): DataFrame = {
    // segment -> covered cells of the R-expanded bbox (clamped at 0 so
    // floor/truncate division never disagree across engines)
    val segCells = segs
      .withColumn("cx0", expr(s"greatest(0L, least(ax1, ax2) - ${Radius}L) div ${CellU}L"))
      .withColumn("cx1", expr(s"greatest(0L, greatest(ax1, ax2) + ${Radius}L) div ${CellU}L"))
      .withColumn("cy0", expr(s"greatest(0L, least(ay1, ay2) - ${Radius}L) div ${CellU}L"))
      .withColumn("cy1", expr(s"greatest(0L, greatest(ay1, ay2) + ${Radius}L) div ${CellU}L"))
      .withColumn("cx", explode(sequence(col("cx0"), col("cx1"))))
      .withColumn("cy", explode(sequence(col("cy0"), col("cy1"))))
      .select("a_id", "ax1", "ay1", "ax2", "ay2", "cx", "cy")
    val ptCells = pts.select(col("url"), col("ent_idx").cast("long").as("ent_idx"),
      col("lonm").as("px"), col("latm").as("py"),
      expr(s"lonm div ${CellU}L").as("cx"), expr(s"latm div ${CellU}L").as("cy"))
    val lx = col("ax2") - col("ax1")
    val ly = col("ay2") - col("ay1")
    val bigL = sq(lx) + sq(ly)
    val dot = (col("px") - col("ax1")) * lx + (col("py") - col("ay1")) * ly
    val da = sq(col("px") - col("ax1")) + sq(col("py") - col("ay1"))
    val db = sq(col("px") - col("ax2")) + sq(col("py") - col("ay2"))
    val n = when(dot <= 0L, da * bigL)
      .when(dot >= bigL, db * bigL)
      .otherwise(da * bigL - dot * dot)
    ptCells.join(segCells, Seq("cx", "cy"))
      .withColumn("_n", n).withColumn("_l", bigL)
      .withColumn("d2fx", expr(s"(_n * ${Scale}L) div _l"))
      .where(col("d2fx") <= lit(Radius * Radius * Scale))
      .groupBy("url", "ent_idx")
      .agg(min(struct(col("d2fx").as("d2fx"), col("a_id").cast("long").as("a_id"))).as("m"))
      .select(col("url"), col("ent_idx"),
        col("m.a_id").as("seg_id"), col("m.d2fx").as("d2fx"))
  }

  /** DuckDB replica: quadratic scan (pt x seg), identical projection
    * CASE, identical fixed-point division, row_number argmin with the
    * same (d2fx, id) order. */
  def snapSql(entsCte: String, segsSql: String): String = {
    val lx = "(s.ax2 - s.ax1)"; val ly = "(s.ay2 - s.ay1)"
    val bigL = s"($lx * $lx + $ly * $ly)"
    val dot = s"((p.px - s.ax1) * $lx + (p.py - s.ay1) * $ly)"
    val da = "((p.px - s.ax1) * (p.px - s.ax1) + (p.py - s.ay1) * (p.py - s.ay1))"
    val db = "((p.px - s.ax2) * (p.px - s.ax2) + (p.py - s.ay2) * (p.py - s.ay2))"
    val n = s"(CASE WHEN $dot <= 0 THEN $da * $bigL WHEN $dot >= $bigL THEN $db * $bigL" +
      s" ELSE $da * $bigL - $dot * $dot END)"
    s"""WITH $entsCte,
       | pt AS (SELECT url, ent_idx, lonm AS px, latm AS py FROM ents e),
       | cand AS (SELECT p.url, p.ent_idx, s.a_id,
       |     ($n * $Scale) // $bigL AS d2fx
       |   FROM pt p CROSS JOIN $segsSql s),
       | ranked AS (SELECT url, ent_idx, a_id, d2fx,
       |     row_number() OVER (PARTITION BY url, ent_idx
       |       ORDER BY d2fx, a_id) AS rn
       |   FROM cand WHERE d2fx <= ${Radius * Radius * Scale})
       | SELECT url, CAST(ent_idx AS BIGINT) AS ent_idx,
       |   CAST(a_id AS BIGINT) AS seg_id, CAST(d2fx AS BIGINT) AS d2fx
       | FROM ranked WHERE rn = 1"""
      .stripMargin.replace("\n", " ")
  }
}
