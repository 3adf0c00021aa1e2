package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Areal interpolation (Tobler's pycnophylactic reaggregation, the
  * PostGIS `ST_Intersection`-weights workflow): transfer a count surface
  * from one zoning (60x28 source cells) to a MISALIGNED zoning (45x20
  * target cells) by intersection-area weighting — the census-tract →
  * tile-grid re-basing every atlas pipeline needs.
  *
  * Exactness: both grids are lattice-aligned rectangles (source cell
  * 120x100 lattice units, target 160x140), so every intersection area is
  * an exact integer and every source cell has the SAME area (12000).
  * The target value is sum_s n_s * overlap(s,t) / 12000; the query emits
  * the BIGINT numerator `num` and leaves the constant division to the
  * consumer — pycnophylactic mass conservation (sum_t num = 12000 * T)
  * holds exactly and is spec-pinned.
  *
  * Scale shape: ONE map-side-combinable groupBy over the points builds
  * the source surface; each source cell then explodes to the <= 4 target
  * cells it can touch (bounded by the grid-pitch ratio, a config
  * constant) and one bounded-key groupBy sums — at 10^12 points this is
  * scan + one exchange + lattice work, the [[SpatialStats]] shape.
  */
object ArealInterp {

  /** Source pitch (lattice units): 60 x 28 cells over 7200 x 2800. */
  val SrcW = 120L; val SrcH = 100L

  /** Target pitch: 45 x 20 cells. */
  val TgtW = 160L; val TgtH = 140L

  /** Source cell area — the constant denominator. */
  val SrcArea: Long = SrcW * SrcH

  /** @param ents rows with integer lattice (lonm, latm)
    * @return (tx, ty, num): target cell and the exact transfer numerator
    *         (target estimate = num / 12000.0) */
  def toTargetGrid(spark: SparkSession, ents: DataFrame): DataFrame = {
    val src = ents.select(expr(s"lonm div ${SrcW}L").as("sx"),
        expr(s"latm div ${SrcH}L").as("sy"))
      .groupBy("sx", "sy").agg(count(lit(1)).as("n"))
    val withRect = src
      .withColumn("u0", col("sx") * SrcW).withColumn("u1", (col("sx") + 1L) * SrcW)
      .withColumn("v0", col("sy") * SrcH).withColumn("v1", (col("sy") + 1L) * SrcH)
      .withColumn("tx", explode(sequence(
        expr(s"u0 div ${TgtW}L"), expr(s"(u1 - 1) div ${TgtW}L"))))
      .withColumn("ty", explode(sequence(
        expr(s"v0 div ${TgtH}L"), expr(s"(v1 - 1) div ${TgtH}L"))))
    val ox = least(col("u1"), (col("tx") + 1L) * TgtW) - greatest(col("u0"), col("tx") * TgtW)
    val oy = least(col("v1"), (col("ty") + 1L) * TgtH) - greatest(col("v0"), col("ty") * TgtH)
    withRect.select(col("tx"), col("ty"), (col("n") * ox * oy).as("c"))
      .groupBy("tx", "ty").agg(sum("c").as("num"))
  }

  /** DuckDB replica: same grids, same overlap products. */
  def toTargetGridSql(entsCte: String): String =
    s"""WITH $entsCte,
       | src AS (SELECT lonm // $SrcW AS sx, latm // $SrcH AS sy, count(*) AS n
       |   FROM ents e GROUP BY 1, 2),
       | rect AS (SELECT sx * $SrcW AS u0, (sx + 1) * $SrcW AS u1,
       |     sy * $SrcH AS v0, (sy + 1) * $SrcH AS v1, n FROM src),
       | ex AS (SELECT *, unnest(range(u0 // $TgtW, (u1 - 1) // $TgtW + 1)) AS tx FROM rect),
       | exy AS (SELECT *, unnest(range(v0 // $TgtH, (v1 - 1) // $TgtH + 1)) AS ty FROM ex)
       | SELECT tx, ty, CAST(sum(n *
       |     (least(u1, (tx + 1) * $TgtW) - greatest(u0, tx * $TgtW)) *
       |     (least(v1, (ty + 1) * $TgtH) - greatest(v0, ty * $TgtH))) AS BIGINT) AS num
       | FROM exy GROUP BY 1, 2"""
      .stripMargin.replace("\n", " ")
}
