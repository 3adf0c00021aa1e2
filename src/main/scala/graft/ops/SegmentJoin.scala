package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line x line segment-intersection join (the ST_Intersects linework case:
  * road x river crossings, trajectory x boundary clips). The reference's
  * geometry model stops at load-time decoding (popgis `src/utils/geo.rs`
  * builds LineStrings but never joins them); at web scale crossing
  * detection between two 10^9-segment layers must be a partitioned join,
  * never a nested loop.
  *
  * Plan (PBSM, partition-based spatial merge): each segment explodes to
  * the grid cells its bbox covers (cell = [[CellU]] lattice units), the
  * two layers equi-join on the cell key, and each candidate pair is kept
  * only in the LOWEST cell of the two bboxes' overlap —
  * `(max(acx0,bcx0), max(acy0,bcy0))` — the classic duplicate-avoidance
  * reference point, so a pair sharing k cells is emitted exactly once with
  * NO distinct/groupBy dedup pass. Refine is the strict proper-crossing
  * predicate (four integer orientation signs, d1*d2 < 0 and d3*d4 < 0) in
  * pure column math: one shuffle on the cell key end to end, codegen
  * throughout, no UDF.
  *
  * Exactness: endpoints are integer lattice units, orientation cross
  * products stay < 2^26 — exact Long arithmetic on both engines, so the
  * DuckDB oracle (full quadratic scan with the same signs) hash-matches.
  * Semantics note: `properlyCross` is strict interior crossing; endpoint
  * touches and collinear overlaps are excluded BY THE SAME TEST on both
  * sides (consistent cross-engine at any input).
  */
object SegmentJoin {

  /** Grid cell edge in lattice units — segments span ~1-4 cells. */
  val CellU = 16

  // ---- deterministic segment layers (integer endpoints, all >= 0) ----
  def segmentsA(part: DataFrame): DataFrame = {
    val k = col("p_partkey")
    part.select(k.as("a_id"),
      ((k * 131) % 3600).as("ax1"), (lit(16) + (k * 37) % 1400).as("ay1"),
      ((k * 131) % 3600 + 5 + (k % 11) * 3).as("ax2"),
      (lit(16) + (k * 37) % 1400 + (k * 7) % 13 - 6).as("ay2"))
  }
  val segmentsASql: String =
    "(SELECT p_partkey AS a_id, (p_partkey * 131) % 3600 AS ax1," +
      " 16 + (p_partkey * 37) % 1400 AS ay1," +
      " (p_partkey * 131) % 3600 + 5 + (p_partkey % 11) * 3 AS ax2," +
      " 16 + (p_partkey * 37) % 1400 + (p_partkey * 7) % 13 - 6 AS ay2 FROM part)"

  def segmentsB(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    customer.select(k.as("b_id"),
      ((k * 211) % 3600).as("bx1"), (lit(16) + (k * 89) % 1400).as("by1"),
      ((k * 211) % 3600 + (k * 5) % 17 - 8).as("bx2"),
      (lit(16) + (k * 89) % 1400 + 4 + (k % 19)).as("by2"))
  }
  val segmentsBSql: String =
    "(SELECT c_custkey AS b_id, (c_custkey * 211) % 3600 AS bx1," +
      " 16 + (c_custkey * 89) % 1400 AS by1," +
      " (c_custkey * 211) % 3600 + (c_custkey * 5) % 17 - 8 AS bx2," +
      " 16 + (c_custkey * 89) % 1400 + 4 + (c_custkey % 19) AS by2 FROM customer)"

  private def cellOf(c: Column): Column = floor(c / CellU.toDouble).cast("long")
  private def sgn(c: Column): Column = when(c > 0, 1L).when(c < 0, -1L).otherwise(0L)
  private def orient(ax: Column, ay: Column, bx: Column, by: Column,
                     px: Column, py: Column): Column =
    sgn((bx - ax) * (py - ay) - (by - ay) * (px - ax))

  /** (a_id, b_id) pairs of properly crossing segments; each pair exactly
    * once (reference-point dedup, no distinct). */
  def join(a: DataFrame, b: DataFrame): DataFrame = {
    def withCells(df: DataFrame, x1: String, y1: String, x2: String, y2: String,
                  p: String): DataFrame =
      df.withColumn(p + "cx0", cellOf(least(col(x1), col(x2))))
        .withColumn(p + "cx1", cellOf(greatest(col(x1), col(x2))))
        .withColumn(p + "cy0", cellOf(least(col(y1), col(y2))))
        .withColumn(p + "cy1", cellOf(greatest(col(y1), col(y2))))
        .withColumn("cx", explode(sequence(col(p + "cx0"), col(p + "cx1"))))
        .withColumn("cy", explode(sequence(col(p + "cy0"), col(p + "cy1"))))
    val ac = withCells(a, "ax1", "ay1", "ax2", "ay2", "a")
    val bc = withCells(b, "bx1", "by1", "bx2", "by2", "b")
    val d1 = orient(col("ax1"), col("ay1"), col("ax2"), col("ay2"), col("bx1"), col("by1"))
    val d2 = orient(col("ax1"), col("ay1"), col("ax2"), col("ay2"), col("bx2"), col("by2"))
    val d3 = orient(col("bx1"), col("by1"), col("bx2"), col("by2"), col("ax1"), col("ay1"))
    val d4 = orient(col("bx1"), col("by1"), col("bx2"), col("by2"), col("ax2"), col("ay2"))
    ac.join(bc, Seq("cx", "cy"))
      .where(col("cx") === greatest(col("acx0"), col("bcx0")) &&
        col("cy") === greatest(col("acy0"), col("bcy0")))
      .where(d1 * d2 < 0 && d3 * d4 < 0)
      .select("a_id", "b_id")
  }

  /** DuckDB replica: full quadratic scan, identical orientation signs. */
  def joinSql: String = {
    def o(px: String, py: String, sa: String, sb: String): String =
      s"sign((${sa}2 - ${sa}1) * ($py - ${sb}1) - (${sb}2 - ${sb}1) * ($px - ${sa}1))"
    val d1 = o("bx1", "by1", "ax", "ay")
    val d2 = o("bx2", "by2", "ax", "ay")
    val d3 = o("ax1", "ay1", "bx", "by")
    val d4 = o("ax2", "ay2", "bx", "by")
    s"""SELECT a_id, b_id FROM $segmentsASql a CROSS JOIN $segmentsBSql b
       | WHERE $d1 * $d2 < 0 AND $d3 * $d4 < 0""".stripMargin.replace("\n", " ")
  }
}
