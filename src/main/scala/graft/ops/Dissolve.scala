package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dissolve — ST_Union + ST_Area per group, exact. Computes the area of
  * the UNION of each class's axis-aligned integer rectangles (the (u,v)
  * image of the diamond layers, [[OverlayJoin.squaresA]]), counting every
  * overlap exactly once — the aggregation [[OverlayJoin.intersectionArea]]
  * is the pairwise half of.
  *
  * Algorithm (distributed slab sweep):
  *  1. STRIPE: each rectangle explodes to the `StripeU`-wide u-stripes it
  *     crosses and is clipped to each — clipping PARTITIONS area, so
  *     stripes sum without double counting, and the stripe is the
  *     parallelism/skew knob (a world-sized layer fans out to bounded
  *     stripe groups instead of one giant per-class sort).
  *  2. SLAB: within (cls, stripe), the distinct clipped u-boundaries cut
  *     the stripe into slabs (lead window); a rectangle is active in a
  *     slab iff it spans it — an equi-join on (cls, stripe) with a range
  *     predicate inside the bounded group.
  *  3. ISLANDS: within (cls, stripe, slab), the union length of active
  *     v-intervals is gaps-and-islands: ordered by (v0, v1), each row
  *     contributes max(0, v1 - max(v0, running-max-of-previous-v1)) — a
  *     ROWS-frame window, order-insensitive under the (v0, v1) sort.
  *  4. area += slab_width x island contribution; one final groupBy(cls).
  *
  * All coordinates are shifted by `ShiftU` so every value is positive and
  * integer `div` (truncating) equals floor division on both engines; all
  * arithmetic is exact BIGINT, so the per-class union area hash-checks.
  */
object Dissolve {

  /** u-stripe width (80x lattice units). */
  val StripeU = 2048L

  /** Coordinate shift making all u/v positive (|coords| < 2^15 at 80x). */
  val ShiftU = 65536L

  /** @param rects rows of (cls, u0, u1, v0, v1) — integer half-open
    *              rectangles with positive extent
    * @return (cls, n_frags, area_uv): fragment count and exact union area
    *         in squared 80x (u,v) units (xy area = area_uv / 12800) */
  def unionArea(rects: DataFrame): DataFrame = {
    val r = rects.select(col("cls"),
        (col("u0") + ShiftU).as("u0"), (col("u1") + ShiftU).as("u1"),
        (col("v0") + ShiftU).as("v0"), (col("v1") + ShiftU).as("v1"))
      .withColumn("gu", explode(sequence(
        expr(s"u0 div ${StripeU}L"), expr(s"(u1 - 1) div ${StripeU}L"))))
      .select(col("cls"), col("gu"),
        greatest(col("u0"), col("gu") * StripeU).as("cu0"),
        least(col("u1"), (col("gu") + 1L) * StripeU).as("cu1"),
        col("v0"), col("v1"))
    val bounds = r.select(col("cls"), col("gu"),
      explode(array(col("cu0"), col("cu1"))).as("u")).distinct()
    val slabs = bounds
      .withColumn("su1", lead(col("u"), 1).over(
        Window.partitionBy("cls", "gu").orderBy("u")))
      .where(col("su1").isNotNull)
      .select(col("cls"), col("gu"), col("u").as("su0"), col("su1"))
    val active = slabs.join(r, Seq("cls", "gu"))
      .where(col("cu0") <= col("su0") && col("cu1") >= col("su1"))
    val wIsl = Window.partitionBy("cls", "gu", "su0").orderBy("v0", "v1")
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = greatest(lit(0L),
      col("v1") - greatest(col("v0"), coalesce(max(col("v1")).over(wIsl), lit(0L))))
    active
      .withColumn("c", contrib * (col("su1") - col("su0")))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_frags"), sum("c").as("area_uv"))
  }

  /** DuckDB replica: same shift, stripes, slab lead, island windows. */
  def unionAreaSql(rectsSql: String): String =
    s"""WITH rect0 AS (SELECT cls, u0 + $ShiftU AS u0, u1 + $ShiftU AS u1,
       |     v0 + $ShiftU AS v0, v1 + $ShiftU AS v1 FROM $rectsSql x),
       | striped AS (SELECT *, unnest(range(u0 // $StripeU, (u1 - 1) // $StripeU + 1)) AS gu
       |   FROM rect0),
       | r AS (SELECT cls, gu, greatest(u0, gu * $StripeU) AS cu0,
       |     least(u1, (gu + 1) * $StripeU) AS cu1, v0, v1 FROM striped),
       | bounds AS (SELECT DISTINCT cls, gu, u FROM
       |   (SELECT cls, gu, cu0 AS u FROM r UNION ALL SELECT cls, gu, cu1 FROM r)),
       | slabs AS (SELECT cls, gu, u AS su0,
       |     lead(u) OVER (PARTITION BY cls, gu ORDER BY u) AS su1 FROM bounds),
       | active AS (SELECT s.cls, s.gu, s.su0, s.su1, r.v0, r.v1
       |   FROM slabs s JOIN r ON r.cls = s.cls AND r.gu = s.gu
       |   WHERE s.su1 IS NOT NULL AND r.cu0 <= s.su0 AND r.cu1 >= s.su1),
       | seg AS (SELECT cls, su1 - su0 AS w,
       |     greatest(0, v1 - greatest(v0, coalesce(max(v1) OVER (
       |       PARTITION BY cls, gu, su0 ORDER BY v0, v1
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))) AS c
       |   FROM active)
       | SELECT cls, count(*) AS n_frags, CAST(sum(w * c) AS BIGINT) AS area_uv
       | FROM seg GROUP BY cls"""
      .stripMargin.replace("\n", " ")
}
