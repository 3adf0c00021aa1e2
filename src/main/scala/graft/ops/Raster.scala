package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector<->raster operators over the 0.05-degree pixel lattice (the same
  * lattice the synthetic points live on, so the layer's boundary-gap
  * guarantee makes every containment verdict float-flip-free).
  *
  * - [[rasterize]] (vector -> raster): burn each polygon into the lattice
  *   pixels whose CENTERS it contains, then roll the pixels up per
  *   slippy-map tile — a distributed polygon rasterizer producing per-tile
  *   coverage counts.
  * - [[zonalStats]] (raster -> vector): aggregate a raster band (closed-form
  *   synthetic values, exact integers) over each polygon's covered pixels —
  *   the classic zonal-statistics reduction.
  *
  * Everything is native column math: candidate pixels come from
  * `sequence()` + `explode` over the polygon's bbox index range (per-row
  * bounded work, no UDF, stays in whole-stage codegen), the diamond
  * containment test is the same |x-cx|+|y-cy| <= r double op sequence the
  * DuckDB oracle runs, and the rollups are ordinary partial-aggregating
  * groupBys. At 100 TB the shape is: explode factor bounded by
  * (2*r*Pitch+1)^2 per polygon (~400 here), shuffle only on the final
  * small (poly, tile) keys.
  */
object Raster {

  /** Pixels per degree: centers at k/Pitch, k integer (0.05-degree pitch). */
  val Pitch = 20

  /** Lattice pixels whose centers fall inside each polygon (diamond layer
    * schema: poly_id, cx, cy, r). Output: (poly_id, ix, iy) lattice indices. */
  def coveredPixels(polys: DataFrame): DataFrame = {
    val p = lit(Pitch.toDouble)
    polys
      .withColumn("ix", explode(sequence(
        ceil((col("cx") - col("r")) * p).cast("long"),
        floor((col("cx") + col("r")) * p).cast("long"))))
      .withColumn("iy", explode(sequence(
        ceil((col("cy") - col("r")) * p).cast("long"),
        floor((col("cy") + col("r")) * p).cast("long"))))
      .filter(abs(col("ix") / p - col("cx")) + abs(col("iy") / p - col("cy")) <= col("r"))
      .select(col("poly_id"), col("ix"), col("iy"))
  }

  /** Vector -> raster: per-polygon, per-tile covered-pixel counts at zoom z. */
  def rasterize(polys: DataFrame, z: Int): DataFrame =
    coveredPixels(polys)
      .withColumn("lon", col("ix") / Pitch.toDouble)
      .withColumn("lat", col("iy") / Pitch.toDouble)
      .withColumn("tile_z", lit(z.toLong))
      .withColumn("tile_x", TileAssign.tileX(col("lon"), z))
      .withColumn("tile_y", TileAssign.tileY(col("lat"), z))
      .groupBy("poly_id", "tile_z", "tile_x", "tile_y")
      .agg(count(lit(1)).as("n_pixels"))

  /** Synthetic raster band value at lattice pixel (ix, iy): exact integer,
    * recomputed identically by the oracle. */
  def bandValue(ix: Column, iy: Column): Column = ix * 31L + iy * 17L
  val bandValueSql: String = "(ix * 31 + iy * 17)"

  /** Raster -> vector: zonal statistics (pixel count, band sum, band min/max)
    * of the synthetic raster band over each polygon. */
  def zonalStats(polys: DataFrame): DataFrame =
    coveredPixels(polys)
      .withColumn("v", bandValue(col("ix"), col("iy")))
      .groupBy("poly_id")
      .agg(count(lit(1)).as("n_pixels"), sum(col("v")).as("zonal_sum"),
        min(col("v")).as("zonal_min"), max(col("v")).as("zonal_max"))

  /** DuckDB CTE for the covered-pixel set over a `polys(poly_id, cx, cy, r)`
    * relation: two-level unnest(generate_series) mirrors the sequence/
    * explode pair, with the identical bound arithmetic and containment
    * predicate (same IEEE double op sequence both engines). */
  val coveredCteSql: String =
    """covered AS (SELECT poly_id, ix, iy FROM (
      | SELECT poly_id, cx, cy, r, ix,
      |  unnest(generate_series(CAST(ceil((cy - r) * 20) AS BIGINT),
      |                         CAST(floor((cy + r) * 20) AS BIGINT))) AS iy
      | FROM (SELECT poly_id, cx, cy, r,
      |   unnest(generate_series(CAST(ceil((cx - r) * 20) AS BIGINT),
      |                          CAST(floor((cx + r) * 20) AS BIGINT))) AS ix
      |  FROM polys) a) b
      | WHERE abs(ix / 20.0 - cx) + abs(iy / 20.0 - cy) <= r)""".stripMargin.replace("\n", " ")
}
