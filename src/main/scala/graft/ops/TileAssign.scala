package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raster<->vector tile assignment (north-rule operator): map points to
  * slippy-map Web-Mercator tiles (z, x, y). Pure native-function column
  * math (whole-stage codegen, no UDF), written as the exact IEEE op
  * sequence mirrored by the DuckDB oracle and by [[graft.index.Tiles]].
  */
object TileAssign {

  def tileX(lon: Column, z: Int): Column = {
    val n = (1L << z).toDouble
    clampTile(floor((lon + 180.0) / 360.0 * n).cast("long"), z)
  }

  def tileY(lat: Column, z: Int): Column = {
    val n = (1L << z).toDouble
    val r = radians(lat)
    clampTile(floor((lit(1.0) - log(tan(r) + lit(1.0) / cos(r)) / math.Pi) / 2.0 * n).cast("long"), z)
  }

  private def clampTile(c: Column, z: Int): Column =
    greatest(lit(0L), least(lit((1L << z) - 1), c))

  /** Adds tile_z/tile_x/tile_y columns to any frame with (lon, lat). */
  def assign(points: DataFrame, z: Int): DataFrame =
    points
      .withColumn("tile_z", lit(z))
      .withColumn("tile_x", tileX(col("lon"), z))
      .withColumn("tile_y", tileY(col("lat"), z))

  /** Matching DuckDB SQL fragments (same op sequence). */
  def tileXSql(lon: String, z: Int): String = {
    val n = (1L << z).toDouble
    s"greatest(0, least(${(1L << z) - 1}, CAST(floor(($lon + 180.0) / 360.0 * $n) AS BIGINT)))"
  }
  def tileYSql(lat: String, z: Int): String = {
    val n = (1L << z).toDouble
    s"greatest(0, least(${(1L << z) - 1}, CAST(floor((1.0 - ln(tan(radians($lat)) + 1.0 / cos(radians($lat))) / pi()) / 2.0 * $n) AS BIGINT)))"
  }
}
