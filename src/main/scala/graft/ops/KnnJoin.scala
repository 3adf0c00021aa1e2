package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.CellGrid

import scala.collection.mutable

/** kNN join via cell-ring expansion (north-rule operator, SURVEY.md §2b):
  * k nearest POIs per point, metric = planar squared distance in degrees
  * (pure multiply/add — bit-identical between Spark and the DuckDB oracle;
  * geodesic metrics are a later round).
  *
  * The POI layer is a dim table (10..10^6 rows), so the scale plan is a
  * broadcast grid index probed by a narrow map over the 10^12-point side —
  * zero shuffle, embarrassingly parallel. Ring expansion: probe Chebyshev
  * cell rings 0,1,2,... around the point's cell; stop once k candidates are
  * found AND the k-th distance is <= the minimum possible distance to any
  * unvisited cell (exact termination bound, so results equal a full scan).
  * Ties broken by poi_id, making the top-k a total order.
  */
class PoiGrid(val level: Int, val ids: Array[Long], val xs: Array[Double],
              val ys: Array[Double]) extends Serializable {
  val n: Long = 1L << level
  val cellW: Double = 360.0 / n.toDouble
  val cellH: Double = 180.0 / n.toDouble

  @transient lazy val byCell: Map[Long, Array[Int]] = {
    val m = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < ids.length) {
      val key = (CellGrid.cellX(xs(i), level) << 32) | CellGrid.cellY(ys(i), level)
      m.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += i
      i += 1
    }
    m.view.mapValues(_.toArray).toMap
  }

  /** Ordered (by dist2 asc, poi_id asc) ids of the k nearest POIs.
    * Allocation-light (primitive insertion buffers): this runs 10^12 times
    * on the fact side, so per-probe garbage is a GC/scaling tax. */
  def knn(px: Double, py: Double, k: Int): Array[Long] = {
    if (ids.isEmpty || k <= 0) return Array.empty
    val cx = CellGrid.cellX(px, level); val cy = CellGrid.cellY(py, level)
    val maxC = n - 1
    val kk = math.min(k, ids.length)
    val bd = new Array[Double](kk) // ascending (dist2, id) insertion buffers
    val bi = new Array[Long](kk)
    var size = 0
    def consider(i: Int): Unit = {
      val dx = px - xs(i); val dy = py - ys(i)
      val d2 = dx * dx + dy * dy
      val id = ids(i)
      if (size < kk || d2 < bd(size - 1) || (d2 == bd(size - 1) && id < bi(size - 1))) {
        var p = if (size < kk) size else size - 1
        while (p > 0 && (bd(p - 1) > d2 || (bd(p - 1) == d2 && bi(p - 1) > id))) {
          bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = d2; bi(p) = id
        if (size < kk) size += 1
      }
    }
    def probe(x: Long, y: Long): Unit =
      if (x >= 0 && x <= maxC && y >= 0 && y <= maxC) {
        val arr = byCell.getOrElse((x << 32) | y, null)
        if (arr != null) { var i = 0; while (i < arr.length) { consider(arr(i)); i += 1 } }
      }

    var r = 0L
    var done = false
    while (!done) {
      if (r == 0) probe(cx, cy)
      else {
        var x = cx - r
        while (x <= cx + r) { probe(x, cy - r); probe(x, cy + r); x += 1 }
        var y = cy - r + 1
        while (y <= cy + r - 1) { probe(cx - r, y); probe(cx + r, y); y += 1 }
      }
      // min distance from the point to anywhere outside rings 0..r
      val minX = -180.0 + (cx - r) * cellW
      val maxX = -180.0 + (cx + r + 1) * cellW
      val minY = -90.0 + (cy - r) * cellH
      val maxY = -90.0 + (cy + r + 1) * cellH
      val dOut = math.min(math.min(px - minX, maxX - px), math.min(py - minY, maxY - py))
      val coveredAll = cx - r <= 0 && cy - r <= 0 && cx + r >= maxC && cy + r >= maxC
      if (coveredAll) done = true
      else if (size >= kk && bd(size - 1) <= dOut * dOut) done = true
      else r += 1
    }
    java.util.Arrays.copyOf(bi, size)
  }
}

object KnnJoin {

  /** Collect + broadcast the POI layer, return a (lon,lat)->ordered ids UDF. */
  def knnUdf(spark: SparkSession, pois: DataFrame, k: Int,
             level: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val rows = pois.select("poi_id", "px", "py").collect()
    val grid = new PoiGrid(level, rows.map(_.getLong(0)),
      rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
    val bc = spark.sparkContext.broadcast(grid)
    udf((lon: Double, lat: Double) => bc.value.knn(lon, lat, k))
  }

  /** points must carry (lon, lat); pois (poi_id, px, py). Output: point rows
    * + (knn_rank int starting at 1, poi_id long). */
  def broadcastKnn(spark: SparkSession, points: DataFrame, pois: DataFrame,
                   k: Int, level: Int = 6): DataFrame = {
    val knnUdf = GeoExpressions.knnCol(spark, pois, k, level)
    points
      .withColumn("knn", knnUdf(col("lon"), col("lat")))
      .select(col("*"), posexplode(col("knn")).as(Seq("knn_pos", "poi_id")))
      .withColumn("knn_rank", col("knn_pos") + 1)
      .drop("knn", "knn_pos")
  }
}
