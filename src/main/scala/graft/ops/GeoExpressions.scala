package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import graft.index.CoverIndex
import graft.geom.WkbCodec

/** Native Catalyst expressions for the hot broadcast probes.
  *
  * A Scala UDF returning `Array[Long]` goes through CatalystTypeConverters:
  * every element is BOXED into a GenericArrayData — ~10 heap objects per
  * fact row. At 10^12 rows that garbage is the scaling bottleneck (profiled
  * locally: worker JVMs burn ~half their CPU in GC). These expressions
  * return `UnsafeArrayData.fromPrimitiveArray` directly — one flat buffer,
  * zero boxing. `CodegenFallback` is fine: the JTS/grid probe dominates,
  * and fallback still runs inside the surrounding whole-stage-codegen'd
  * projection.
  */
case class PolyContainsExpr(left: Expression, right: Expression,
                            bc: Broadcast[CoverIndex])
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(lon: Any, lat: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      bc.value.containing(lon.asInstanceOf[Double], lat.asInstanceOf[Double]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "st_containing_polys"
}

case class KnnPoisExpr(left: Expression, right: Expression,
                       bc: Broadcast[PoiGrid], k: Int)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(lon: Any, lat: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      bc.value.knn(lon.asInstanceOf[Double], lat.asInstanceOf[Double], k))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "st_knn_pois"
}

/** Way-geometry build (the tail of the J1 node↔way join): WKB from the
  * sorted (pos, lon, lat) struct array + the closed flag. The previous
  * ScalaUDF form converted the whole struct array to `Seq[Row]` per way
  * via CatalystTypeConverters (one boxed Row + two boxed Doubles per
  * vertex); this reads lon/lat straight out of the InternalRow buffers.
  * Byte-identical WKB (same [[WkbCodec]] writer, same rules: closed →
  * Polygon if the auto-closed ring has ≥ 4 points, else LineString if
  * ≥ 2 points; under-resolved ways keep geom = null — reference F1,
  * `/root/reference/src/format/osmpbf.rs:71-100`). */
case class WayWkbExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(closed: Any, pts: Any): Any = {
    val arr = pts.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val coords = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 3)
      coords(i) = (s.getDouble(1), s.getDouble(2))
      i += 1
    }
    val cs = scala.collection.immutable.ArraySeq.unsafeWrapArray(coords)
    if (closed.asInstanceOf[Boolean]) {
      val ringLen = if (n > 0 && coords(0) != coords(n - 1)) n + 1 else n
      if (ringLen >= 4) WkbCodec.write(WkbCodec.polygon(cs)) else null
    } else {
      if (n >= 2) WkbCodec.write(WkbCodec.lineString(cs)) else null
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "way_wkb"
}

object GeoExpressions {

  /** (closed, pts) -> WKB geometry for an assembled OSM way. */
  def wayWkb(closed: Column, pts: Column): Column =
    ExpressionUtils.column(
      WayWkbExpr(ExpressionUtils.expression(closed), ExpressionUtils.expression(pts)))

  /** (lon, lat) -> array<long> of containing polygon ids; polygon layer
    * collected + broadcast once. */
  def containingCol(spark: SparkSession, polygons: DataFrame, level: Int): (Column, Column) => Column = {
    val collected = polygons.select("poly_id", "geom").collect()
    val idx = CoverIndex.build(
      collected.map(_.getLong(0)), collected.map(_.getAs[Array[Byte]](1)), level)
    val bc = spark.sparkContext.broadcast(idx)
    (lon, lat) => ExpressionUtils.column(
      PolyContainsExpr(ExpressionUtils.expression(lon), ExpressionUtils.expression(lat), bc))
  }

  /** (lon, lat) -> array<long> of the k nearest poi ids, ordered.
    * `geodesic = true` ranks by great-circle distance (haversine) instead
    * of planar degrees — see [[PoiGrid]]. */
  def knnCol(spark: SparkSession, pois: DataFrame, k: Int, level: Int,
             geodesic: Boolean = false): (Column, Column) => Column = {
    val rows = pois.select("poi_id", "px", "py").collect()
    val grid = new PoiGrid(level, rows.map(_.getLong(0)),
      rows.map(_.getDouble(1)), rows.map(_.getDouble(2)), geodesic)
    val bc = spark.sparkContext.broadcast(grid)
    (lon, lat) => ExpressionUtils.column(
      KnnPoisExpr(ExpressionUtils.expression(lon), ExpressionUtils.expression(lat), bc, k))
  }
}
