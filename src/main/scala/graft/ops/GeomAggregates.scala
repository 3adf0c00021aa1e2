package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import graft.geom.WkbCodec

/** Geometry AGGREGATE functions (PostGIS `ST_Extent` analog): bounding-box
  * union over a WKB geometry column as a [[TypedImperativeAggregate]].
  * The buffer is four doubles, so Spark runs it as an ObjectHashAggregate
  * with map-side combine — a groupBy over 10^12 geometries shuffles only
  * (#partitions x #groups) 32-byte envelopes, never the geometries.
  * Mirrors the reference's per-table geometry handling generalized to
  * grouped aggregation (popgis loads whole tables; extent-per-group is the
  * warehouse-side analog).
  */
case class ExtentAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  // (minx, miny, maxx, maxy); empty = +inf/+inf/-inf/-inf
  override def createAggregationBuffer(): Array[Double] =
    Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val env = WkbCodec.read(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal
      if (env.getMinX < buf(0)) buf(0) = env.getMinX
      if (env.getMinY < buf(1)) buf(1) = env.getMinY
      if (env.getMaxX > buf(2)) buf(2) = env.getMaxX
      if (env.getMaxY > buf(3)) buf(3) = env.getMaxY
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other(0) < buf(0)) buf(0) = other(0)
    if (other(1) < buf(1)) buf(1) = other(1)
    if (other(2) > buf(2)) buf(2) = other(2)
    if (other(3) > buf(3)) buf(3) = other(3)
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0).isInfinite) null
    else InternalRow(buf(0), buf(1), buf(2), buf(3))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(32)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(4)(in.readDouble())
  }

  override def dataType: DataType = StructType(Seq(
    StructField("minx", DoubleType, nullable = false),
    StructField("miny", DoubleType, nullable = false),
    StructField("maxx", DoubleType, nullable = false),
    StructField("maxy", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): ExtentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExtentAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "st_extent"
}

object GeomAggregates {
  /** st_extent(geomWkb): bbox-union aggregate for groupBy().agg(). */
  def extent(geom: Column): Column =
    ExpressionUtils.column(
      ExtentAgg(ExpressionUtils.expression(geom)).toAggregateExpression())
}
