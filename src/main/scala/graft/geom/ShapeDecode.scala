package graft.geom

import org.locationtech.jts.geom.Geometry
import graft.GraftError

/** Shapefile shape-record -> JTS geometry, reproducing the reference's
  * `to_geo` quirks EXACTLY (`/root/reference/src/format/geo.rs:5-48`,
  * specified by its own tests `geo.rs:62-118`):
  *
  *  - Point -> Point.
  *  - PolyLine: ALL parts concatenated into ONE LineString (multi-part
  *    structure deliberately flattened — 3 parts of the reference test
  *    become one 7-vertex line).
  *  - Polygon: every OUTER ring's vertices concatenated into ONE exterior
  *    ring; each INNER ring becomes a hole. Ring role = ESRI winding
  *    (clockwise = outer, counter-clockwise = inner, signed-area test).
  *
  * Other shape types -> [[GraftError.UnsupportedShapeType]]
  * (`geo.rs:44-46`).
  */
object ShapeDecode {

  sealed trait Shape
  final case class SPoint(x: Double, y: Double) extends Shape
  final case class SPolyLine(parts: Seq[Seq[(Double, Double)]]) extends Shape
  final case class SPolygon(rings: Seq[Seq[(Double, Double)]]) extends Shape
  case object SNull extends Shape
  final case class SUnsupported(shapeType: Int) extends Shape

  /** Signed area > 0 => counter-clockwise (ESRI inner ring). */
  def signedArea(ring: Seq[(Double, Double)]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      val (x1, y1) = ring(i); val (x2, y2) = ring(i + 1)
      a += x1 * y2 - x2 * y1
      i += 1
    }
    a / 2.0
  }

  /** null for SNull (feature emitted with null geom); throws for
    * unsupported types like the reference. */
  def toGeometry(s: Shape): Geometry = s match {
    case SPoint(x, y) => WkbCodec.point(x, y)
    case SPolyLine(parts) =>
      // reference quirk: parts flattened into a single LineString
      WkbCodec.lineString(parts.flatten)
    case SPolygon(rings) =>
      val (inner, outer) = rings.partition(r => signedArea(r) > 0)
      // reference quirk: all outer rings concatenated into ONE exterior
      WkbCodec.polygon(outer.flatten, inner)
    case SNull => null
    case SUnsupported(t) => throw GraftError.UnsupportedShapeType(t)
  }
}
