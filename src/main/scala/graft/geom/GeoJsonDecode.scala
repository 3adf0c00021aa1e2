package graft.geom

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom._
import graft.GraftError

/** GeoJSON geometry -> JTS (reference P2,
  * `/root/reference/src/format/geojson.rs:141-145`, which delegates to the
  * geojson crate's TryInto<geo::Geometry>). Hand-rolled coordinate-array
  * walk over Jackson nodes — jts-core has no GeoJSON reader. Supports
  * Point, MultiPoint, LineString, MultiLineString, Polygon, MultiPolygon,
  * GeometryCollection; 2-D only (extra ordinates ignored, like the
  * reference's wkb output).
  */
object GeoJsonDecode {
  private val mapper = new ObjectMapper()

  def parse(geometryJson: String): Geometry = decode(mapper.readTree(geometryJson))

  def decode(node: JsonNode): Geometry = {
    val f = WkbCodec.factory
    def coord(n: JsonNode) = new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())
    def coords(n: JsonNode): Array[Coordinate] =
      (0 until n.size()).map(i => coord(n.get(i))).toArray
    def ring(n: JsonNode): LinearRing = f.createLinearRing(coords(n))
    def polygon(n: JsonNode): Polygon = {
      val shell = ring(n.get(0))
      val holes = (1 until n.size()).map(i => ring(n.get(i))).toArray
      f.createPolygon(shell, holes)
    }
    val c = node.get("coordinates")
    node.get("type").asText() match {
      case "Point"           => f.createPoint(coord(c))
      case "MultiPoint"      => f.createMultiPointFromCoords(coords(c))
      case "LineString"      => f.createLineString(coords(c))
      case "MultiLineString" =>
        f.createMultiLineString((0 until c.size()).map(i => f.createLineString(coords(c.get(i)))).toArray)
      case "Polygon"         => polygon(c)
      case "MultiPolygon"    =>
        f.createMultiPolygon((0 until c.size()).map(i => polygon(c.get(i))).toArray)
      case "GeometryCollection" =>
        val gs = node.get("geometries")
        f.createGeometryCollection((0 until gs.size()).map(i => decode(gs.get(i))).toArray)
      case t => throw GraftError.Format(s"unsupported GeoJSON geometry type: $t")
    }
  }
}
