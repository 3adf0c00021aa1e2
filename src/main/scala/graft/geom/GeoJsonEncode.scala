package graft.geom

import org.locationtech.jts.geom._

/** Geometry -> GeoJSON geometry-object JSON — the encode mirror of
  * [[GeoJsonDecode]] (reference: the popgis pipeline only READS GeoJSON;
  * the export direction is part of making the engine a drop-in, so a
  * cleaned/joined layer can ship back out in the format it arrived in).
  * Coordinates print via Double.toString (shortest round-trip digits), so
  * decode(encode(g)) reproduces the exact same doubles — pinned by
  * GeoJsonlSinkSpec.
  */
object GeoJsonEncode {

  def encode(g: Geometry): String = {
    val sb = new StringBuilder(64)
    writeGeom(g, sb)
    sb.toString
  }

  private def writeGeom(g: Geometry, sb: StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("""{"type":"Point","coordinates":"""); writeCoord(p.getCoordinate, sb); sb.append('}')
    case l: LineString =>
      sb.append("""{"type":"LineString","coordinates":"""); writeLine(l, sb); sb.append('}')
    case p: Polygon =>
      sb.append("""{"type":"Polygon","coordinates":"""); writePoly(p, sb); sb.append('}')
    case m: MultiPoint =>
      sb.append("""{"type":"MultiPoint","coordinates":""")
      writeParts(m, sb, (g, b) => writeCoord(g.asInstanceOf[Point].getCoordinate, b)); sb.append('}')
    case m: MultiLineString =>
      sb.append("""{"type":"MultiLineString","coordinates":""")
      writeParts(m, sb, (g, b) => writeLine(g.asInstanceOf[LineString], b)); sb.append('}')
    case m: MultiPolygon =>
      sb.append("""{"type":"MultiPolygon","coordinates":""")
      writeParts(m, sb, (g, b) => writePoly(g.asInstanceOf[Polygon], b)); sb.append('}')
    case other =>
      throw new IllegalArgumentException(s"geojson encode: unsupported ${other.getGeometryType}")
  }

  private def writeParts(m: GeometryCollection, sb: StringBuilder,
                         one: (Geometry, StringBuilder) => Unit): Unit = {
    sb.append('[')
    var i = 0
    while (i < m.getNumGeometries) {
      if (i > 0) sb.append(',')
      one(m.getGeometryN(i), sb)
      i += 1
    }
    sb.append(']')
  }

  private def writePoly(p: Polygon, sb: StringBuilder): Unit = {
    sb.append('[')
    writeRing(p.getExteriorRing, sb)
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(','); writeRing(p.getInteriorRingN(i), sb); i += 1
    }
    sb.append(']')
  }

  private def writeRing(r: LineString, sb: StringBuilder): Unit = writeLine(r, sb)

  private def writeLine(l: LineString, sb: StringBuilder): Unit = {
    sb.append('[')
    val cs = l.getCoordinateSequence
    var i = 0
    while (i < cs.size()) {
      if (i > 0) sb.append(',')
      sb.append('[').append(num(cs.getX(i))).append(',').append(num(cs.getY(i))).append(']')
      i += 1
    }
    sb.append(']')
  }

  private def writeCoord(c: Coordinate, sb: StringBuilder): Unit =
    sb.append('[').append(num(c.x)).append(',').append(num(c.y)).append(']')

  // JSON has no NaN/Infinity literal, and Double.toString would emit one
  // unquoted — invalid JSON that breaks the read-back half of the
  // round-trip contract. A non-finite coordinate is not a representable
  // GeoJSON position at all, so reject rather than silently null-encode.
  private def num(d: Double): String = {
    require(java.lang.Double.isFinite(d), s"geojson encode: non-finite coordinate $d")
    d.toString
  }
}
