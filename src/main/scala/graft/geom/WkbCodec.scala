package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, ByteOrderValues}

/** WKB encode/decode, little-endian ISO, 2-D — byte-parity with the
  * reference's `wkb::geom_to_wkb` (`/root/reference/src/pg/binary_copy.rs:14-34`,
  * used from `src/format/geojson.rs:156-158` etc.), which emits
  * little-endian ISO WKB without SRID.
  *
  * JTS `WKBWriter`/`WKBReader` are not thread-safe, and geometry columns are
  * processed inside executor tasks, so every helper goes through a
  * ThreadLocal instance. A shared `GeometryFactory` (JTS factories are
  * immutable/thread-safe) keeps object churn low on the hot path.
  */
object WkbCodec {
  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 0)

  private val writer = ThreadLocal.withInitial[WKBWriter](() =>
    new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN, /*includeSRID=*/ false))
  private val reader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))

  def write(g: Geometry): Array[Byte] = writer.get.write(g)
  def read(b: Array[Byte]): Geometry = reader.get.read(b)

  def point(x: Double, y: Double): Point =
    factory.createPoint(new Coordinate(x, y))

  def lineString(coords: Seq[(Double, Double)]): LineString =
    factory.createLineString(coords.map { case (x, y) => new Coordinate(x, y) }.toArray)

  /** Polygon from one exterior ring + holes; auto-closes rings like the
    * reference's geo-types Polygon constructor does. */
  def polygon(exterior: Seq[(Double, Double)], holes: Seq[Seq[(Double, Double)]] = Nil): Polygon = {
    def ring(c: Seq[(Double, Double)]): LinearRing = {
      val closed = if (c.nonEmpty && c.head != c.last) c :+ c.head else c
      factory.createLinearRing(closed.map { case (x, y) => new Coordinate(x, y) }.toArray)
    }
    factory.createPolygon(ring(exterior), holes.map(ring).toArray)
  }

  def multiPolygon(polys: Seq[Polygon]): MultiPolygon =
    factory.createMultiPolygon(polys.toArray)

  /** Axis-aligned "diamond" |x-cx|+|y-cy| <= r — used by the synthetic
    * polygon layers so the DuckDB oracle can express containment in
    * closed form while Spark runs the real JTS pipeline. */
  def diamond(cx: Double, cy: Double, r: Double): Polygon =
    polygon(Seq((cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)))
}
