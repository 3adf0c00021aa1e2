package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{Mercator, WkbCodec}

class GeomSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("WKB point — little-endian ISO golden (parity with reference wkb crate)") {
    // POINT(1 2): 01 (LE) 01000000 (type=1) + two f64
    assert(hex(WkbCodec.write(WkbCodec.point(1, 2))) ===
      "0101000000000000000000f03f0000000000000040")
  }

  test("WKB linestring golden") {
    // LINESTRING(0 0, 1 1)
    assert(hex(WkbCodec.write(WkbCodec.lineString(Seq((0, 0), (1, 1))))) ===
      "010200000002000000" + "0000000000000000" * 2 + "000000000000f03f" * 2)
  }

  test("WKB polygon with hole round-trips and stays 2-D LE") {
    val p = WkbCodec.polygon(Seq((0, 0), (10, 0), (10, 10), (0, 10)),
      Seq(Seq((1, 1), (2, 1), (2, 2), (1, 2))))
    val b = WkbCodec.write(p)
    assert(b(0) === 1.toByte) // little-endian marker
    assert(b(1) === 3.toByte) // polygon type
    val back = WkbCodec.read(b)
    assert(back.equalsExact(p))
    assert(hex(WkbCodec.write(back)) === hex(b)) // stable bytes
  }

  test("diamond is closed and contains center, excludes boundary-adjacent grid points") {
    val d = WkbCodec.diamond(20.5, 0.5, 0.975)
    assert(d.contains(WkbCodec.point(20.5, 0.5)))
    assert(d.contains(WkbCodec.point(20.95, 0.95))) // manhattan 0.9 < 0.975
    assert(!d.contains(WkbCodec.point(21.0, 1.0))) // manhattan 1.0 > 0.975
  }

  test("Mercator golden values") {
    val (x0, y0) = Mercator.forward(0, 0)
    assert(x0 === 0.0 && math.abs(y0) < 1e-8) // tan(pi/4) rounds below 1.0
    val (x1, _) = Mercator.forward(180, 0)
    assert(math.abs(x1 - 20037508.342789244) < 1e-6)
    val (_, y2) = Mercator.forward(0, Mercator.MaxLat)
    assert(math.abs(y2 - 20037508.342789244) < 1e-3) // square world
  }

  test("Mercator round-trip < 1e-9 degrees") {
    for (lon <- Seq(-179.9, -45.0, 0.0, 3.25, 120.7); lat <- Seq(-84.0, -10.5, 0.0, 45.0, 84.9)) {
      val (x, y) = Mercator.forward(lon, lat)
      val (lon2, lat2) = Mercator.inverse(x, y)
      assert(math.abs(lon - lon2) < 1e-9 && math.abs(lat - lat2) < 1e-9, s"($lon,$lat)")
    }
  }

  test("Mercator transform: identity and unsupported pairs") {
    assert(Mercator.transform(1, 2, 4326, 4326) === ((1.0, 2.0)))
    assertThrows[IllegalArgumentException](Mercator.transform(1, 2, 4326, 2154))
  }
}
