package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the ring-stitching rules that the fixture/monaco
  * relation tests don't reach (those only check counts and geometry type).
  */
class StitchRingsSpec extends AnyFunSuite {

  test("a closed member way never extends an open ring (touching rings)") {
    // Open chain (ways 1 + 5) forms a square through (1,1); closed way 3 is
    // a triangle whose start/end node IS (1,1) — rings touching at a point,
    // common in real OSM. way 3 < way 5, so an endpoint index that admits
    // closed ways would absorb the triangle into the square (producing an
    // invalid self-touching ring) AND drop the triangle's own ring.
    val members = Seq(
      (1L, "outer", Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0))),
      (3L, "inner", Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0))),
      (5L, "outer", Seq((1.0, 1.0), (0.0, 1.0), (0.0, 0.0))))
    val rings = OsmRelationAssembly.stitchRings(members)
    assert(rings.length === 2)
    val byId = rings.map(r => r.minWayId -> r).toMap
    assert(byId(3L).role === "inner")
    assert(byId(3L).pts.length === 4) // the triangle, intact
    assert(byId(1L).role === "outer")
    assert(byId(1L).pts.length === 5) // the stitched square, no excursion
    assert(byId(1L).pts.head === byId(1L).pts.last)
  }

  test("degenerate closed ways (< 4 points) are dropped, not stitched") {
    // head == last but only 3 points: not a valid ring, and must not sit in
    // the endpoint index either.
    val members = Seq(
      (1L, "outer", Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0))),
      (2L, "outer", Seq((1.0, 1.0), (0.0, 1.0), (0.0, 0.0))),
      (9L, "outer", Seq((1.0, 1.0), (5.0, 5.0), (1.0, 1.0))))
    val rings = OsmRelationAssembly.stitchRings(members)
    assert(rings.length === 1)
    assert(rings.head.minWayId === 1L)
    assert(rings.head.pts.length === 5)
  }
}
