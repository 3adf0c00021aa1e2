package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{CellGrid, Tiles}

/** Property-style tests with a seeded generator (scalatestplus bridge is
  * not on the offline classpath, so sampling is hand-rolled). */
class CellGridSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def lon() = rnd.nextDouble() * 360.0 - 180.0
  private def lat() = rnd.nextDouble() * 180.0 - 90.0
  private def level() = 1 + rnd.nextInt(20)
  private val N = 500

  test("pack/unpack round-trip") {
    for (_ <- 0 until N) {
      val l = level()
      val x = math.abs(rnd.nextLong()) % (1L << l)
      val y = math.abs(rnd.nextLong()) % (1L << l)
      val id = CellGrid.pack(x, y, l)
      assert(CellGrid.unpackLevel(id) === l)
      assert(CellGrid.unpackX(id) === x)
      assert(CellGrid.unpackY(id) === y)
    }
  }

  test("parent-child containment: cellId at level l-1 == parent of cellId at l") {
    for (_ <- 0 until N) {
      val (lo, la, l) = (lon(), lat(), level())
      val child = CellGrid.cellId(lo, la, l)
      assert(CellGrid.parent(child) === CellGrid.cellId(lo, la, l - 1))
    }
  }

  test("children of parent include the child; siblings are distinct") {
    for (_ <- 0 until N) {
      val (lo, la, l) = (lon(), lat(), level())
      val child = CellGrid.cellId(lo, la, l)
      val kids = CellGrid.children(CellGrid.parent(child))
      assert(kids.contains(child))
      assert(kids.distinct.length === 4)
    }
  }

  test("bounds contain the generating point; width halves per level") {
    for (_ <- 0 until N) {
      val (lo, la, l) = (lon(), lat(), level())
      val (x0, y0, x1, y1) = CellGrid.bounds(CellGrid.cellId(lo, la, l))
      assert(lo >= x0 - 1e-9 && lo < x1 + 1e-9)
      assert(la >= y0 - 1e-9 && la < y1 + 1e-9)
      assert(math.abs((x1 - x0) * (1L << l) - 360.0) < 1e-6)
    }
  }

  test("morton round-trip and quad ordering") {
    for (_ <- 0 until N) {
      val x = math.abs(rnd.nextLong()) % (1L << 29)
      val y = math.abs(rnd.nextLong()) % (1L << 29)
      assert(CellGrid.unmorton(CellGrid.morton(x, y)) === ((x, y)))
    }
    assert(CellGrid.morton(0, 0) === 0L)
    assert(CellGrid.morton(1, 0) === 1L)
    assert(CellGrid.morton(0, 1) === 2L)
    assert(CellGrid.morton(1, 1) === 3L)
  }

  test("coverBBox covers the generating cell") {
    for (_ <- 0 until N) {
      val (lo, la) = (lon() min 179.9, lat() min 89.9)
      val l = 1 + rnd.nextInt(10)
      val cells = CellGrid.coverBBox(lo, la, lo + 0.001, la + 0.001, l)
      assert(cells.contains((CellGrid.cellX(lo, l), CellGrid.cellY(la, l))))
    }
  }

  test("tile golden values and bounds containment") {
    assert(Tiles.tile(0.0, 0.0, 0) === ((0L, 0L)))
    // OSM wiki example: lat 41.85, lon -87.65 @ z13 -> (2101, 3045)
    assert(Tiles.tile(-87.65, 41.85, 13) === ((2101L, 3045L)))
    for (_ <- 0 until N) {
      val lo = lon(); val la = rnd.nextDouble() * 169.8 - 84.9; val z = rnd.nextInt(17)
      val (tx, ty) = Tiles.tile(lo, la, z)
      val (x0, y0, x1, y1) = Tiles.bounds(z, tx, ty)
      assert(lo >= x0 - 1e-9 && lo <= x1 + 1e-9, s"($lo,$la,$z)")
      assert(la >= y0 - 1e-9 && la <= y1 + 1e-9, s"($lo,$la,$z)")
    }
  }
}
