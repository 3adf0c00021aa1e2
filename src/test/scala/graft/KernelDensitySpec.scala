package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.KernelDensity

class KernelDensitySpec extends AnyFunSuite with SparkTest {

  private val C = KernelDensity.Cell
  private val R2 = KernelDensity.R2

  /** Brute force: every in-grid cell center within the kernel radius. */
  private def brute(pts: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val acc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((x, y) <- pts; cx <- 0L to KernelDensity.MaxCx; cy <- 0L to KernelDensity.MaxCy) {
      val dx = cx * C + 16 - x; val dy = cy * C + 16 - y
      val d2 = dx * dx + dy * dy
      if (d2 < R2) acc((cx, cy)) = acc.getOrElse((cx, cy), 0L) + (R2 - d2)
    }
    acc.toMap
  }

  test("surface == brute force; mass conserved; 5x5 window is sufficient") {
    import spark.implicits._
    val pts: Seq[(Long, Long)] = Seq(
      (100L, 100L), (100L, 100L),  // stacked points double their mass
      (4000L, 1400L),              // urban corner
      (0L, 0L), (7199L, 2799L),    // grid corners (window clipping)
      (48L, 16L),                  // exactly on a cell center
      (3117L, 923L), (3118L, 924L))
    val got = KernelDensity.surface(pts.toDF("lonm", "latm"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = brute(pts)
    assert(got === want)
    // mass conservation for interior points: each contributes the same
    // total kernel mass regardless of position modulo the cell (sum over
    // all centers within R of the point)
    val whole = got.values.sum
    assert(whole === want.values.sum)
    // a point exactly on a center contributes w = R2 there
    val (ccx, ccy) = (1L, 0L) // center (48, 16)
    assert(want((ccx, ccy)) >= R2)
  }

  test("kernel support: no cell beyond 2 blocks receives mass; edge clipping drops out-of-grid cells") {
    import spark.implicits._
    val pts = Seq((3200L, 1600L))
    val got = KernelDensity.surface(pts.toDF("lonm", "latm"))
      .as[(Long, Long, Long)].collect()
    val (px, py) = (3200L / C, 1600L / C)
    assert(got.nonEmpty)
    got.foreach { case (cx, cy, w) =>
      assert(math.abs(cx - px) <= 2 && math.abs(cy - py) <= 2, s"cell ($cx,$cy)")
      assert(w > 0 && w <= R2)
    }
    // corner point: all emitted cells are in-grid
    val corner = KernelDensity.surface(Seq((0L, 0L)).toDF("lonm", "latm"))
      .as[(Long, Long, Long)].collect()
    corner.foreach { case (cx, cy, _) => assert(cx >= 0 && cy >= 0) }
    assert(corner.length < 25, "clipping removed out-of-grid cells")
  }
}
