package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HilbertCurve

class HilbertSpec extends AnyFunSuite with SparkTest {

  private val n = 1L << HilbertCurve.Order

  test("unit-step locality: consecutive d are always grid-adjacent (|dx|+|dy| == 1)") {
    // standard d2xy (Wikipedia inverse) as the independent reference
    def inv(d0: Long): (Long, Long) = {
      var x = 0L; var y = 0L; var t = d0; var s = 1L
      while (s < n) {
        val rx = (t / 2) & 1
        val ry = (t ^ rx) & 1
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx
        y += s * ry
        t /= 4
        s <<= 1
      }
      (x, y)
    }
    var prev = inv(0)
    assert(HilbertCurve.xy2d(prev._1, prev._2) == 0L)
    (1L until 4096L).foreach { d =>
      val cur = inv(d)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) == 1L, s"jump at d=$d")
      // round trip: xy2d(inv(d)) == d
      assert(HilbertCurve.xy2d(cur._1, cur._2) == d, s"round trip at d=$d")
      prev = cur
    }
  }

  test("injective on a lattice sample and bounded by n^2") {
    val pts = for (i <- 0L until 80L; j <- 0L until 80L) yield (i * 89 % n, j * 97 % n)
    val ds = pts.distinct.map { case (x, y) => HilbertCurve.xy2d(x, y) }
    assert(ds.distinct.size == pts.distinct.size)
    assert(ds.forall(d => d >= 0 && d < n * n))
  }

  test("native expression == reference fold through the Spark plan") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => ((i * 131) % 7200, (i * 37) % 2800)).toDF("x", "y")
    val got = df.select(col("x"), col("y"), HilbertCurve.hilbert(col("x"), col("y")).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) => assert(d == HilbertCurve.xy2d(x, y)) }
  }
}
