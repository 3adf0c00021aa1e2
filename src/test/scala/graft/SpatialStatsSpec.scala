package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SpatialStats

class SpatialStatsSpec extends AnyFunSuite with SparkTest {

  private val G = SpatialStats.Grid
  private val N = SpatialStats.NCells

  private def cell(lon: Double, lat: Double): (Long, Long) = {
    val cx = math.max(0L, math.min(G - 1L, math.floor((lon + 180.0) / 360.0 * G).toLong))
    val cy = math.max(0L, math.min(G - 1L, math.floor((lat + 90.0) / 180.0 * G).toLong))
    (cx, cy)
  }

  /** Brute-force numerators over an in-memory point list. */
  private def brute(pts: Seq[(Double, Double)]): (Long, Long, Long, Long, Long) = {
    val counts = pts.map { case (lon, lat) => cell(lon, lat) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val t = pts.size.toLong
    val z = (for { cx <- 0L until G; cy <- 0L until G }
      yield (cx, cy) -> (N * counts.getOrElse((cx, cy), 0L) - t)).toMap
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    var wSum = 0L; var wzz = 0L
    for { ((cx, cy), zi) <- z; (dx, dy) <- offs } {
      z.get((cx + dx, cy + dy)).foreach { zj => wSum += 1; wzz += zi * zj }
    }
    (N, t, z.values.map(v => v * v).sum, wSum, wzz)
  }

  test("moranNumerators matches a brute-force queen-weights computation") {
    import spark.implicits._
    val pts = (0 until 400).map { i =>
      ((i * 1.7182818 % 340.0) - 170.0, (i * 0.9414213 % 160.0) - 80.0)
    } ++ (0 until 200).map { i => (20.3 + i * 0.001, 0.2 + i * 0.0007) } // hot cell
    val df = pts.toDF("lon", "lat")
    val got = SpatialStats.moranNumerators(spark, df)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === brute(pts))
  }

  test("lattice invariants: w_sum is the queen adjacency count; sum(Z)=0 forces sum_z2 exactness") {
    import spark.implicits._
    val pts = (0 until 100).map(i => ((i * 3.71 % 300.0) - 150.0, (i * 1.13 % 140.0) - 70.0))
    val (_, _, _, wSum, _) = brute(pts)
    // directed queen adjacencies of a GxG lattice: 4 corners*3 + edge*(5) + interior*8
    val expected = 4L * 3 + 4L * (G - 2) * 5 + (G - 2L) * (G - 2L) * 8
    assert(wSum === expected)
    val got = SpatialStats.moranNumerators(spark, pts.toDF("lon", "lat"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._4 === expected)
  }

  test("clustered input yields positive autocorrelation; Moran's I in (-1, 1] band") {
    import spark.implicits._
    // a tight cluster: all mass in one 2x2 block of cells
    val pts = (0 until 500).map(i => (10.0 + (i % 10) * 0.9, 5.0 + (i % 7) * 0.6))
    val (n, _, sumZ2, wSum, wzz) =
      SpatialStats.moranNumerators(spark, pts.toDF("lon", "lat"))
        .as[(Long, Long, Long, Long, Long)].collect().head
    val moranI = n.toDouble / wSum * wzz / sumZ2
    assert(wzz > 0, "clustered surface must have positive spatial covariance")
    assert(moranI > 0.0 && moranI <= 1.0 + 1e-9, s"I=$moranI")
  }
}
