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

  test("localMoran matches brute force; lags sum to the global cross-product; quadrants consistent") {
    import spark.implicits._
    val pts = (0 until 300).map { i =>
      ((i * 2.7182818 % 340.0) - 170.0, (i * 1.4142135 % 160.0) - 80.0)
    } ++ (0 until 150).map(i => (-60.1 + i * 0.002, 30.4 + i * 0.001))
    val got = SpatialStats.localMoran(spark, pts.toDF("lon", "lat"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got.size === N)
    // brute force z and lag per cell
    val counts = pts.map { case (lon, lat) => cell(lon, lat) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val t = pts.size.toLong
    val z = (for { cx <- 0L until G; cy <- 0L until G }
      yield (cx, cy) -> (N * counts.getOrElse((cx, cy), 0L) - t)).toMap
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    var globalWzz = 0L
    for (((cx, cy), zi) <- z) {
      val lag = offs.flatMap { case (dx, dy) => z.get((cx + dx, cy + dy)) }.sum
      val quad =
        if (zi > 0 && lag > 0) "HH" else if (zi < 0 && lag < 0) "LL"
        else if (zi > 0 && lag < 0) "HL" else if (zi < 0 && lag > 0) "LH" else "Z0"
      assert(got((cx, cy)) === ((zi, lag, quad)), s"cell ($cx, $cy)")
      globalWzz += zi * lag
    }
    // the per-cell lags reassemble the global Moran numerator
    val (_, _, _, _, wzz) = SpatialStats.moranNumerators(spark, pts.toDF("lon", "lat"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(globalWzz === wzz)
  }

  test("joinCounts matches brute force; directed counts cover every adjacency; BB/WW even") {
    import spark.implicits._
    val pts = (0 until 250).map { i =>
      ((i * 3.1415926 % 340.0) - 170.0, (i * 0.5772156 % 160.0) - 80.0)
    } ++ (0 until 90).map(i => (100.2 + (i % 9) * 0.01, -20.3 + (i / 9) * 0.01))
    val minPts = 3L
    val got = SpatialStats.joinCounts(spark, pts.toDF("lon", "lat"), minPts)
      .as[(String, Long)].collect().toMap
    val counts = pts.map { case (lon, lat) => cell(lon, lat) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cls = (for { cx <- 0L until G; cy <- 0L until G }
      yield (cx, cy) -> (if (counts.getOrElse((cx, cy), 0L) >= minPts) "B" else "W")).toMap
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    var bb = 0L; var ww = 0L; var bw = 0L
    for (((cx, cy), ci) <- cls; (dx, dy) <- offs; cj <- cls.get((cx + dx, cy + dy))) {
      (ci, cj) match {
        case ("B", "B") => bb += 1
        case ("W", "W") => ww += 1
        case _          => bw += 1
      }
    }
    assert(got.getOrElse("BB", 0L) === bb)
    assert(got.getOrElse("WW", 0L) === ww)
    assert(got.getOrElse("BW", 0L) === bw)
    val expectedW = 4L * 3 + 4L * (G - 2) * 5 + (G - 2L) * (G - 2L) * 8
    assert(bb + ww + bw === expectedW, "class pairs partition the adjacency set")
    assert(bb % 2 === 0 && ww % 2 === 0 && bw % 2 === 0, "directed symmetry")
  }

  test("getisOrd matches brute force; uniform hot block interior is HOT where LISA reads the sign of z alone") {
    import spark.implicits._
    // a uniform 4x4 hot block (every cell the same elevated count) plus
    // scattered background: Gi* must flag the block INTERIOR as HOT
    val block = for {
      bx <- 0 until 4; by <- 0 until 4; k <- 0 until 5
    } yield (10.0 + bx * (360.0 / G) + 0.01 + k * 0.001, 20.0 + by * (180.0 / G) + 0.01)
    val pts = block ++ (0 until 120).map { i =>
      ((i * 2.2360679 % 340.0) - 170.0, (i * 1.7320508 % 160.0) - 80.0)
    }
    val got = SpatialStats.getisOrd(spark, pts.toDF("lon", "lat"))
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got.size === N)
    val counts = pts.map { case (lon, lat) => cell(lon, lat) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val t = pts.size.toLong
    val offs9 = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1), (0, 0))
    for { cx <- 0L until G; cy <- 0L until G } {
      val nbs = offs9.map { case (dx, dy) => (cx + dx, cy + dy) }
        .filter { case (x, y) => x >= 0 && x < G && y >= 0 && y < G }
      val wi = nbs.size.toLong
      val gsum = nbs.map(counts.getOrElse(_, 0L)).sum
      val znum = N * gsum - wi * t
      val cls = if (znum > 0) "HOT" else if (znum < 0) "COLD" else "ZERO"
      assert(got((cx, cy)) === ((wi, gsum, znum, cls)), s"cell ($cx, $cy)")
    }
    // the block's interior cell: every neighborhood cell holds exactly 5
    // points — its Gi* must be HOT (intensity), distinguishing it from a
    // lone spike's neighbor
    val (icx, icy) = cell(10.0 + 1 * (360.0 / G) + 0.01, 20.0 + 1 * (180.0 / G) + 0.01)
    assert(got((icx, icy))._4 === "HOT")
    assert(got((icx, icy))._2 === 45L, "9-cell inclusive neighborhood x 5 points")
    // corner/edge/interior neighborhood sizes
    assert(got((0L, 0L))._1 === 4L)
    assert(got((0L, 5L))._1 === 6L)
    assert(got((5L, 5L))._1 === 9L)
  }

  test("gearyNumerators matches brute force and the degree identity vs Moran") {
    import spark.implicits._
    val pts = (0 until 350).map { i =>
      ((i * 1.6180339 % 340.0) - 170.0, (i * 1.2599210 % 160.0) - 80.0)
    } ++ (0 until 160).map(i => (-45.2 + i * 0.0015, 12.1 + i * 0.0011)) // hot cell
    val got = SpatialStats.gearyNumerators(spark, pts.toDF("lon", "lat"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    // brute force
    val counts = pts.map { case (lon, lat) => cell(lon, lat) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val t = pts.size.toLong
    val z = (for { cx <- 0L until G; cy <- 0L until G }
      yield (cx, cy) -> (N * counts.getOrElse((cx, cy), 0L) - t)).toMap
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    var wSum = 0L; var wdd = 0L; var wzz = 0L; var degZ2 = 0L
    for (((cx, cy), zi) <- z) {
      val nbs = offs.flatMap { case (dx, dy) => z.get((cx + dx, cy + dy)) }
      wSum += nbs.size
      degZ2 += nbs.size * zi * zi
      nbs.foreach { zj => wdd += (zi - zj) * (zi - zj); wzz += zi * zj }
    }
    assert(got === ((N, t, z.values.map(v => v * v).sum, wSum, wdd)))
    // symmetric-weights identity: sum_w (Zi-Zj)^2 = 2 sum_i d_i Zi^2 - 2 sum_wzz
    assert(wdd === 2 * degZ2 - 2 * wzz)
    val (_, _, _, _, gotWzz) = SpatialStats.moranNumerators(spark, pts.toDF("lon", "lat"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotWzz === wzz)
    // hot-cell surface: strong positive autocorrelation reads as C < 1
    val gearyC = (got._1 - 1).toDouble / (2.0 * got._4) * got._5 / got._3
    assert(gearyC >= 0.0 && gearyC < 1.0, s"C=$gearyC")
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
