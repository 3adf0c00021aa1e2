package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.DistanceJoin

class DistanceJoinSpec extends AnyFunSuite with SparkTest {

  test("levelFor: one cell at least d in both axes, capped") {
    assert(DistanceJoin.levelFor(0.27) === 9)        // 180/512=0.35 >= 0.27, 180/1024 < 0.27
    assert(DistanceJoin.levelFor(200.0) === 0)
    assert(DistanceJoin.levelFor(1e-9) === 12)       // cap
  }

  test("dwithin == brute-force cross join, each pair exactly once (incl. cell-edge cases)") {
    import spark.implicits._
    // deterministic scatter + clusters straddling cell boundaries at the
    // level levelFor picks for each d
    val left = (1 to 400).map { i =>
      (i.toLong, ((i * 131) % 700) / 2.0 - 174.7, ((i * 37) % 340) / 2.0 - 84.9)
    }.toDF("lid", "lx", "ly")
    val right = (1 to 300).map { i =>
      (i.toLong, ((i * 211) % 700) / 2.0 - 174.9, ((i * 89) % 340) / 2.0 - 84.7)
    }.toDF("rid", "rx", "ry")
    for (d <- Seq(0.31, 1.7, 12.3)) {
      val got = DistanceJoin.dwithin(left, "lx", "ly", right, "rx", "ry", d)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === got.distinct.size, s"d=$d duplicate pairs")
      val lr = left.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      val rr = right.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      val want = for {
        (li, lx, ly) <- lr.toSeq; (ri, rx, ry) <- rr
        if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= d * d
      } yield (li, ri)
      assert(got.sorted === want.sorted, s"d=$d")
      assert(want.nonEmpty, s"d=$d vacuous")
    }
  }

  test("dwithinGeodesic == brute-force haversine (high lat, antimeridian, varied radii)") {
    import spark.implicits._
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val sdLat = math.sin(math.toRadians(lat1 - lat2) / 2)
      val sdLon = math.sin(math.toRadians(lon1 - lon2) / 2)
      sdLat * sdLat +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sdLon * sdLon
    }
    // spread + deliberate antimeridian/high-lat clusters
    val special = Seq((9001L, -179.9, 78.0), (9002L, 179.85, 78.1),
      (9003L, 179.9, -80.0), (9004L, -179.92, -79.95), (9005L, 10.0, 86.0), (9006L, 11.5, 86.1))
    val left = ((1 to 250).map { i =>
      (i.toLong, ((i * 131) % 700) / 2.0 - 174.7, ((i * 37) % 330) / 2.0 - 82.4)
    } ++ special).toDF("lid", "lx", "ly")
    val right = ((1 to 200).map { i =>
      (i.toLong, ((i * 211) % 700) / 2.0 - 174.9, ((i * 89) % 330) / 2.0 - 82.2)
    } ++ special.map { case (id, x, y) => (id + 1000, x, y) }).toDF("rid", "rx", "ry")
    for (meters <- Seq(30000.0, 150000.0, 900000.0)) {
      val a = meters / DistanceJoin.EarthRadiusM
      val havA = { val s = math.sin(a / 2); s * s }
      val got = DistanceJoin.dwithinGeodesic(left, "lx", "ly", right, "rx", "ry", meters)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === got.distinct.size, s"m=$meters duplicate pairs")
      val lr = left.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      val rr = right.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      val want = for {
        (li, lx, ly) <- lr.toSeq; (ri, rx, ry) <- rr
        if hav(ly, lx, ry, rx) <= havA
      } yield (li, ri)
      assert(got.sorted === want.sorted, s"m=$meters")
      assert(want.nonEmpty, s"m=$meters vacuous")
      // the antimeridian pairs must be found
      if (meters >= 30000.0)
        assert(got.contains((9001L, 10002L)) || got.contains((9002L, 10001L)),
          s"m=$meters missed wrapped pair")
    }
  }

  test("dwithinGeodesic: sub-cell radius across the pole (clamp must not skip full-row)") {
    import spark.implicits._
    // ~89 m apart over the pole (lat 89.9996 both sides, lon 0 vs 180):
    // aDeg ~ 0.0009 for 100 m, so the 89.999-degree phi clamp is what
    // decides whether the full-lon-row sweep triggers
    val l = Seq((1L, 0.0, 89.9996), (2L, 10.0, 50.0)).toDF("lid", "lx", "ly")
    val r = Seq((1L, 180.0, 89.9996), (2L, 10.0005, 50.0)).toDF("rid", "rx", "ry")
    val got = DistanceJoin.dwithinGeodesic(l, "lx", "ly", r, "rx", "ry", 100.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 2L)))
  }

  test("q61 boundary margin: no synthetic pair sits within 1e6 ulps of the 120 km threshold") {
    // The q61 oracle compares Spark's sin/cos haversine term against
    // DuckDB's at `hv <= havA`. Unlike the planar layers (engineered
    // 0.025-degree polygon-boundary gap) the geodesic threshold has no
    // built-in gap, so a pair landing within an ulp of havA could flip the
    // hash across math libraries. This test MEASURES the margin on the
    // actual q61 inputs: min |hv - havA| over all ents x pois pairs must
    // exceed 1e6 ulps of havA — ~6 decimal orders beyond any conceivable
    // cross-library sin/cos divergence (last-ulp each, ~a dozen ops).
    val meters = 120000.0 // must match SparkEntry q61
    val a = meters / DistanceJoin.EarthRadiusM
    val havA = { val s = math.sin(a / 2); s * s }
    val e = Pipeline.entities(spark, Sf).select(col("lon").as("lx"), col("lat").as("ly"))
    val p = graft.sources.Layers.pois(spark, Sf).select(col("px"), col("py"))
    val hv = pow(sin(radians(col("ly") - col("py")) / 2), 2) +
      cos(radians(col("ly"))) * cos(radians(col("py"))) *
        pow(sin(radians(col("lx") - col("px")) / 2), 2)
    val minGap = e.crossJoin(p).select(min(abs(hv - lit(havA))).as("g"))
      .collect()(0).getDouble(0)
    val ulps = minGap / java.lang.Math.ulp(havA)
    info(f"q61 min |hv - havA| = $minGap%.3e = $ulps%.1e ulps of havA")
    assert(ulps > 1e6, f"pair within $ulps%.0f ulps of the q61 threshold")
  }

  test("geodesic dwithin at the pole: lat in [85, 90) x lon wrap == brute force") {
    // pins the polar cutoff + cos(lat) widening (DistanceJoin.scala
    // reachDeg): poleward of the cutoff the whole x row must be probed —
    // across-the-pole pairs have huge lon deltas at tiny distances. Every
    // point is poleward of 85 deg; half hug the antimeridian.
    import spark.implicits._
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val sdLat = math.sin(math.toRadians(lat1 - lat2) / 2)
      val sdLon = math.sin(math.toRadians(lon1 - lon2) / 2)
      sdLat * sdLat +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * sdLon * sdLon
    }
    val rnd = new scala.util.Random(77)
    def polarLat() = 85.0 + rnd.nextDouble() * 4.999999
    def lonAt(j: Int) =
      if (j % 2 == 0) { val d = rnd.nextDouble() * 0.5 - 0.25
        if (d < 0) -180.0 - d else 180.0 - d }
      else rnd.nextDouble() * 360.0 - 180.0
    val lpts = (1 to 250).map(i => (i.toLong, lonAt(i), polarLat())) ++
      Seq((9001L, 0.0, 89.9999), (9002L, 179.99, 89.999), (9003L, -179.99, 89.999))
    val rpts = (1 to 250).map(i => (i.toLong, lonAt(i + 1), polarLat())) ++
      Seq((9001L, -180.0, 89.9999), (9002L, 90.0, 89.99))
    val left = lpts.toDF("lid", "lx", "ly")
    val right = rpts.toDF("rid", "rx", "ry")
    for (meters <- Seq(5000.0, 120000.0, 600000.0)) {
      val a = meters / DistanceJoin.EarthRadiusM
      val havA = { val s = math.sin(a / 2); s * s }
      val got = DistanceJoin.dwithinGeodesic(left, "lx", "ly", right, "rx", "ry", meters)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === got.distinct.size, s"meters=$meters duplicate pairs")
      val brute = for {
        (lid, lx, ly) <- lpts
        (rid, rx, ry) <- rpts
        if hav(ly, lx, ry, rx) <= havA
      } yield (lid, rid)
      assert(got.toSet === brute.toSet, s"meters=$meters: " +
        s"missing=${(brute.toSet -- got).take(5)} extra=${(got.toSet -- brute.toSet).take(5)}")
    }
  }

  test("dwithin keeps points at the world edge (clamped cells)") {
    import spark.implicits._
    val l = Seq((1L, -179.99, -89.99), (2L, 179.99, 89.99)).toDF("lid", "lx", "ly")
    val r = Seq((10L, -179.95, -89.95), (20L, 179.95, 89.95)).toDF("rid", "rx", "ry")
    val got = DistanceJoin.dwithin(l, "lx", "ly", r, "rx", "ry", 0.1)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }
}
