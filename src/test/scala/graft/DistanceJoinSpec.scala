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

  test("dwithin keeps points at the world edge (clamped cells)") {
    import spark.implicits._
    val l = Seq((1L, -179.99, -89.99), (2L, 179.99, 89.99)).toDF("lid", "lx", "ly")
    val r = Seq((10L, -179.95, -89.95), (20L, 179.95, 89.95)).toDF("rid", "rx", "ry")
    val got = DistanceJoin.dwithin(l, "lx", "ly", r, "rx", "ry", 0.1)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }
}
