package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.StDbscan

class StDbscanSpec extends AnyFunSuite with SparkTest {

  /** Independent brute force: quadratic neighborhoods + BFS components. */
  private def brute(evs: Seq[(Long, Long, Long)], eps1: Long, eps2: Long,
                    minPts: Long): Map[(Long, Long, Long), (Long, Long)] = {
    val m = evs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val coords = m.keys.toSeq
    def key(c: (Long, Long, Long)): Long =
      (c._1 * StDbscan.KeyMul + c._2) * StDbscan.DayMul + c._3
    def near(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = {
      val dx = a._1 - b._1; val dy = a._2 - b._2
      dx * dx + dy * dy <= eps1 * eps1 && math.abs(a._3 - b._3) <= eps2
    }
    val nbrs = coords.map(a => a -> coords.filter(near(a, _))).toMap
    val core = coords.filter(a => nbrs(a).map(m).sum >= minPts).toSet
    // BFS components over the core graph
    var lbl = Map.empty[(Long, Long, Long), Long]
    for (s <- core.toSeq.sortBy(key) if !lbl.contains(s)) {
      var comp = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(a => nbrs(a).filter(core)) -- comp
        comp ++= next; frontier = next
      }
      val l = comp.map(key).min
      comp.foreach(c => lbl += c -> l)
    }
    coords.map { c =>
      c -> (m(c), if (core(c)) lbl(c)
      else {
        val coreNb = nbrs(c).filter(core)
        if (coreNb.nonEmpty) coreNb.map(lbl).min else -1L
      })
    }.toMap
  }

  private def run(evs: Seq[(Long, Long, Long)], eps1: Long, eps2: Long,
                  minPts: Long): Map[(Long, Long, Long), (Long, Long)] = {
    import spark.implicits._
    StDbscan.clusterCoords(evs.toDF("x", "y", "day"), eps1, eps2, minPts)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5)).toMap
  }

  test("temporal split: the same place busy in two separated windows forms TWO clusters") {
    // location (100,100): 3 events/day on days 0..2 and again days 20..22;
    // spatially identical, temporally disjoint at eps2=2
    val evs = (for { d <- 0L to 2L; _ <- 0 until 3 } yield (100L, 100L, d)) ++
      (for { d <- 20L to 22L; _ <- 0 until 3 } yield (100L, 100L, d))
    val got = run(evs, eps1 = 5L, eps2 = 2L, minPts = 5L)
    val want = brute(evs, 5L, 2L, 5L)
    assert(got === want)
    val clusters = got.values.map(_._2).filter(_ >= 0).toSet
    assert(clusters.size === 2, s"two time-separated clusters, got $clusters")
    assert(got((100L, 100L, 0L))._2 !== got((100L, 100L, 20L))._2)
  }

  test("planted core/border/noise across space and time") {
    val evs =
      // dense core site: 4 events/day, days 0..2 at (0,0)
      (for { d <- 0L to 2L; _ <- 0 until 4 } yield (0L, 0L, d)) ++
      // border: single event within eps1 of the core site, same window
      Seq((3L, 4L, 1L)) ++
      // noise: far away in space, and one far in time
      Seq((1000L, 1000L, 1L), (0L, 0L, 10L))
    val got = run(evs, eps1 = 5L, eps2 = 2L, minPts = 6L)
    assert(got === brute(evs, 5L, 2L, 6L))
    assert(got((3L, 4L, 1L))._2 >= 0L, "border joins the cluster")
    assert(got((1000L, 1000L, 1L))._2 === -1L, "spatial noise")
    assert(got((0L, 0L, 10L))._2 === -1L, "temporal noise: same place, outside eps2 reach")
  }

  test("fixture events: full brute-force parity at the production parameters") {
    import spark.implicits._
    val evs = StDbscan.evCoords(spark, Sf)
      .as[(Long, Long, Long)].collect().toSeq
    val got = run(evs, StDbscan.Eps1, StDbscan.Eps2, StDbscan.MinPts)
    val want = brute(evs, StDbscan.Eps1, StDbscan.Eps2, StDbscan.MinPts)
    assert(got === want)
    val labels = got.values.map(_._2)
    assert(labels.exists(_ >= 0) && labels.exists(_ == -1L),
      "fixture exercises both clustered and noise coords")
  }
}
