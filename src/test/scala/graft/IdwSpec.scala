package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{IdwSurface, KernelDensity}

class IdwSpec extends AnyFunSuite with SparkTest {

  test("single sample at a cell center dominates its own cell") {
    import spark.implicits._
    // point at the exact center of cell (3, 2): lonm = 3*32+16, latm = 2*32+16
    val pts = Seq((3L * 32 + 16, 2L * 32 + 16, 500L)).toDF("lonm", "latm", "v")
    val got = IdwSurface.surface(pts).as[(Long, Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // d2 = 0 at own center -> w = WScale div 1 = WScale
    assert(got((3L, 2L)) === ((IdwSurface.WScale * 500L, IdwSurface.WScale)))
    // a neighbor center at distance 32: w = 1e6 div (1 + 1024) = 975
    assert(got((4L, 2L)) === ((975L * 500L, 975L)))
    // cells beyond the kernel radius (d2 >= 4096, e.g. offset (2,0) ->
    // d=64) are absent
    assert(!got.contains((5L, 2L)))
  }

  test("interpolation sits between two planted values, nearer one wins") {
    import spark.implicits._
    // v=1000 just left of the (3,2) center, v=3000 farther right
    val pts = Seq((3L * 32 + 12, 2L * 32 + 16, 1000L),
      (3L * 32 + 40, 2L * 32 + 16, 3000L)).toDF("lonm", "latm", "v")
    val r = IdwSurface.surface(pts).as[(Long, Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> (t._3.toDouble / t._4)).toMap
    val est = r((3L, 2L))
    assert(est > 1000.0 && est < 3000.0, s"estimate $est outside value range")
    assert(est < 2000.0, s"nearer sample (d=4 vs d=24) must dominate: $est")
  }

  test("fixture events: brute-force parity and mass conservation") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .filter($"value".isNotNull)
      .selectExpr("(user_id * 467 + 3) % 7200 AS lonm",
        "(user_id * 911 + 5) % 2800 AS latm",
        "CAST(floor(value * 1000) AS BIGINT) AS v")
      .as[(Long, Long, Long)].collect()
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for {
      (lonm, latm, v) <- ev
      k <- -2 to 2; j <- -2 to 2
      cx = lonm / KernelDensity.Cell + k
      cy = latm / KernelDensity.Cell + j
      if cx >= 0 && cx <= KernelDensity.MaxCx && cy >= 0 && cy <= KernelDensity.MaxCy
      dx = cx * KernelDensity.Cell + 16 - lonm
      dy = cy * KernelDensity.Cell + 16 - latm
      d2 = dx * dx + dy * dy if d2 < KernelDensity.R2
    } {
      val w = IdwSurface.WScale / (1 + d2)
      val (n0, d0) = want.getOrElse((cx, cy), (0L, 0L))
      want((cx, cy)) = (n0 + w * v, d0 + w)
    }
    val got = IdwSurface.docIdw(spark, Sf).as[(Long, Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(got === want.toMap)
    assert(got.nonEmpty && got.values.forall(_._2 > 0L))
  }
}
