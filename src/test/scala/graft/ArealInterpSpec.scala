package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ArealInterp

class ArealInterpSpec extends AnyFunSuite with SparkTest {

  import ArealInterp._

  private def brute(pts: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val src = pts.map { case (x, y) => (x / SrcW, y / SrcH) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    src.toSeq.flatMap { case ((sx, sy), n) =>
      val (u0, u1, v0, v1) = (sx * SrcW, (sx + 1) * SrcW, sy * SrcH, (sy + 1) * SrcH)
      for {
        tx <- (u0 / TgtW) to ((u1 - 1) / TgtW)
        ty <- (v0 / TgtH) to ((v1 - 1) / TgtH)
      } yield {
        val ox = math.min(u1, (tx + 1) * TgtW) - math.max(u0, tx * TgtW)
        val oy = math.min(v1, (ty + 1) * TgtH) - math.max(v0, ty * TgtH)
        (tx, ty) -> n * ox * oy
      }
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
  }

  private def run(pts: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    import spark.implicits._
    ArealInterp.toTargetGrid(spark, pts.toDF("lonm", "latm"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
  }

  test("planted points: brute-force parity and pycnophylactic mass conservation") {
    val pts = Seq((0L, 0L), (119L, 99L), (120L, 100L), (159L, 139L), (160L, 140L),
      (3000L, 1000L), (3000L, 1000L), (7199L, 2799L))
    val got = run(pts)
    assert(got === brute(pts))
    assert(got.values.sum === pts.size * SrcArea, "mass conserved: sum num = T * srcArea")
  }

  test("a source cell interior to one target cell transfers everything there") {
    // source cell (0,0) = [0,120)x[0,100) spans targets (0,0) only in y
    // ([0,140) covers it) but x crosses nothing ([0,160) covers [0,120))
    val got = run(Seq((5L, 5L)))
    assert(got === Map((0L, 0L) -> SrcArea))
  }

  test("fixture: brute-force parity over the ents table; totals conserve") {
    import spark.implicits._
    val pts = graft.Pipeline.entities(spark, Sf)
      .select("lonm", "latm").as[(Long, Long)].collect().toSeq
    val got = ArealInterp.toTargetGrid(spark,
      graft.Pipeline.entities(spark, Sf).select("lonm", "latm"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === brute(pts))
    assert(got.values.sum === pts.size * SrcArea)
    // at least one source cell must straddle a target boundary (weights
    // strictly between 0 and full area appear)
    assert(got.values.exists(v => v % SrcArea != 0), "fractional transfers present")
  }
}
