package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dissolve, OverlayJoin}

class DissolveSpec extends AnyFunSuite with SparkTest {

  /** Independent union-area brute force: full-plane sweep with sorted
    * boundaries and interval merging (no stripes, no windows). */
  private def brute(rects: Seq[(Long, Long, Long, Long)]): Long = {
    if (rects.isEmpty) return 0L
    val us = rects.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    us.sliding(2).collect { case Seq(a, b) =>
      val active = rects.filter(r => r._1 <= a && r._2 >= b)
        .map(r => (r._3, r._4)).sortBy(identity)
      var len = 0L; var hi = Long.MinValue
      for ((v0, v1) <- active) {
        if (v0 > hi) { len += v1 - v0; hi = v1 }
        else if (v1 > hi) { len += v1 - hi; hi = v1 }
      }
      (b - a) * len
    }.sum
  }

  private def run(rs: Seq[(Long, Long, Long, Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dissolve.unionArea(rs.toDF("cls", "u0", "u1", "v0", "v1"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("planted: disjoint sums, nested collapses, overlap counts once, cross-stripe partitions") {
    val S = Dissolve.StripeU
    val rs = Seq(
      // cls 0: two disjoint 10x10 squares -> 200
      (0L, 0L, 10L, 0L, 10L), (0L, 100L, 110L, 0L, 10L),
      // cls 1: nested -> outer area only (20x20 = 400)
      (1L, 0L, 20L, 0L, 20L), (1L, 5L, 15L, 5L, 15L),
      // cls 2: half-overlapping 10x10s -> 150
      (2L, 0L, 10L, 0L, 10L), (2L, 5L, 15L, 0L, 10L),
      // cls 3: one rect spanning a stripe boundary -> clipping must not
      // double count (width 40 across the first stripe edge)
      (3L, S - 20L, S + 20L, 0L, 5L),
      // cls 4: overlap ONLY across a stripe boundary
      (4L, S - 10L, S + 10L, 0L, 10L), (4L, S - 5L, S + 5L, 5L, 15L))
    val got = run(rs)
    assert(got(0L)._2 === 200L)
    assert(got(1L)._2 === 400L)
    assert(got(2L)._2 === 150L)
    assert(got(3L)._2 === 200L)
    assert(got(4L)._2 === brute(rs.filter(_._1 == 4L).map(r => (r._2, r._3, r._4, r._5))))
    for (c <- 0L to 4L)
      assert(got(c)._2 === brute(rs.filter(_._1 == c).map(r => (r._2, r._3, r._4, r._5))), s"cls $c")
  }

  test("union is bounded by sum of areas and by the bounding box; equals sum iff disjoint") {
    val rs = Seq((0L, 0L, 30L, 0L, 30L), (0L, 10L, 40L, 10L, 40L), (0L, 100L, 101L, 0L, 1L))
    val got = run(rs)(0L)._2
    val sumArea = rs.map(r => (r._3 - r._2) * (r._5 - r._4)).sum
    assert(got === brute(rs.map(r => (r._2, r._3, r._4, r._5))))
    assert(got < sumArea, "overlap must be counted once")
    assert(got === 30L * 30 + 30 * 30 - 20 * 20 + 1)
  }

  test("fixture: per-class union area of the A-layer squares matches the plane sweep") {
    import spark.implicits._
    val squares = OverlayJoin.squaresA(spark.read.parquet(s"$Sf/part.parquet"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val byCls = squares.groupBy(_._1 % 5)
    val want = byCls.map { case (c, rs) =>
      c -> brute(rs.map(r => (r._2, r._3, r._4, r._5)).toSeq)
    }
    val got = Dissolve.unionArea(
      OverlayJoin.squaresA(spark.read.parquet(s"$Sf/part.parquet"))
        .selectExpr("a_id % 5 AS cls", "u0", "u1", "v0", "v1"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got === want)
    // the urban cluster overlaps: at least one class must dissolve below
    // its raw sum
    val rawSums = byCls.map { case (c, rs) =>
      c -> rs.map(r => (r._3 - r._2) * (r._5 - r._4)).sum }
    assert(rawSums.exists { case (c, s) => got(c) < s }, "fixture must contain overlap")
  }
}
