package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SegmentJoin

class SegmentJoinSpec extends AnyFunSuite with SparkTest {

  private def bruteForce(as: Seq[(Long, Long, Long, Long, Long)],
                         bs: Seq[(Long, Long, Long, Long, Long)]): Set[(Long, Long)] = {
    def sgn(v: Long): Long = java.lang.Long.signum(v)
    def orient(ax: Long, ay: Long, bx: Long, by: Long, px: Long, py: Long): Long =
      sgn((bx - ax) * (py - ay) - (by - ay) * (px - ax))
    (for {
      (aid, ax1, ay1, ax2, ay2) <- as
      (bid, bx1, by1, bx2, by2) <- bs
      d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
      d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
      d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
      d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
      if d1 * d2 < 0 && d3 * d4 < 0
    } yield (aid, bid)).toSet
  }

  test("grid join == brute force on the synthetic layers, each pair exactly once") {
    import spark.implicits._
    val part = (0L until 800L).map(Tuple1(_)).toDF("p_partkey")
    val cust = (1L until 600L).map(Tuple1(_)).toDF("c_custkey")
    val a = SegmentJoin.segmentsA(part)
    val b = SegmentJoin.segmentsB(cust)
    val got = SegmentJoin.join(a, b).as[(Long, Long)].collect()
    // reference-point dedup law: NO duplicates even before any distinct
    assert(got.length == got.toSet.size, "pair emitted in more than one cell")
    val expected = bruteForce(
      a.as[(Long, Long, Long, Long, Long)].collect().toSeq,
      b.as[(Long, Long, Long, Long, Long)].collect().toSeq)
    assert(got.toSet == expected)
    assert(expected.nonEmpty, "degenerate fixture: no crossings planted")
  }

  test("strictness: endpoint touch and collinear overlap are excluded") {
    import spark.implicits._
    // B1 touches A's interior at (2,2); B2 is collinear with A; B3 crosses
    val a = Seq((1L, 0L, 0L, 4L, 4L)).toDF("a_id", "ax1", "ay1", "ax2", "ay2")
    val b = Seq(
      (1L, 2L, 2L, 5L, 0L),  // endpoint ON a's interior: touch, excluded
      (2L, 1L, 1L, 3L, 3L),  // collinear overlap: excluded by strict signs
      (3L, 0L, 3L, 3L, 0L)   // proper crossing at (1.5, 1.5)
    ).toDF("b_id", "bx1", "by1", "bx2", "by2")
    val got = SegmentJoin.join(a, b).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
  }
}
