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

  test("dwithin keeps points at the world edge (clamped cells)") {
    import spark.implicits._
    val l = Seq((1L, -179.99, -89.99), (2L, 179.99, 89.99)).toDF("lid", "lx", "ly")
    val r = Seq((10L, -179.95, -89.95), (20L, 179.95, 89.95)).toDF("rid", "rx", "ry")
    val got = DistanceJoin.dwithin(l, "lx", "ly", r, "rx", "ry", 0.1)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }
}
