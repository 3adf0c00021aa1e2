package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HexGrid

class HexGridSpec extends AnyFunSuite with SparkTest {

  /** Center of axial cell (q, r), pointy-top, edge s. */
  private def center(q: Long, r: Long, s: Double): (Double, Double) =
    (s * math.sqrt(3.0) * (q + r / 2.0), s * 1.5 * r)

  test("cube rounding = nearest hex center (Voronoi law) on off-lattice points") {
    import spark.implicits._
    val s = HexGrid.SizeDeg
    val pts = (0 until 600).map { i =>
      (i.toLong, (i * 0.1372913 % 340.0) - 170.0, (i * 0.0771731 % 160.0) - 80.0)
    }
    val got = pts.toDF("id", "lon", "lat")
      .select(col("id"), HexGrid.hexCell(col("lon"), col("lat"))._1.as("hq"),
        HexGrid.hexCell(col("lon"), col("lat"))._2.as("hr"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    pts.foreach { case (id, x, y) =>
      val (gq, gr) = got(id)
      // brute-force nearest center over a candidate neighborhood
      val qf = (x * HexGrid.C1 - y * HexGrid.C3) / s
      val rf = y * HexGrid.C2 / s
      val cands = for {
        q <- (math.floor(qf).toLong - 2) to (math.floor(qf).toLong + 2)
        r <- (math.floor(rf).toLong - 2) to (math.floor(rf).toLong + 2)
      } yield (q, r)
      val best = cands.minBy { case (q, r) =>
        val (cx, cy) = center(q, r, s)
        (cx - x) * (cx - x) + (cy - y) * (cy - y)
      }
      assert((gq, gr) === best, s"point $id ($x, $y)")
    }
  }

  test("q112: cells partition the points; urban hex dominates") {
    import spark.implicits._
    val out = SparkEntry.queries("q112_hex_counts")(spark, Sf)
      .as[(Long, Long, Long)].collect()
    val total = Pipeline.entities(spark, Sf).count()
    assert(out.map(_._3).sum === total, "every point lands in exactly one cell")
    // the urban square [20,21)x[0,1) holds ~25% of entities; its hex must
    // dwarf the typical world cell
    val max = out.map(_._3).max
    assert(max > total / 5, s"urban concentration missing: max=$max total=$total")
    val sorted = out.map(_._3).sorted
    assert(max > 20 * sorted(sorted.length / 2), "max should dwarf the median cell")
  }
}
