package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{MapMatch, SegmentJoin}

class MapMatchSpec extends AnyFunSuite with SparkTest {

  private val S = MapMatch.Scale
  private val R = MapMatch.Radius

  /** Exact fixed-point squared distance, the spec's own derivation. */
  private def d2fx(px: Long, py: Long, ax1: Long, ay1: Long, ax2: Long, ay2: Long): Long = {
    val lx = ax2 - ax1; val ly = ay2 - ay1
    val l = lx * lx + ly * ly
    val dot = (px - ax1) * lx + (py - ay1) * ly
    val da = (px - ax1) * (px - ax1) + (py - ay1) * (py - ay1)
    val db = (px - ax2) * (px - ax2) + (py - ay2) * (py - ay2)
    val n = if (dot <= 0) da * l else if (dot >= l) db * l else da * l - dot * dot
    n * S / l
  }

  private def run(pts: Seq[(String, Long, Long, Long)],
                  segs: Seq[(Long, Long, Long, Long, Long)]): Map[(String, Long), (Long, Long)] = {
    import spark.implicits._
    MapMatch.snap(pts.toDF("url", "ent_idx", "lonm", "latm"),
      segs.toDF("a_id", "ax1", "ay1", "ax2", "ay2"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
  }

  test("planted: interior projection, endpoint zone, id tie-break, out-of-radius drop") {
    val segs = Seq(
      (1L, 0L, 0L, 10L, 0L),   // horizontal at y=0
      (2L, 0L, 4L, 10L, 4L),   // horizontal at y=4
      (3L, 2L, 100L, 10L, 100L))
    val pts = Seq(
      ("p_mid", 0L, 5L, 2L),     // equidistant (d2=4) from segs 1 and 2 -> id 1 wins
      ("p_end", 0L, 0L, 103L),   // before seg 3's first endpoint -> endpoint distance
      ("p_far", 0L, 500L, 500L)) // nothing within R
    val got = run(pts, segs)
    assert(got(("p_mid", 0L)) === ((1L, 4L * S)), "tie broken by min id")
    assert(got(("p_end", 0L)) === ((3L, d2fx(0, 103, 2, 100, 10, 100))))
    assert(d2fx(0, 103, 2, 100, 10, 100) === (4L + 9L) * S, "endpoint-zone distance is |p-a|^2")
    assert(!got.contains(("p_far", 0L)), "unmatched points drop")
  }

  test("interior projection beats both endpoint distances; fixed-point floor is exact") {
    // point (5,3) vs segment (0,0)-(8,4): interior projection, irrational
    // true distance — the floored fixed-point value must match the spec's
    // own integer derivation bit for bit
    val got = run(Seq(("p", 0L, 5L, 3L)), Seq((7L, 0L, 0L, 8L, 4L)))
    val want = d2fx(5, 3, 0, 0, 8, 4)
    assert(got(("p", 0L)) === ((7L, want)))
    val l = 80L; val dot = 52L; val n = 34L * l - dot * dot
    assert(want === n * S / l, "n/L = (da*L - dot^2)/L in the interior zone")
    assert(want * l <= n * S && (want + 1) * l > n * S, "floor law")
  }

  test("fixture: snap equals a full quadratic argmin over all segments") {
    import spark.implicits._
    val pts = graft.Pipeline.entities(spark, Sf)
      .select("url", "ent_idx", "lonm", "latm")
      .as[(String, Long, Long, Long)].collect().toSeq
    val segs = SegmentJoin.segmentsA(spark.read.parquet(s"$Sf/part.parquet"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val want = pts.flatMap { case (u, i, px, py) =>
      val cands = segs.map { case (id, x1, y1, x2, y2) => (d2fx(px, py, x1, y1, x2, y2), id) }
        .filter(_._1 <= R * R * S)
      if (cands.isEmpty) None else Some((u, i) -> { val m = cands.min; (m._2, m._1) })
    }.toMap
    val got = run(pts, segs)
    assert(got === want)
    assert(got.nonEmpty, "fixture must produce matches")
    assert(got.size < pts.size, "some fixture points lie beyond every segment's radius")
  }
}
