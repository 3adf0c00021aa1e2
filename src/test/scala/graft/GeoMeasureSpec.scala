package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GeoMeasure

class GeoMeasureSpec extends AnyFunSuite with SparkTest {

  /** Local reference: same op sequence per segment, grouped fold. */
  private def brute(rows: Seq[(String, Long, Double, Double)]): Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (k, g) =>
      val pts = g.sortBy(_._2)
      val len = pts.sliding(2).collect { case Seq((_, _, x1, y1), (_, _, x2, y2)) =>
        val dx = x2 - x1; val dy = y2 - y1
        math.floor(math.sqrt(dx * dx + dy * dy) * GeoMeasure.ScaleU).toLong
      }.sum
      k -> (pts.size.toLong, len)
    }

  test("trackLength == local fold: multi-segment, single-point, shared vertices") {
    import spark.implicits._
    val rows = Seq[(String, Long, Double, Double)](
      ("a", 0L, 0.0, 0.0), ("a", 1L, 3.0, 4.0), ("a", 2L, 3.0, 4.0), // 5 deg + 0
      ("b", 5L, -1.5, 2.25), ("b", 9L, 0.5, -0.75),                  // one segment
      ("c", 0L, 10.0, 10.0),                                         // no segment
      ("d", 0L, 179.95, -69.9), ("d", 1L, -180.0, 70.0), ("d", 2L, 0.05, 0.05))
    val got = GeoMeasure.trackLength(rows.toDF("url", "ent_idx", "lon", "lat"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === brute(rows))
    assert(got("a") === (3L, 5000000L))
    assert(got("c") === (1L, 0L), "single vertex has zero length")
  }

  test("q109 on the sf entity table == local fold; one exchange serves window + agg") {
    import spark.implicits._
    val out = SparkEntry.queries("q109_track_length")(spark, Sf)
    val got = out.as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rows = Pipeline.entities(spark, Sf)
      .selectExpr("url", "CAST(ent_idx AS BIGINT)", "lon", "lat")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got === brute(rows))
    assert(got.values.exists(_._2 > 0L), "fixture must have non-trivial lengths")

    // the lag window and the final groupBy share the url clustering —
    // exactly one exchange in the whole measurement (past the synth scan)
    val explained = GeoMeasure.trackLength(
        Pipeline.entities(spark, Sf).select("url", "ent_idx", "lon", "lat"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(explained).size
    assert(exchanges === 1,
      s"trackLength must shuffle exactly once on url, got $exchanges\n$explained")
  }

  test("trailSegments == brute-force gaps-and-islands; threshold is strict >") {
    import spark.implicits._
    val t = GeoMeasure.GapD2 // 1,000,000 (d = 1000 units)
    val rows = Seq[(String, Long, Long, Long)](
      // a: tight pair, then a jump, then tight again -> 2 segments
      ("a", 0L, 100L, 100L), ("a", 1L, 101L, 100L),
      ("a", 2L, 5000L, 2000L), ("a", 3L, 5001L, 2001L),
      // b: jump of EXACTLY d2 = threshold is NOT a gap (strict >)
      ("b", 0L, 0L, 0L), ("b", 1L, 1000L, 0L),
      // c: single point
      ("c", 7L, 42L, 42L),
      // d: every step a gap -> one segment per point
      ("d", 0L, 0L, 0L), ("d", 1L, 2000L, 0L), ("d", 2L, 4000L, 2000L))
    val got = GeoMeasure.trailSegments(rows.toDF("url", "ent_idx", "lonm", "latm"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", 0L)) === ((2L, 0L, 1L)))
    assert(got(("a", 1L)) === ((2L, 2L, 3L)))
    assert(got(("b", 0L)) === ((2L, 0L, 1L)), "d2 == threshold stays one segment")
    assert(got(("c", 0L)) === ((1L, 7L, 7L)))
    assert(got(("d", 0L)) === ((1L, 0L, 0L)) && got(("d", 1L)) === ((1L, 1L, 1L))
      && got(("d", 2L)) === ((1L, 2L, 2L)))
    assert(got.size === 7)
  }
}
