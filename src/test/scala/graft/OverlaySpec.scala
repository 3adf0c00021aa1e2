package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.OverlayJoin
import graft.geom.WkbCodec

class OverlaySpec extends AnyFunSuite with SparkTest {

  /** Deterministic diamond layers (same shape as Layers.polygons/B). */
  private def diamonds(n: Int, seed: Long, rBase: Double) = {
    import spark.implicits._
    val mk = udf((cx: Double, cy: Double, r: Double) =>
      WkbCodec.write(WkbCodec.diamond(cx, cy, r)))
    (1 to n).map { i =>
      val cx = ((i * seed) % 80).toDouble - 39.5
      val cy = ((i * (seed + 12)) % 60).toDouble - 29.5
      (i.toLong, cx, cy, rBase + (i % 3) * 0.05)
    }.toDF("id", "cx", "cy", "r").withColumn("geom", mk($"cx", $"cy", $"r"))
  }

  test("overlay intersects join == brute-force JTS cross join, each pair exactly once") {
    val a = diamonds(120, 13L, 0.8)
    val b = diamonds(90, 29L, 0.7)
    for (level <- Seq(4, 6, 8)) {
      val got = OverlayJoin.intersectsJoin(a, "id", b, "id", level)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // no pair emitted twice (reporting-cell dedup)
      assert(got.size === got.distinct.size, s"level=$level dup pairs")
      val arows = a.select("id", "geom").collect()
        .map(r => (r.getLong(0), WkbCodec.read(r.getAs[Array[Byte]](1))))
      val brows = b.select("id", "geom").collect()
        .map(r => (r.getLong(0), WkbCodec.read(r.getAs[Array[Byte]](1))))
      val want = for {
        (ai, ag) <- arows; (bi, bg) <- brows if ag.intersects(bg)
      } yield (ai, bi)
      assert(got.sorted === want.sorted.toSeq, s"level=$level")
      assert(want.nonEmpty) // non-vacuous
    }
  }

  test("overlay join matches the closed-form L1 diamond test on Layers polygons") {
    // sf0.01: sparse layers at sf0.001 yield zero intersecting pairs (vacuous)
    val sfDir = "/root/testdata/sf0.01"
    val a = graft.sources.Layers.polygons(spark, sfDir)
    val b = graft.sources.Layers.polygonsB(spark, sfDir)
    val got = OverlayJoin.intersectsJoin(a, "poly_id", b, "polyb_id", level = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val arows = a.select("poly_id", "cx", "cy", "r").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val brows = b.select("polyb_id", "cx", "cy", "r").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = (for {
      (ai, ax, ay, ar) <- arows
      (bi, bx, by, br) <- brows
      if math.abs(ax - bx) + math.abs(ay - by) <= ar + br
    } yield (ai, bi)).sorted.toSeq
    assert(got === want)
    assert(want.nonEmpty)
  }
}
