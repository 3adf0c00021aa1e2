package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TrajectorySim

class TrajectorySimSpec extends AnyFunSuite with SparkTest {

  private val B = TrajectorySim.Block

  /** Brute-force symmetric Hausdorff^2 between two point lists. */
  private def hausdorff2(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Long = {
    def d2(p: (Long, Long), q: (Long, Long)): Long = {
      val dx = p._1 - q._1; val dy = p._2 - q._2; dx * dx + dy * dy
    }
    def directed(xs: Seq[(Long, Long)], ys: Seq[(Long, Long)]): Long =
      xs.map(x => ys.map(y => d2(x, y)).min).max
    math.max(directed(a, b), directed(b, a))
  }

  private def run(trails: Map[String, Seq[(Long, Long)]]): Map[(String, String), (Long, Long)] = {
    import spark.implicits._
    val rows = trails.toSeq.flatMap { case (u, ps) =>
      ps.zipWithIndex.map { case ((x, y), i) => (u, i.toLong, x, y) }
    }
    TrajectorySim.hausdorffPairs(rows.toDF("url", "ent_idx", "lonm", "latm"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
  }

  test("planted trails: brute-force parity, exactly-once pairing, side counts") {
    // three trails starting in the same block, one in a different block
    val trails = Map(
      "u1" -> Seq((10L, 10L), (50L, 40L), (200L, 90L)),
      "u2" -> Seq((15L, 12L), (48L, 44L)),
      "u3" -> Seq((110L, 20L), (500L, 600L), (510L, 610L), (520L, 620L)),
      "far" -> Seq((5000L, 2000L), (5010L, 2010L)))
    val got = run(trails)
    val inBlock = Seq("u1", "u2", "u3")
    val wantPairs = (for {
      a <- inBlock; b <- inBlock if a < b
    } yield (a, b)).toSet
    assert(got.keySet === wantPairs, "co-started pairs only, each once")
    for ((a, b) <- wantPairs) {
      val (nSides, h2) = got((a, b))
      assert(nSides === trails(a).size.toLong + trails(b).size.toLong, s"$a-$b sides")
      assert(h2 === hausdorff2(trails(a), trails(b)), s"$a-$b hausdorff")
    }
  }

  test("identical co-started trails have Hausdorff 0; direction asymmetry resolves to the max") {
    val a = Seq((0L, 0L), (30L, 30L))
    // b covers a plus a distant excursion: directed a->b is 0 but
    // directed b->a is large — the symmetric form must pick the excursion
    val b = a :+ (100L, 119L)
    val got = run(Map("t1" -> a, "t2" -> a, "t3" -> b))
    assert(got((("t1"), ("t2")))._2 === 0L)
    val exc = hausdorff2(a, b)
    assert(exc === (100L - 30L) * (100L - 30L) + (119L - 30L) * (119L - 30L))
    assert(got((("t1"), ("t3")))._2 === exc)
  }

  test("fixture slice: matches a full brute force over the ents table") {
    import spark.implicits._
    val ents = graft.Pipeline.entities(spark, Sf)
      .select("url", "ent_idx", "lonm", "latm")
      .as[(String, Long, Long, Long)].collect()
    val trails = ents.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
    }
    val byBlock = trails.toSeq.map { case (u, ps) =>
      (ps.head._1 / B, ps.head._2 / B) -> u
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val want = byBlock.values.flatMap { us =>
      for { i <- us.indices; j <- i + 1 until us.size }
        yield (us(i), us(j)) ->
          ((trails(us(i)).size + trails(us(j)).size).toLong,
            hausdorff2(trails(us(i)), trails(us(j))))
    }.toMap
    val got = TrajectorySim.hausdorffPairs(
      graft.Pipeline.entities(spark, Sf).select("url", "ent_idx", "lonm", "latm"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === want)
    assert(got.nonEmpty, "fixture must produce co-started pairs")
  }
}
