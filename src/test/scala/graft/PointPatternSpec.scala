package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.PointPattern

class PointPatternSpec extends AnyFunSuite with SparkTest {

  private def key(x: Long, y: Long) = x * PointPattern.KeyMul + y

  /** Brute-force DBSCAN on (id, x, y) points — textbook definition:
    * core iff |N_eps| >= minPts counting self; clusters = CC over core
    * points; border joins the MIN core-neighbor's cluster label (the
    * deterministic tie-break the operator pins); labels are the min coord
    * key in the component. */
  private def bruteDbscan(pts: Seq[(Long, Long)], eps: Long, minPts: Long): Map[(Long, Long), Long] = {
    val mult = pts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cs = mult.keys.toSeq
    def within(a: (Long, Long), b: (Long, Long)) = {
      val dx = a._1 - b._1; val dy = a._2 - b._2
      dx * dx + dy * dy <= eps * eps
    }
    val core = cs.filter(a => cs.filter(within(a, _)).map(mult).sum >= minPts).toSet
    // CC over core coords via label propagation to fixpoint
    var lbl = core.map(c => c -> key(c._1, c._2)).toMap
    var changed = true
    while (changed) {
      changed = false
      for (a <- core; b <- core if within(a, b) && lbl(b) < lbl(a)) {
        lbl += a -> lbl(b); changed = true
      }
    }
    val border = cs.filterNot(core).flatMap { a =>
      val cn = core.filter(within(a, _))
      if (cn.isEmpty) None else Some(a -> cn.map(lbl).min)
    }.toMap
    cs.map(c => c -> lbl.getOrElse(c, border.getOrElse(c, -1L))).toMap
  }

  test("dbscan == brute force on a planted 3-cluster + noise layout") {
    import spark.implicits._
    // cluster A: dense 3x3 block; B: a chain connected by eps=2 steps;
    // C: a coord that only cores via multiplicity; plus isolated noise
    // and a border point
    val pts: Seq[(Long, Long)] =
      (for { x <- 100L to 102L; y <- 200L to 202L } yield (x, y)) ++
        Seq((104L, 200L)) ++ // border of A (dist 2 from (102,200)) if not core
        Seq((300L, 300L), (302L, 300L), (304L, 300L), (306L, 300L), (308L, 300L)) ++
        (0 until 5).map(_ => (500L, 500L)) ++ // multiplicity-only core
        Seq((700L, 700L), (900L, 100L)) // noise
    val df = pts.zipWithIndex.map { case ((x, y), i) =>
      (s"u$i", i.toLong, x, y)
    }.toDF("url", "ent_idx", "lonm", "latm")
    val eps = 2L; val minPts = 5L
    val got = PointPattern.dbscan(df, eps, minPts)
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    val want = bruteDbscan(pts, eps, minPts)
    pts.zipWithIndex.foreach { case (p, i) =>
      assert(got(i.toLong) === want(p), s"point $i at $p")
    }
    // structure asserts so the fixture provably exercises each path
    val aLbl = want((100L, 200L))
    assert((for { x <- 100L to 102L; y <- 200L to 202L } yield want((x, y))).forall(_ === aLbl),
      "block A is one cluster")
    assert(want((104L, 200L)) === aLbl, "border point inherits A")
    assert(!bruteDbscanCore(pts, eps, minPts).contains((104L, 200L)), "border is not core")
    val bLbls = Seq((300L, 300L), (302L, 300L), (304L, 300L), (306L, 300L), (308L, 300L)).map(want)
    assert(bLbls.distinct.size === 1 && bLbls.head != aLbl, "chain B is its own cluster")
    assert(want((500L, 500L)) === key(500L, 500L), "multiplicity-only isolated core self-labels")
    assert(want((700L, 700L)) === -1L && want((900L, 100L)) === -1L, "noise")
  }

  private def bruteDbscanCore(pts: Seq[(Long, Long)], eps: Long, minPts: Long): Set[(Long, Long)] = {
    val mult = pts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cs = mult.keys.toSeq
    cs.filter { a =>
      cs.filter { b =>
        val dx = a._1 - b._1; val dy = a._2 - b._2
        dx * dx + dy * dy <= eps * eps
      }.map(mult).sum >= minPts
    }.toSet
  }

  test("dbscan == brute force on the whole sf fixture; clusters and noise both appear") {
    import spark.implicits._
    val ents = graft.Pipeline.entities(spark, Sf)
      .select(col("url"), col("ent_idx").cast("long").as("ent_idx"), col("lonm"), col("latm"))
    val rows = ents.as[(String, Long, Long, Long)].collect()
    val want = bruteDbscan(rows.map(r => (r._3, r._4)).toSeq,
      PointPattern.DbscanEps, PointPattern.DbscanMinPts)
    val got = PointPattern.dbscan(ents)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === rows.length)
    rows.foreach { case (url, idx, x, y) =>
      assert(got((url, idx)) === want((x, y)), s"$url#$idx at ($x, $y)")
    }
    // the fixture exercises both outcomes: the urban coords (multiplicity
    // ~17 each at this SF) are cores, the spread background has noise
    val lbls = got.values.toSet
    assert(lbls.contains(-1L), "noise exists in the spread background")
    assert(lbls.exists(_ >= 0L), "clusters exist")
  }

  test("nnDistance == brute force; co-located = 0; far stragglers resolve in late rounds") {
    import spark.implicits._
    // two co-located points, a tight pair, and stragglers whose NN is
    // past the first (r=16) round — exercising the multiplicity
    // shortcut and multiple radius-growing rounds
    val pts: Seq[(Long, Long)] = Seq(
      (10L, 10L), (10L, 10L),       // multiplicity -> 0
      (20L, 10L), (21L, 10L),       // d2 = 1 (round 1)
      (100L, 100L), (105L, 100L),   // d2 = 25 (round 2: r=8)
      (3000L, 2000L),               // NN far away (late round)
      (5000L, 300L))                // NN far away (late round)
    val df = pts.zipWithIndex.map { case ((x, y), i) => (s"u$i", i.toLong, x, y) }
      .toDF("url", "ent_idx", "lonm", "latm")
    val got = PointPattern.nnDistance(df)
      .as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      val want =
        if (pts.count(_ == ((x, y))) >= 2) 0L
        else pts.filter(_ != ((x, y)))
          .map { case (bx, by) => (x - bx) * (x - bx) + (y - by) * (y - by) }.min
      assert(got(i.toLong) === want, s"point $i at ($x, $y)")
    }
    assert(got(0L) === 0L && got(1L) === 0L)
    assert(got(2L) === 1L && got(5L) === 25L)
    assert(got(6L) > 64L, "straggler unresolved by round 2")
  }

  test("nnDistance == brute force on the whole sf fixture") {
    import spark.implicits._
    val ents = graft.Pipeline.entities(spark, Sf)
      .select(col("url"), col("ent_idx").cast("long").as("ent_idx"), col("lonm"), col("latm"))
    val rows = ents.as[(String, Long, Long, Long)].collect()
    val coords = rows.map(r => (r._3, r._4))
    val mult = coords.groupBy(identity).map { case (k, v) => k -> v.size }
    val got = PointPattern.nnDistance(ents)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val distinct = mult.keys.toArray
    rows.foreach { case (url, idx, x, y) =>
      val want =
        if (mult((x, y)) >= 2) 0L
        else distinct.filter(_ != ((x, y)))
          .map { case (bx, by) => (x - bx) * (x - bx) + (y - by) * (y - by) }.min
      assert(got((url, idx)) === want, s"$url#$idx at ($x, $y)")
    }
  }

  test("crossK == brute-force quadratic cross count; disjoint classes need no self-pair correction") {
    import spark.implicits._
    val rows: Seq[(Long, Long, String)] =
      (0 until 40).map(i => ((i * 37L) % 30, (i * 53L) % 25, "en")) ++
        (0 until 50).map(i => ((i * 41L) % 30, (i * 59L) % 25, if (i % 2 == 0) "de" else "fr")) ++
        (0 until 6).map(_ => (10L, 10L, "en")) ++ // stacked A points on a B coord
        (0 until 4).map(_ => (10L, 10L, "zh"))
    val df = rows.toDF("lonm", "latm", "lang")
    val radii = Seq(2L, 8L)
    val got = PointPattern.crossK(df, "lang", "en", radii)
      .as[(Long, Long)].collect().toMap
    radii.foreach { r =>
      val want = (for {
        (ax, ay, la) <- rows if la == "en"
        (bx, by, lb) <- rows if lb != "en"
        dx = ax - bx; dy = ay - by if dx * dx + dy * dy <= r * r
      } yield 1L).sum
      assert(got(r) === want, s"r=$r")
    }
    // the stacked coord alone contributes 6*4 = 24 zero-distance pairs
    assert(got(2L) >= 24L)
    assert(got(2L) <= got(8L), "monotone in r")
  }

  test("ripleyPairs == brute-force quadratic count; monotone in r; self-pairs excluded") {
    import spark.implicits._
    val pts: Seq[(Long, Long)] = (0 until 60).map { i =>
      ((i * 37L) % 50, (i * 53L) % 40)
    } ++ (0 until 10).map(_ => (25L, 25L)) // heavy multiplicity
    val df = pts.toDF("lonm", "latm")
    val radii = Seq(1L, 2L, 4L, 8L)
    val got = PointPattern.ripleyPairs(df, radii)
      .as[(Long, Long)].collect().toMap
    radii.foreach { r =>
      val want = (for {
        (a, i) <- pts.zipWithIndex; (b, j) <- pts.zipWithIndex if i != j
        dx = a._1 - b._1; dy = a._2 - b._2 if dx * dx + dy * dy <= r * r
      } yield 1L).sum
      assert(got(r) === want, s"r=$r")
    }
    assert(radii.map(got).sliding(2).forall(s => s(0) <= s(1)), "monotone in r")
    // the multiplicity coord alone contributes 10*9 ordered pairs at r=1
    assert(got(1L) >= 90L)
  }
}
