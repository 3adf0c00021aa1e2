package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.LinkGraph

class TrustRankSpec extends AnyFunSuite with SparkTest {

  test("TrustRank equals the brute-force integer iterate on the fixture graph") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
    val nodes = docs.select("doc_id").as[Long].collect().sorted
    val seeds = nodes.filter(_ % LinkGraph.TrustSeedMod == 0).toSet

    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var tr = nodes.map(n => n -> (if (seeds(n)) LinkGraph.Scale else 0L)).toMap
    for (_ <- 1 to 5) {
      val s = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _) =>
          math.floor(tr(src).toDouble / deg(src)).toLong }.sum).toMap
      tr = nodes.map { n =>
        val tel = if (seeds(n)) LinkGraph.Teleport else 0L
        n -> (tel + math.floor(0.85 * s.getOrElse(n, 0L)).toLong)
      }.toMap
    }
    val want = nodes.map(n => (n, tr(n))).toSet

    val got = LinkGraph.docTrustRank(spark, Sf).as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("trust flows from seeds only: unreachable nodes score 0, seeds stay funded") {
    import spark.implicits._
    // seed 0 -> 1 -> 2; node 3 links to the seed but nothing links to 3
    val nodes = (0L to 3L).toDF("doc_id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 0L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("doc_id")
    val r = LinkGraph.trustRank(nodes, edges, seeds, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(3L) === 0L, "a node unreachable from the seed set must score 0")
    assert(r(0L) >= LinkGraph.Teleport, "a seed keeps at least its teleport mass")
    assert(r(1L) > r(2L), "trust decays with distance from the seed")
    assert(r(1L) > 0L && r(2L) > 0L, "reachable nodes receive flowed trust")
  }

  test("assortativity moment sums equal the brute force on the fixture graph") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
    val od = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val id = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val xy = edges.map { case (s, d) => (od(s), id(d)) }
    val want = (xy.length.toLong, xy.map(_._1).sum, xy.map(_._2).sum,
      xy.map(p => p._1 * p._2).sum, xy.map(p => p._1 * p._1).sum,
      xy.map(p => p._2 * p._2).sum)
    val got = LinkGraph.assortativity(
      LinkGraph.synthEdges(docs)).as[(Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(got === want)
  }

  test("assortativity sign: a hub-and-spoke star mixes disassortatively") {
    import spark.implicits._
    // 5 leaves -> hub, hub -> 5 other leaves: high-in meets out-degree 1
    val edges = ((1L to 5L).map(_ -> 0L) ++ (6L to 10L).map(0L -> _)).toDF("src", "dst")
    val r = LinkGraph.assortativity(edges)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (m, sx, sy, sxy, _, _) = r
    assert(m === 10L)
    assert(m * sxy - sx * sy < 0L, "star graph: Pearson numerator must be negative")
  }

  test("co-citation equals the brute force on the fixture graph") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
    val want = edges.groupBy(_._1).values
      .flatMap { out =>
        val ds = out.map(_._2).sorted
        for (i <- ds.indices; j <- i + 1 until ds.length) yield (ds(i), ds(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= LinkGraph.CoCiteMin)
      .map { case ((a, b), n) => (a, b, n) }.toSet
    assert(want.nonEmpty, "fixture must exercise the min-support filter")
    val got = LinkGraph.docCoCitation(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("co-citation cap: a planted mega-hub's pairs are excluded") {
    import spark.implicits._
    // hub 99 cites 0..9 (deg 10 > cap 4); honest pages 1,2 both cite {5,6}
    val edges = ((0L to 9L).map(99L -> _) ++
      Seq(1L -> 5L, 1L -> 6L, 2L -> 5L, 2L -> 6L)).toDF("src", "dst")
    val r = LinkGraph.coCitation(edges, maxOutDeg = 4, minCommon = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(r === Set((5L, 6L, 2L)),
      "only the honest co-citation survives; the hub's 45 pairs are dropped")
  }
}
