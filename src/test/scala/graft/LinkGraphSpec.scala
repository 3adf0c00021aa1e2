package graft

import org.scalatest.funsuite.AnyFunSuite

class LinkGraphSpec extends AnyFunSuite with SparkTest {

  test("integer PageRank == brute-force reference; ranks differentiate") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val n = docs.count().toInt
    // brute-force reference off the same closed-form edge list
    val edges = (0 until n).flatMap { i =>
      (0L to 2 + i % 3).map(j => (i.toLong, (i * 31 + j * 17 + 7) % n))
    }.filter { case (s, d) => s != d }.distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val inEdges = edges.groupBy(_._2)
    var pr = Array.fill(n)(graft.ops.LinkGraph.Scale)
    for (_ <- 1 to 5) {
      val next = Array.ofDim[Long](n)
      for (d <- 0 until n) {
        val s = inEdges.getOrElse(d.toLong, Nil)
          .map { case (src, _) => math.floor(pr(src.toInt).toDouble / outdeg(src)).toLong }
          .sum
        next(d) = graft.ops.LinkGraph.Teleport + math.floor(0.85 * s).toLong
      }
      pr = next
    }
    val got = graft.ops.LinkGraph.docPageRank(spark, Sf)
      .as[(Long, Long)].collect().toMap
    assert(got.size === n)
    (0 until n).foreach(i => assert(got(i.toLong) === pr(i), s"doc $i"))
    // the graph must actually differentiate ranks (not a regular lattice)
    assert(pr.distinct.length > 10)
    // and mass is roughly conserved (no dangling nodes by construction)
    val total = pr.sum.toDouble / (n.toLong * graft.ops.LinkGraph.Scale)
    assert(total > 0.9 && total < 1.01, s"mass $total")
  }

  test("triangles == brute-force per-node count; orientation emits each once") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val n = docs.count().toInt
    val und = (0 until n).flatMap { i =>
      (0L to 2 + i % 3).map(j => (i.toLong, (i * 31 + j * 17 + 7) % n))
    }.filter { case (s, d) => s != d }
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct.toSet
    val adj = und.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var nTri = 0L
    for ((a, b) <- und; c <- adj.getOrElse(a, Set.empty) if c > b && und((b, c))) {
      nTri += 1
      Seq(a, b, c).foreach(v => triPerNode(v) += 1)
    }
    val got = graft.ops.LinkGraph.docTriangles(spark, Sf)
      .as[(Long, Long)].collect().toMap
    assert(got.size === n)
    assert(nTri > 0, "fixture graph must contain triangles")
    (0 until n).foreach(i => assert(got(i.toLong) === triPerNode(i.toLong), s"doc $i"))
    // total incidence = 3 * number of triangles (each counted exactly once)
    assert(got.values.sum === 3 * nTri)
  }

  test("BFS hops == brute-force reference on the sf fixture graph") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val n = docs.count().toInt
    val adj = (0 until n).flatMap { i =>
      (0L to 2 + i % 3).map(j => (i.toLong, (i * 31 + j * 17 + 7) % n))
    }.filter { case (s, d) => s != d }.distinct
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
    val want = Array.fill(n)(-1L)
    var frontier = (0 until n).filter(_ % graft.ops.LinkGraph.BfsSeedMod == 0).map(_.toLong)
    frontier.foreach(v => want(v.toInt) = 0L)
    for (r <- 1 to graft.ops.LinkGraph.BfsMaxHops) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).distinct
        .filter(v => want(v.toInt) == -1L)
      frontier.foreach(v => want(v.toInt) = r.toLong)
    }
    val got = graft.ops.LinkGraph.docBfsHops(spark, Sf)
      .as[(Long, Long)].collect().toMap
    assert(got.size === n)
    (0 until n).foreach(i => assert(got(i.toLong) === want(i), s"doc $i"))
    // the fixture must exercise seeds, several hop levels, and ideally the
    // unreached label; at minimum hops 0..2 appear
    assert(Set(0L, 1L, 2L).subsetOf(want.toSet), s"hop levels: ${want.distinct.sorted.toSeq}")
  }

  test("BFS: chain graph gives exact depths, cap cuts it, frontier exhausts early") {
    import spark.implicits._
    // directed chain 0 -> 1 -> ... -> 9 plus an isolated node 10
    val edges = (0L until 9L).map(v => (v, v + 1)).toDF("src", "dst")
    val nodes = (0L to 10L).toDF("doc_id")
    val seeds = Seq(0L).toDF("doc_id")
    val capped = graft.ops.LinkGraph.bfsHops(nodes, edges, seeds, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    (0L to 4L).foreach(v => assert(capped(v) === v, s"node $v"))
    (5L to 10L).foreach(v => assert(capped(v) === -1L, s"node $v past the cap"))
    // a cap beyond the diameter terminates via the empty-frontier exit and
    // still labels everything reachable
    val full = graft.ops.LinkGraph.bfsHops(nodes, edges, seeds, maxHops = 50)
      .as[(Long, Long)].collect().toMap
    (0L to 9L).foreach(v => assert(full(v) === v))
    assert(full(10L) === -1L, "isolated node stays unreached")
    // multi-source: nearest seed wins
    val two = graft.ops.LinkGraph.bfsHops(nodes, edges, Seq(0L, 7L).toDF("doc_id"), 50)
      .as[(Long, Long)].collect().toMap
    assert(two(8L) === 1L && two(9L) === 2L && two(6L) === 6L)
  }

  test("triangles: planted hub stays bounded — oriented out-degree caps fan-out") {
    import spark.implicits._
    // star graph (hub 0 to 1..100) + one triangle 1-2 edge: the hub's
    // ORIENTED out-degree must be ~0 (highest degree => sink), so the
    // wedge join never fans out hub-squared; and the only triangle is
    // (0,1,2)
    val edges = ((1L to 100L).map(v => (0L, v)) :+ (1L, 2L)).toDF("src", "dst")
    val nodes = (0L to 100L).toDF("doc_id")
    val got = graft.ops.LinkGraph.triangles(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got(0L) === 1 && got(1L) === 1 && got(2L) === 1)
    assert((3L to 100L).forall(got(_) === 0))
  }
}
