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
}
