package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LinkGraph

class HitsSpec extends AnyFunSuite with SparkTest {

  test("HITS equals the brute-force integer iterate on the fixture graph") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
    val nodes = docs.select("doc_id").as[Long].collect().sorted

    var h = nodes.map(_ -> LinkGraph.Scale).toMap
    var a = nodes.map(_ -> LinkGraph.Scale).toMap
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val t = raw.values.sum
      nodes.map(n => n -> raw.get(n).map(r => r * LinkGraph.Scale / t).getOrElse(0L)).toMap
    }
    for (_ <- 1 to 3) {
      a = norm(edges.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap)
      h = norm(edges.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap)
    }
    val want = nodes.map(n => (n, h(n), a(n))).toSet

    val got = LinkGraph.docHits(spark, Sf).as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("scores discriminate: spread is nonzero and a planted super-authority wins") {
    import spark.implicits._
    // star graph: hubs 1..5 all cite node 0; node 0 cites node 6
    val edges = ((1L to 5L).map(_ -> 0L) :+ (0L -> 6L)).toDF("src", "dst")
    val nodes = (0L to 6L).toDF("doc_id")
    val r = LinkGraph.hits(nodes, edges).as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert((1L to 6L).forall(n => r(0)._2 > r(n)._2),
      "node 0 must be the dominant authority")
    assert((1L to 5L).forall(n => r(n)._1 > r(0)._1),
      "the five citing hubs must outrank node 0's hub score")
    assert(r(6)._1 === 0L, "a sink has hub score 0")
    assert((1L to 5L).forall(n => r(n)._2 === 0L), "uncited nodes have authority 0")
  }
}
