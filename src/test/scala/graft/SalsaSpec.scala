package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LinkGraph

class SalsaSpec extends AnyFunSuite with SparkTest {

  test("SALSA equals the brute-force integer iterate on the fixture graph") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
    val nodes = docs.select("doc_id").as[Long].collect().sorted
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ideg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    var h = nodes.map(_ -> LinkGraph.Scale).toMap
    var a = nodes.map(_ -> LinkGraph.Scale).toMap
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val t = raw.values.sum
      nodes.map(n => n -> raw.get(n).map(r => r * LinkGraph.Scale / t).getOrElse(0L)).toMap
    }
    for (_ <- 1 to 3) {
      a = norm(edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1) / odeg(e._1)).sum).toMap)
      h = norm(edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2) / ideg(e._2)).sum).toMap)
    }
    val want = nodes.map(n => (n, h(n), a(n))).toSet

    val got = LinkGraph.docSalsa(spark, Sf).as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("TKC resistance: the dense ring that dominates HITS does not dominate SALSA") {
    import spark.implicits._
    // tightly-knit community: nodes 0..3 form a complete directed 4-ring
    // (12 edges); the "organic" authority 10 is cited by 5 independent
    // hubs 11..15 that cite nothing else
    val tkc = for { i <- 0L to 3L; j <- 0L to 3L if i != j } yield (i, j)
    val organic = (11L to 15L).map(_ -> 10L)
    val edges = (tkc ++ organic).toDF("src", "dst")
    val nodes = ((0L to 3L) ++ (10L to 15L)).toDF("doc_id")

    val hitsA = LinkGraph.hits(nodes, edges).as[(Long, Long, Long)]
      .collect().map(t => t._1 -> t._3).toMap
    val salsaA = LinkGraph.salsa(nodes, edges).as[(Long, Long, Long)]
      .collect().map(t => t._1 -> t._3).toMap

    // HITS: every ring member outranks the organic authority (the TKC
    // effect — raw sums reward density)
    assert((0L to 3L).forall(n => hitsA(n) > hitsA(10L)),
      s"HITS should let the ring dominate: $hitsA")
    // SALSA: degree division caps the ring's mass; the organic authority
    // with 5 independent citers beats each ring member (3 citers each)
    assert((0L to 3L).forall(n => salsaA(10L) > salsaA(n)),
      s"SALSA should resist the TKC: $salsaA")
  }
}
