package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{HostGraph, LinkGraph}

class HostGraphSpec extends AnyFunSuite with SparkTest {

  test("hand-built edges contract with multiplicity and distinct support") {
    import spark.implicits._
    // pages 1, 41 share host d1; 7, 14 are both hot; 2 is d2
    val edges = Seq(
      (1L, 2L), (41L, 2L),          // d1 -> d2 from two distinct pages
      (1L, 7L), (1L, 14L),          // d1 -> hot twice from ONE page
      (7L, 14L)).toDF("src", "dst") // hot -> hot (intra-host diagonal)
    val got = HostGraph.contract(edges).as[(String, String, Long, Long)]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(got(("d1.example.com", "d2.example.com")) === ((2L, 2L)))
    assert(got(("d1.example.com", "hot.example.com")) === ((2L, 1L)),
      "two links but one distinct source page")
    assert(got(("hot.example.com", "hot.example.com")) === ((1L, 1L)))
    assert(got.size === 3)
  }

  test("fixture graph: totals conserve and the planted hot host is the hub") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val nEdges = LinkGraph.synthEdges(docs).count()
    val hg = HostGraph.docHostGraph(spark, Sf)
      .as[(String, String, Long, Long)].collect()
    assert(hg.map(_._3).sum === nEdges, "contraction conserves edge count")
    assert(hg.forall { case (_, _, links, pages) => pages <= links })
    // hot.example.com holds 1/7 of pages vs 1/40-ish for d* hosts: its
    // total in-weight must beat every individual d* host's
    val inW = hg.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val hot = inW("hot.example.com")
    assert(inW.filterKeys(_ != "hot.example.com").values.forall(_ < hot),
      s"hot host must dominate in-weight: $hot vs ${inW.toMap}")
  }
}
