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

  test("link delta: hand-built snapshots classify kept/added/removed") {
    import spark.implicits._
    val t1 = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("src", "dst")
    val t2 = Seq((1L, 2L), (1L, 6L)).toDF("src", "dst")
    val got = HostGraph.linkDelta(t1, t2).as[(String, String, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got(("d1.example.com", "kept")) === 1L)    // (1,2)
    assert(got(("d1.example.com", "added")) === 1L)   // (1,6)
    assert(got(("d1.example.com", "removed")) === 1L) // (1,3)
    assert(got(("d4.example.com", "removed")) === 1L) // (4,5)
    assert(got.size === 4)
  }

  test("fixture snapshots: all three statuses populated, totals consistent") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val e1 = LinkGraph.synthEdges(docs)
    val e2 = HostGraph.edgesT2(docs, e1)
    val got = HostGraph.docLinkDelta(spark, Sf).as[(String, String, Long)].collect()
    val byStatus = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byStatus.keySet === Set("kept", "added", "removed"), byStatus)
    // kept + removed = |e1|, kept + added = |e2|
    assert(byStatus("kept") + byStatus("removed") === e1.count())
    assert(byStatus("kept") + byStatus("added") === e2.count())
    // every dead page's links are removed: no t2 edge has src % 17 == 0
    assert(e2.filter($"src" % 17 === 0).count() === 0L)
  }
}
