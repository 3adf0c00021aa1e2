package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LinkGraph

class BowTieSpec extends AnyFunSuite with SparkTest {

  test("planted bow-tie classifies every region correctly") {
    import spark.implicits._
    // core: 0 <-> 1 <-> 2 -> 0 cycle; in: 10 -> 11 -> 0; out: 2 -> 20 -> 21;
    // tendril off the in-region: 11 -> 30 (reaches nothing that reaches
    // the pivot, not reached from it); disconnected: 40 -> 41
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 0L),
      (2L, 20L), (20L, 21L),
      (11L, 30L),
      (40L, 41L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 20L, 21L, 30L, 40L, 41L).toDF("doc_id")
    val pivot = Seq(0L).toDF("doc_id")
    val cls = LinkGraph.bowTie(nodes, edges, pivot).as[(Long, String)]
      .collect().toMap
    assert(Seq(0L, 1L, 2L).forall(cls(_) == "core"), cls)
    assert(Seq(10L, 11L).forall(cls(_) == "in"), cls)
    assert(Seq(20L, 21L).forall(cls(_) == "out"), cls)
    // 30 is forward-reachable from the pivot? 0->1->2->0... no edge into 30
    // from the core; 30 only hangs off 11 (an IN node) -> tendril = other
    assert(Seq(30L, 40L, 41L).forall(cls(_) == "other"), cls)
  }

  test("fixture graph parity with brute-force capped reach") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
      .filter { case (s, d) => (s + d) % 3 == 0 }
    val nodes = docs.select("doc_id").as[Long].collect()
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    def reach(adj: Map[Long, Set[Long]]): Set[Long] = {
      var cur = Set(0L)
      for (_ <- 1 to LinkGraph.BowTieHops)
        cur = cur ++ cur.flatMap(v => adj.getOrElse(v, Set.empty))
      cur
    }
    val f = reach(out); val b = reach(in)
    val want = nodes.map { v =>
      v -> (if (f(v) && b(v)) "core" else if (b(v)) "in"
            else if (f(v)) "out" else "other")
    }.toMap
    val got = LinkGraph.docBowTie(spark, Sf).as[(Long, String)].collect().toMap
    assert(got === want)
    assert(got.values.toSet.size >= 3, "fixture graph must expose regions")
  }
}
