package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LinkGraph

class KCoreSpec extends AnyFunSuite with SparkTest {

  /** Unbounded reference peel: the true k-core. */
  private def brute(edges: Seq[(Long, Long)], k: Long): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).toSet }
    var alive = adj.keySet
    var changed = true
    while (changed) {
      val next = alive.filter(u => (adj(u) & alive).size >= k)
      changed = next != alive
      alive = next
    }
    alive.map(u => u -> (adj(u) & alive).size.toLong).toMap
  }

  test("planted: a 5-clique survives the 4-core, its tail chain peels away") {
    import spark.implicits._
    val clique = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val tail = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val edges = (clique ++ tail).toDF("src", "dst")
    val nodes = (0L to 12L).toDF("doc_id")
    val got = LinkGraph.kCore(nodes, edges, k = 4L, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === brute(clique ++ tail, 4L))
    assert(got.keySet === (0L to 4L).toSet, "exactly the clique")
    assert(got.values.forall(_ === 4L), "every clique node keeps degree 4")
  }

  test("fixture: bounded peel reaches the true 4-core fixpoint; survivor degrees >= k") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs)
      .filter((org.apache.spark.sql.functions.col("src")
        + org.apache.spark.sql.functions.col("dst")) % 3 =!= 0)
      .as[(Long, Long)].collect().toSeq
    val want = brute(edges, LinkGraph.KCoreK)
    val got = LinkGraph.docKCore(docs).as[(Long, Long)].collect().toMap
    assert(got === want, "9-round peel == unbounded fixpoint on the fixture")
    assert(got.nonEmpty && got.size < 500, "proper nonempty core")
    assert(got.values.forall(_ >= LinkGraph.KCoreK), "in-core degree certificate")
  }
}
