package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{HostGraph, LinkGraph}

class PageRankIncrementalSpec extends AnyFunSuite with SparkTest {

  test("fixture: warm-start equals brute-force continue, never worse than cold") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val nodes = docs.select("doc_id")
    val e1df = LinkGraph.synthEdges(docs).localCheckpoint()
    val e2df = HostGraph.edgesT2(docs, e1df).localCheckpoint()
    val e2 = e2df.as[(Long, Long)].collect()
    val ids = nodes.as[Long].collect().sorted

    // brute-force integer iterate, mirroring pageRank's op sequence
    def iterate(edges: Array[(Long, Long)], start: Map[Long, Long],
                rounds: Int): Map[Long, Long] = {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var pr = start
      for (_ <- 1 to rounds) {
        val sums = edges.groupBy(_._2).view.mapValues(
          _.map(e => math.floor(pr(e._1).toDouble / deg(e._1)).toLong).sum).toMap
        pr = ids.map(v => v -> (LinkGraph.Teleport +
          math.floor(0.85 * sums.getOrElse(v, 0L)).toLong)).toMap
      }
      pr
    }
    val uniform = ids.map(_ -> LinkGraph.Scale).toMap
    val old = iterate(e1df.as[(Long, Long)].collect(), uniform, 5)

    val got = LinkGraph.docPageRankIncremental(spark, Sf)
      .as[(Long, Long)].collect().toMap
    val want = iterate(e2, old, 2)
    assert(got === want)

    // on the fixture's near-uniform-fixpoint k-out graph the warm start
    // is only marginally better — assert it is at least never worse
    val fixF = iterate(e2, uniform, 20)
    def l1F(a: Map[Long, Long]) = ids.map(v => math.abs(a(v) - fixF(v))).sum
    assert(l1F(want) <= l1F(iterate(e2, uniform, 2)),
      "warm start must never be worse than cold on the fixture")
  }

  test("planted star: warm repair crushes a cold restart (>5x closer)") {
    import spark.implicits._
    // hub graph: fixpoint FAR from uniform (hub absorbs ~all mass) —
    // the regime incremental maintenance exists for
    val ids = (0L until 100L).toArray
    val e1 = ids.filter(_ > 0).map(_ -> 0L) :+ (0L -> 1L)
    // small delta: node 50 re-points its link from the hub to 51
    val e2 = e1.filter(_ != (50L -> 0L)) :+ (50L -> 51L)

    def iterate(edges: Array[(Long, Long)], start: Map[Long, Long],
                rounds: Int): Map[Long, Long] = {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var pr = start
      for (_ <- 1 to rounds) {
        val sums = edges.groupBy(_._2).view.mapValues(
          _.map(e => math.floor(pr(e._1).toDouble / deg(e._1)).toLong).sum).toMap
        pr = ids.map(v => v -> (LinkGraph.Teleport +
          math.floor(0.85 * sums.getOrElse(v, 0L)).toLong)).toMap
      }
      pr
    }
    val uniform = ids.map(_ -> LinkGraph.Scale).toMap
    // a well-converged previous snapshot (the hub<->1 2-cycle contracts
    // at 0.85^2 per round pair, so 5 rounds still carries residual)
    val old = iterate(e1, uniform, 10)

    // distributed warm repair == brute force
    val nodes = ids.toSeq.toDF("doc_id")
    val got = LinkGraph.pageRankFrom(nodes, e2.toSeq.toDF("src", "dst"),
      old.toSeq.toDF("doc_id", "pr"), 2).as[(Long, Long)].collect().toMap
    val warm = iterate(e2, old, 2)
    assert(got === warm)

    val fix = iterate(e2, uniform, 30)
    def l1(a: Map[Long, Long]) = ids.map(v => math.abs(a(v) - fix(v))).sum
    val dw = l1(warm); val dc = l1(iterate(e2, uniform, 2))
    assert(dw * 5 < dc,
      s"warm must be >5x closer to the new fixpoint: warm=$dw cold=$dc")
  }
}
