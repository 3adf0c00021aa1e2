package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Funnel

class FunnelSpec extends AnyFunSuite with SparkTest {

  /** Independent reference: ordered-subsequence search per user. */
  private def brute(evs: Seq[(Long, Long, Long, String)]): Map[Long, Long] =
    evs.groupBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._4)
      var depth = 0
      for (e <- ordered if depth < Funnel.Steps.size && e == Funnel.Steps(depth))
        depth += 1
      u -> depth.toLong
    }

  private def run(evs: Seq[(Long, Long, Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    Funnel.depthOf(evs.toDF("user_id", "event_id", "us", "event_type"))
      .as[(Long, Long)].collect().toMap
  }

  test("planted users: order matters, ties break by event_id, wrong order scores shallow") {
    val evs = Seq(
      // u1: full funnel in order
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "click"), (1L, 3L, 30L, "purchase"),
      // u2: purchase BEFORE the click chain completes -> depth 2
      (2L, 4L, 10L, "purchase"), (2L, 5L, 20L, "view"), (2L, 6L, 30L, "click"),
      // u3: click only -> depth 0 (no view first)
      (3L, 7L, 10L, "click"), (3L, 8L, 20L, "error"),
      // u4: same-timestamp view then click (event_id order) -> depth 2
      (4L, 9L, 10L, "view"), (4L, 10L, 10L, "click"),
      // u5: same-timestamp click then view (click's id smaller) -> depth 1
      (5L, 11L, 10L, "click"), (5L, 12L, 10L, "view"))
    val got = run(evs)
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 2L, 5L -> 1L))
    assert(got === brute(evs))
  }

  test("greedy first-match subsequence equals the window-chain semantics on interleaved noise") {
    val evs = (for {
      u <- 1L to 20L
      (i, e) <- Seq("error", "view", "signup", "click", "error", "view",
        "purchase", "click").zipWithIndex.map { case (e, i) => (i.toLong, e) }
    } yield (u, u * 100 + i, i * 7 % 5 * 10 + i, e)).toSeq
    assert(run(evs) === brute(evs))
  }

  test("fixture events: brute-force parity; funnel is monotone non-increasing") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$Sf/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP))", "event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val got = run(evs)
    assert(got === brute(evs))
    val byDepth = (0L to 3L).map(d => got.values.count(_ >= d))
    assert(byDepth.sliding(2).forall { case Seq(a, b) => a >= b },
      s"funnel counts non-increasing: $byDepth")
    assert(got.values.exists(_ === 3L), "some fixture user completes the funnel")
  }
}
