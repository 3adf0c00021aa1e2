package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite with SparkTest {

  test("sessionize == brute-force per-user gap split; one Window exchange") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val got = graft.ops.Sessionize.sessionize(ev)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    val raw = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .as[(Long, Long, Long)].collect()
    val gap = graft.ops.Sessionize.DefaultGapUs
    var nSessions = 0
    raw.groupBy(_._1).foreach { case (user, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var sess = 0L
      var cur = Vector.empty[Long] // tus of current session
      def flush(): Unit = if (cur.nonEmpty) {
        val expect = (cur.size.toLong, cur.min, cur.max - cur.min)
        assert(got((user, sess)) === expect, s"user $user session $sess")
        nSessions += 1
      }
      var prev = Long.MinValue
      sorted.foreach { case (_, _, tus) =>
        if (prev == Long.MinValue || tus - prev > gap) { flush(); sess += 1; cur = Vector.empty }
        cur :+= tus; prev = tus
      }
      flush()
    }
    assert(nSessions === got.size)
    assert(nSessions > raw.map(_._1).distinct.length, "gap must actually split sessions")

    // the lag + running-sum windows and the session rollup all share the
    // user_id clustering: exactly ONE shuffle in the whole plan (the
    // rollup's (user_id, sess_idx) grouping is satisfied by the window
    // exchange), and no unpartitioned window anywhere
    val explained = graft.ops.Sessionize.sessionize(ev).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = """Exchange \(\d+\)""".r.findAllIn(explained).size
    assert(exchanges === 1,
      s"sessionize must shuffle exactly once on user_id, got $exchanges\n$explained")
    val winOps = graft.ops.Sessionize.sessionize(ev)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(winOps.nonEmpty && winOps.forall(_.partitionSpec.nonEmpty))
  }
}
