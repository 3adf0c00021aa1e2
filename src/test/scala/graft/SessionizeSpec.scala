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

  test("sessionizeBucketed == sessionize on the events fixture") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val want = graft.ops.Sessionize.sessionize(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val got = graft.ops.Sessionize.sessionizeBucketed(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("sessionizeBucketed: planted pathological user, sessions span buckets") {
    import spark.implicits._
    // one hot user with 4000 events over 40 days (every ~14.4 min — ONE
    // giant session), a second user whose sessions straddle every bucket
    // boundary, and a third with gap-separated singleton sessions
    val base = 1700000000000000L // µs
    val hot = (0 until 4000).map(i => (1L, i.toLong, base + i * 864000000L))
    val straddler = (0 until 80).map(i => (2L, 10000L + i, base + i * 43200000000L))
    val sparse = (0 until 10).map(i => (3L, 20000L + i, base + i * 345600000000L))
    val df = (hot ++ straddler ++ sparse)
      .toDF("user_id", "event_id", "tus")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tus")).cast("timestamp_ntz").as("ts"))
    val want = graft.ops.Sessionize.sessionize(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val got = graft.ops.Sessionize.sessionizeBucketed(df)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    // the hot user's single session must have been assembled ACROSS buckets
    assert(want.exists { case (u, _, n, _, _) => u == 1L && n == 4000L })

    // pre-split engaged: every event-level window partitions on
    // (user_id, bucket), never on user_id alone
    val explained = graft.ops.Sessionize.sessionizeBucketed(df).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("_b"), s"bucket column missing from plan\n$explained")
    val evWindows = graft.ops.Sessionize.sessionizeBucketed(df)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.windowExpressions.exists(_.name.contains("_run")) ||
             w.windowExpressions.exists(_.name.contains("_prev")) => w
      }
    // the summary-table windows (carry/offset) partition on user alone by
    // design (<= nBuckets rows per user); the EVENT-level ones must not
    assert(evWindows.forall(_.partitionSpec.size == 2),
      "event-level windows must partition on (user_id, _b)")
  }

  test("sessionizeBucketed falls back cleanly on degenerate time axes") {
    import spark.implicits._
    val flat = Seq((1L, 1L, 1700000000000000L), (1L, 2L, 1700000000000000L),
      (2L, 3L, 1700000000000000L))
      .toDF("user_id", "event_id", "tus")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tus")).cast("timestamp_ntz").as("ts"))
    val got = graft.ops.Sessionize.sessionizeBucketed(flat)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L, 1700000000000000L, 0L),
      (2L, 1L, 1L, 1700000000000000L, 0L)))
    val empty = flat.filter(col("user_id") < 0)
    assert(graft.ops.Sessionize.sessionizeBucketed(empty).count() === 0)
  }
}
