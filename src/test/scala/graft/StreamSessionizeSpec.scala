package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamSessionizeSpec extends AnyFunSuite with SparkTest {

  test("streaming sessions == batch sessionize on a replay of the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet(s"$Sf/events.parquet")
      .selectExpr("user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts")
      .as[(Long, Long, Timestamp)].collect().toSeq
    val maxTs = events.map(_._3.getTime).max
    val sentinelUser = 999999L
    assert(!events.exists(_._1 == sentinelUser))

    val in = MemoryStream[(Long, Long, Timestamp)]
    val q = graft.streaming.StreamSessionize.sessions(
        in.toDF().toDF("user_id", "event_id", "ts"), watermark = "1 minute")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // replay in two time-ordered chunks (intra-batch fold + cross-batch
      // state carry); time order keeps chunk b ahead of chunk a's watermark
      val (a, b) = events.sortBy(e => (e._3.getTime, e._2)).splitAt(events.size / 2)
      in.addData(a: _*); q.processAllAvailable()
      in.addData(b: _*); q.processAllAvailable()
      // two sentinel rounds: round 1 advances the watermark past every real
      // event, round 2 runs the batch in which those timeouts fire
      in.addData((sentinelUser, 1L, new Timestamp(maxTs + 365L * 86400000)))
      q.processAllAvailable()
      in.addData((sentinelUser, 2L, new Timestamp(maxTs + 366L * 86400000)))
      q.processAllAvailable()

      val got = spark.sql("SELECT * FROM sess")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
        .filterNot(_._1 == sentinelUser)
      val want = graft.ops.Sessionize.sessionize(
          events.toDF("user_id", "event_id", "ts"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("event-time timeout flushes an abandoned session; numbering survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Long) = new Timestamp(h * 3600000)
    val in = MemoryStream[(Long, Long, Timestamp)]
    val q = graft.streaming.StreamSessionize.sessions(
        in.toDF().toDF("user_id", "event_id", "ts"), watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_to").outputMode("append").start()
    try {
      in.addData((7L, 1L, ts(1)), (7L, 2L, ts(2))) // one open session
      q.processAllAvailable()
      // other-user traffic advances the watermark far past 7's gap...
      in.addData((8L, 3L, ts(1000))); q.processAllAvailable()
      // ...and the next batch fires the timeout flush WITHOUT user 7 returning
      in.addData((8L, 4L, ts(1001))); q.processAllAvailable()
      val flushed = spark.sql("SELECT * FROM sess_to WHERE user_id = 7")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(flushed === Set((7L, 1L, 2L, 3600000000L, 3600000000L)))
      // the user returns: ordinal continues at 2
      in.addData((7L, 5L, ts(1002))); q.processAllAvailable()
      in.addData((9L, 6L, ts(2000))); q.processAllAvailable()
      in.addData((9L, 7L, ts(2001))); q.processAllAvailable()
      val next = spark.sql("SELECT sess_idx FROM sess_to WHERE user_id = 7 AND sess_idx > 1")
        .as[Long].collect().toSet
      assert(next === Set(2L))
    } finally q.stop()
  }
}
