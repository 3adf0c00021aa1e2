package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamJoinSpec extends AnyFunSuite with SparkTest {

  test("stream-stream interval join == batch join on a replay of the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val clicks = ev.filter(col("event_type") === "click")
      .selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
      .as[(Long, Long, Timestamp)].collect().toSeq
    val views = ev.filter(col("event_type") === "view")
      .selectExpr("event_id AS view_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
      .as[(Long, Long, Timestamp)].collect().toSeq

    val inC = MemoryStream[(Long, Long, Timestamp)]
    val inV = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamJoin.clickViewJoin(
      inC.toDF().toDF("event_id", "user_id", "ts"),
      inV.toDF().toDF("view_id", "user_id", "ts"),
      lookback = "6 hours", watermark = "31 days") // no drops: whole table in-horizon
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // two chunks per side, interleaved — matches must span batches
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      val (v1, v2) = views.splitAt(views.size / 2)
      inC.addData(c1: _*); inV.addData(v1: _*); q.processAllAvailable()
      inC.addData(c2: _*); inV.addData(v2: _*); q.processAllAvailable()

      val got = spark.sql("SELECT * FROM ssjoin")
        .as[(Long, Long, Long)].collect().toSet
      val want = clicks.toDF("event_id", "user_id", "ts").alias("c")
        .join(views.toDF("view_id", "v_user_id", "v_ts").alias("v"),
          col("user_id") === col("v_user_id") &&
            col("v_ts") >= col("ts") - expr("INTERVAL 6 hours") &&
            col("v_ts") <= col("ts"))
        .select("event_id", "user_id", "view_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(want.nonEmpty, "fixture must produce matches")
      assert(got === want)
    } finally q.stop()
  }
}
