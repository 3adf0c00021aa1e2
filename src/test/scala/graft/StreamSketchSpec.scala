package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamSketchSpec extends AnyFunSuite with SparkTest {

  test("windowed CMS: streaming arrays == batch arrays per window (cross-batch merge)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // keys with skew, spread over 3 ten-minute windows
    val rows = (0 until 3000).map { i =>
      val ts = new Timestamp(60000L * (1 + i % 30)) // minutes 1..30
      (ts, ((i * i) % 53).toLong)
    }
    val in = MemoryStream[(Timestamp, Long)]
    val q = graft.streaming.StreamSketch.windowedCms(
        in.toDF().toDF("ts", "key"), windowLen = "10 minutes", watermark = "1 hour",
        depth = 4, width = 64)
      .writeStream.format("memory").queryName("wcms").outputMode("complete").start()
    try {
      // split so every window's keys span both micro-batches — the state
      // store must MERGE serialized sketch partials, not just create them
      val (a, b) = rows.splitAt(rows.size / 2)
      in.addData(a: _*); q.processAllAvailable()
      in.addData(b: _*); q.processAllAvailable()
      val got = spark.sql("SELECT win_start, cms FROM wcms")
        .as[(Timestamp, Seq[Long])].collect().toMap

      val want = rows.toDF("ts", "key")
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(graft.ops.Sketches.cms(col("key"), lit(1L), 4, 64).as("cms"))
        .select(col("w.start"), col("cms"))
        .as[(Timestamp, Seq[Long])].collect().toMap
      assert(want.size === 4) // minutes 1..30 span four 10-minute windows
      assert(got === want)
      // every inserted key hit all 4 sketch rows, across all windows
      assert(got.values.map(_.sum).sum === 4L * rows.size)
    } finally q.stop()
  }
}
