package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite with SparkTest {

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("windowed stats with watermark over a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedStats(events, "10 minutes", "10 minutes", "15 minutes")
      .writeStream.format("memory").queryName("winstats").outputMode("append").start()
    try {
      in.addData((ts(0), "click", 1.0), (ts(60), "click", 2.0), (ts(120), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first window
      in.addData((ts(4000), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total FROM winstats ORDER BY event_type")
        .as[(String, Long, Double)].collect()
      assert(rows.toSeq === Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming spatial pipeline == batch pipeline on the same pages (stream-static, stateless)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pages = graft.sources.WebPagesSynth.pages(spark, Sf)
      .select("url", "text", "lang").limit(60)
      .as[(String, String, String)].collect().toSeq
    val in = MemoryStream[(String, String, String)]
    in.addData(pages: _*)
    val enriched = graft.streaming.StreamSpatial.enrich(
      spark, in.toDF().toDF("url", "text", "lang"), Sf)
    val q = enriched.writeStream.format("memory").queryName("spatial")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT url, ent_idx, text, sort_array(poly_ids) AS p, knn_pois, tile_x, tile_y FROM spatial")
        .collect().map(_.toSeq).toSet
      val want = Pipeline.enrich(spark, Sf,
          graft.ops.EntityExtract.entities(pages.toDF("url", "text", "lang")))
        .selectExpr("url", "ent_idx", "text", "sort_array(poly_ids) AS p", "knn_pois", "tile_x", "tile_y")
        .collect().map(_.toSeq).toSet
      assert(got.nonEmpty)
      assert(got === want) // identical rows incl. byte-identical text
    } finally q.stop()
  }

  test("streaming pyramid maintenance: per-batch updateWith fold == batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 900).map { i =>
      (i.toLong, ((i * 131) % 700) / 2.0 - 174.7, ((i * 37) % 330) / 2.0 - 82.4)
    }
    val in = MemoryStream[(Long, Double, Double)]
    // pyramid state folds across micro-batches exactly like the CDC
    // consumer: counts are additive, so per-batch updateWith == full build
    var pyramid = spark.emptyDataFrame
    val q = in.toDF().toDF("id", "lon", "lat").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        pyramid =
          (if (pyramid.columns.isEmpty)
             graft.index.CellPyramid.build(batch, "lon", "lat", 10, 3)
           else graft.index.CellPyramid.updateWith(pyramid, batch, "lon", "lat", 10, 3))
            .localCheckpoint(true) // pin: MemoryStream batch frames don't outlive the batch
        ()
      }.start()
    try {
      all.grouped(300).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val got = pyramid.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = graft.index.CellPyramid.build(all.toDF("id", "lon", "lat"), "lon", "lat", 10, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === want)
      assert(got.map(_._2).sum === 900L * 4) // 900 points x 4 levels
    } finally q.stop()
  }

  test("stream ingest into TableLog: per-batch bucket commits, resume adds only new batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ingest").toString
    val table = s"$dir/t"
    val ckpt = s"$dir/ckpt"
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"))
    val q1 = graft.streaming.StreamIngest.ingest(in.toDF().toDF("id", "v"), table, ckpt)
    q1.awaitTermination() // AvailableNow: drains and stops
    assert(graft.table.TableLog.read(spark, table).count() === 2)
    val bucketsAfter1 = graft.table.TableLog.current(table).get.buckets.keySet
    assert(bucketsAfter1.forall(_.startsWith("batch-")))
    // resume with the same checkpoint: only the NEW data becomes a bucket
    in.addData((3L, "c"))
    val q2 = graft.streaming.StreamIngest.ingest(in.toDF().toDF("id", "v"), table, ckpt)
    q2.awaitTermination()
    assert(graft.table.TableLog.read(spark, table).count() === 3)
    val buckets2 = graft.table.TableLog.current(table).get.buckets
    assert(buckets2.size === bucketsAfter1.size + 1)
    // lineage recorded per batch
    assert(buckets2.values.forall(_.rows >= 1))
  }

  test("event-time sessionization: gap closes sessions, state times out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionize(in.toDS(), gapSeconds = 30, watermark = "5 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 10s apart (one session); user 2: one event
      in.addData(Ev(1, ts(100), 1.0), Ev(1, ts(110), 2.0), Ev(2, ts(105), 7.0))
      q.processAllAvailable()
      // in-batch gap: user 1 again much later -> first session closes via timeout
      in.addData(Ev(1, ts(500), 4.0))
      q.processAllAvailable()
      in.addData(Ev(9, ts(2000), 0.0)) // push watermark to close the rest
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, total FROM sessions ORDER BY user_id, n_events")
        .as[(Long, Long, Double)].collect().toSeq
      assert(rows.contains((1L, 2L, 3.0)))  // first session of user 1
      assert(rows.contains((1L, 1L, 4.0)))  // second session of user 1
      assert(rows.contains((2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("streaming exact dedup: first occurrence kept, in-watermark dupes dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.dedupStream(in.toDF().toDF("doc_id", "ts", "text"), "10 minutes")
      .writeStream.format("memory").queryName("streamdedup").outputMode("append").start()
    try {
      in.addData((1L, ts(100), "alpha"), (2L, ts(110), "beta"), (3L, ts(120), "alpha"))
      q.processAllAvailable()
      in.addData((4L, ts(130), "alpha"), (5L, ts(140), "gamma")) // dupe across batches
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text FROM streamdedup ORDER BY doc_id")
        .as[(Long, String)].collect().toSeq
      assert(rows === Seq((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
    } finally q.stop()
  }

  test("same windowed op runs in batch mode over the events table") {
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val out = EventStreams.windowedStats(ev, "1 hour", "1 hour", "1 hour")
    assert(out.count() > 0)
    assert(out.columns.toSeq === Seq("win_start", "win_end", "event_type", "n", "total"))
  }
}
