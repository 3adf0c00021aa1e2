package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.streaming.StreamDedup

import java.sql.Timestamp

class StreamDedupSpec extends AnyFunSuite with SparkTest {

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  /** corpus with planted dupes as a (doc_id, ts, text) seq, ts = doc_id-derived */
  private def docsSeq: Seq[(Long, Timestamp, String)] = {
    import spark.implicits._
    Dedup.corpus(spark, Sf).as[(Long, String)].collect().toSeq
      // +1: a row at epoch 0 ties the INITIAL watermark and is dropped as late
      .map { case (id, text) => (id, ts(id % 1000 + 1), text) }
  }

  test("streaming LSH near-dup pairs == batch minhashPairsProd on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = docsSeq
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData(docs: _*)
    val q = StreamDedup.nearDupPairs(
        in.toDF().toDF("doc_id", "ts", "text"),
        watermark = "1 day", maxPerBucket = 100000)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT doc_a, doc_b FROM neardup")
        .as[(Long, Long)].collect().toSet
      val want = Dedup.minhashPairsProd(
          docs.map(d => (d._1, d._3)).toDF("doc_id", "text"), maxBucket = 100000)
        .as[(Long, Long)].collect().toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("maxPerBucket bounds retained state: only adjacent pairs of a 3-dup chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val in = MemoryStream[(Long, Timestamp, String)]
    in.addData((1L, ts(1), text), (2L, ts(2), text), (3L, ts(3), text))
    val q = StreamDedup.nearDupPairs(
        in.toDF().toDF("doc_id", "ts", "text"),
        watermark = "1 day", maxPerBucket = 1)
      .writeStream.format("memory").queryName("capped").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT doc_a, doc_b FROM capped")
        .as[(Long, Long)].collect().toSet
      // doc 3 only sees doc 2 (doc 1 evicted by the cap): no (1,3) pair
      assert(got === Set((1L, 2L), (2L, 3L)))
    } finally q.stop()
  }

  test("event-time timeout evicts idle buckets: no pairs across the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "one two three four five six seven eight nine ten"
    val other = "cat dog bird fish lion tiger bear wolf deer fox"
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = StreamDedup.nearDupPairs(
        in.toDF().toDF("doc_id", "ts", "text"),
        watermark = "1 minute", maxPerBucket = 100, evictDelayMs = 0L)
      .writeStream.format("memory").queryName("evicted").outputMode("append").start()
    try {
      in.addData((1L, ts(0), text)) // seeds the bucket
      q.processAllAvailable()
      // advances the watermark far past doc 1's bucket timeout
      in.addData((50L, ts(100000), other))
      q.processAllAvailable()
      // idle bucket evicts at the start of THIS batch (no data for it)
      in.addData((51L, ts(100001), other))
      q.processAllAvailable()
      // doc 2 lands in doc 1's (now evicted) bucket: no (1, 2) pair
      in.addData((2L, ts(100002), text))
      q.processAllAvailable()
      val got = spark.sql("SELECT DISTINCT doc_a, doc_b FROM evicted")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((50L, 51L)))
    } finally q.stop()
  }
}
