package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Media
import graft.sources.WebPagesSynth

class MediaSpec extends AnyFunSuite with SparkTest {

  test("sniff: byte length + magic detection, no UDF (codegen plan)") {
    import spark.implicits._
    val df = Seq(
      ("a", "<html><p>x</p></html>".getBytes("UTF-8")),
      ("b", Array(0x89.toByte, 0x50.toByte, 0x4e.toByte, 0x47.toByte, 1.toByte)),
      ("c", Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte))
    ).toDF("id", "payload")
    val out = Media.sniff(df, "payload").select("id", "n_bytes", "kind")
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(("a", 21L, "html"), ("b", 5L, "png"), ("c", 4L, "jpeg")))
    // whole plan stays in codegen: no ScalaUDF node
    val plan = Media.sniff(df, "payload").queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("batched decode: deterministic stub features, batch boundaries invisible") {
    import spark.implicits._
    val rows = (1 to 150).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
    val df = rows.toDF("id", "bin").repartition(3)
    val out1 = Media.decode(df, "bin", Media.StubDecoder, batchSize = 7)
      .select($"id", $"media.width", $"media.feature").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq)).sortBy(_._1)
    val out2 = Media.decode(df, "bin", Media.StubDecoder, batchSize = 64)
      .select($"id", $"media.width", $"media.feature").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq)).sortBy(_._1)
    assert(out1.toSeq === out2.toSeq) // batch size must not change results
    assert(out1.length === 150)
    assert(out1.map(_._3).distinct.length > 100) // features vary by payload
  }

  test("decoder open/close called once per partition") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("opens")
    class CountingDecoder extends Media.Decoder {
      override def open(): Unit = acc.add(1)
      override def decodeBatch(p: Array[Array[Byte]]): Array[Media.MediaFeatures] =
        Media.StubDecoder.decodeBatch(p)
    }
    val df = (1 to 20).map(i => (i, Array(i.toByte))).toDF("id", "bin").repartition(4)
    Media.decode(df, "bin", new CountingDecoder, batchSize = 3).count()
    assert(acc.value === 4)
  }

  test("MediaSynth PNG is a REAL decodable PNG (javax.imageio golden)") {
    val bytes = graft.sources.MediaSynth.png(17, 23)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to decode the synthesized PNG")
    assert(img.getWidth === 17 && img.getHeight === 23)
  }

  test("HeaderDecoder: PNG IHDR golden (dims, bit depth, channel map)") {
    assert(Media.HeaderDecoder.parsePng(graft.sources.MediaSynth.png(640, 480))
      === Some((640, 480, 3)))
    // RGBA color type 6 -> 4 channels
    val rgba = graft.sources.MediaSynth.png(4, 4).clone()
    rgba(25) = 6
    assert(Media.HeaderDecoder.parsePng(rgba).map(_._3) === Some(4))
    assert(Media.HeaderDecoder.parsePng("nope".getBytes) === None)
  }

  test("HeaderDecoder: JPEG SOF0 marker walk skips APP0, reads dims") {
    assert(Media.HeaderDecoder.parseJpeg(graft.sources.MediaSynth.jpeg(1920, 1080))
      === Some((1920, 1080, 3)))
    assert(Media.HeaderDecoder.parseJpeg(graft.sources.MediaSynth.png(4, 4)) === None)
  }

  test("decode with HeaderDecoder: real dims for png+jpeg, stub fallback otherwise") {
    import spark.implicits._
    val df = Seq(
      (1L, graft.sources.MediaSynth.png(10, 20)),
      (2L, graft.sources.MediaSynth.jpeg(30, 40)),
      (3L, "not media".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Media.decode(df, "payload", Media.HeaderDecoder)
      .select("id", "media.width", "media.height", "media.channels")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 10, 20, 3)))
    assert(out(1) === ((2L, 30, 40, 3)))
    assert(out(2)._1 === 3L) // stub dims, just present and deterministic
    assert(out(2)._2 >= 1 && out(2)._3 >= 1)
  }

  test("HeaderDecoder: WAV RIFF chunk walk reads frames/rate/channels; garbage -> None") {
    val b = graft.sources.MediaSynth.wav(channels = 2, rate = 16000, frames = 37)
    assert(Media.HeaderDecoder.parseWav(b) === Some((37, 16000, 2)))
    val mono = graft.sources.MediaSynth.wav(channels = 1, rate = 8000, frames = 100)
    assert(Media.HeaderDecoder.parseWav(mono) === Some((100, 8000, 1)))
    assert(Media.HeaderDecoder.parseWav("RIFFxxxxAVI ".getBytes("ASCII")) === None)
    assert(Media.HeaderDecoder.parseWav(Array[Byte](1, 2, 3)) === None)
    // malformed chunk lengths must terminate (not hang/overrun): a negative
    // le32 length would stall the walk, an overlong one reads out of bounds
    val negLen = "RIFF0000WAVE".getBytes("ASCII") ++
      "junk".getBytes("ASCII") ++ Array[Byte](-8, -1, -1, -1) ++ new Array[Byte](16)
    assert(Media.HeaderDecoder.parseWav(negLen) === None)
    val overLen = "RIFF0000WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ Array[Byte](0x40, 0, 0, 0) ++ new Array[Byte](4)
    assert(Media.HeaderDecoder.parseWav(overLen) === None)
    // a wrap-length chunk (len near 2^31) must not slip past the guard
    val wrapLen = "RIFF0000WAVE".getBytes("ASCII") ++
      "junk".getBytes("ASCII") ++ Array[Byte](-12, -1, -1, 0x7f) ++ new Array[Byte](16)
    assert(Media.HeaderDecoder.parseWav(wrapLen) === None)
    // a file truncated INSIDE the data chunk still yields its header info
    // (data content is never read, only its declared length)
    assert(Media.HeaderDecoder.parseWav(b.dropRight(10)) === Some((37, 16000, 2)))
    // javax.sound golden: the synthesized WAV is a REAL parseable wave file
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    assert(ais.getFormat.getChannels === 2)
    assert(ais.getFormat.getSampleRate === 16000.0f)
    assert(ais.getFrameLength === 37L)
  }

  test("AVI container walk: frame offsets, word padding, nested LISTs") {
    val b = graft.sources.MediaSynth.avi(w = 20, h = 12, frames = 9)
    val frames = Media.HeaderDecoder.aviFrames(b)
    assert(frames.length === 9)
    // every frame chunk is a real JPEG with the container's dims
    frames.foreach { case (off, len) =>
      val jb = java.util.Arrays.copyOfRange(b, off, off + len)
      assert(Media.HeaderDecoder.parseJpeg(jb) === Some((20, 12, 3)))
    }
    // the synthesized JPEG is odd-length -> the walk exercised RIFF padding
    assert(frames.head._2 % 2 === 1)
    assert(Media.HeaderDecoder.aviFrames("RIFFxxxxWAVE".getBytes("ASCII")).isEmpty)
    assert(Media.HeaderDecoder.aviFrames(Array[Byte](1, 2)).isEmpty)
    // truncated container: walk stops cleanly instead of reading past end
    assert(Media.HeaderDecoder.aviFrames(b.take(b.length - 7)).length <= 9)
  }

  test("sampleFrames: every-Nth sampling, per-frame dims, 1:N row shape") {
    import spark.implicits._
    val df = Seq(
      (3L, graft.sources.MediaSynth.avi(16, 16, 5)),
      (4L, graft.sources.MediaSynth.avi(32, 8, 12))
    ).toDF("doc_id", "payload")
    val out = Media.sampleFrames(df, "payload", every = 4)
      .select("doc_id", "n_frames", "frame_idx", "frame_w", "frame_h")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq === Seq(0L, 4L)) // ceil(5/4)=2
    assert(out.filter(_._1 == 4L).map(_._3).toSeq === Seq(0L, 4L, 8L))
    assert(out.forall(r => r._1 != 3L || (r._4 == 16L && r._5 == 16L && r._2 == 5L)))
    assert(out.forall(r => r._1 != 4L || (r._4 == 32L && r._5 == 8L && r._2 == 12L)))
    // every=1 keeps all frames
    assert(Media.sampleFrames(df, "payload", every = 1).count() === 17L)
  }

  test("pages html sniffs as html and matches text length + wrapper") {
    val pages = WebPagesSynth.pages(spark, Sf)
    val out = Media.sniff(pages, "html").select("kind").distinct().collect()
    assert(out.map(_.getString(0)).toSeq === Seq("html"))
  }
}
