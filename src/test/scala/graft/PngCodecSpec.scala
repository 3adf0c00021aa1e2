package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PngCodec
import graft.ops.PngCodec.Image

/** The PNG pixel codec is REAL: every filter type round-trips, and
  * `javax.imageio` (an independent, spec-complete implementation) reads
  * the same pixels from our encodings that our decoder does. */
class PngCodecSpec extends AnyFunSuite {

  private def pix(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 73 + seed * 151 + (i * i % 89)) & 0xff).toByte)

  private def imageioPixels(bytes: Array[Byte], channels: Int): Array[Byte] = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val r = bi.getRaster
    val out = new Array[Byte](bi.getWidth * bi.getHeight * channels)
    var i = 0
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth; c <- 0 until channels) {
      out(i) = r.getSample(x, y, c).toByte; i += 1
    }
    out
  }

  test("all five filter types: encode -> decode round-trip AND ImageIO golden (RGB)") {
    for (ft <- 0 to 4) {
      val img = Image(11, 7, 3, pix(11 * 7 * 3, ft))
      val bytes = PngCodec.encode(img, _ => ft)
      val dec = PngCodec.decode(bytes).get
      assert(dec.width === 11 && dec.height === 7 && dec.channels === 3)
      assert(dec.pixels.toSeq === img.pixels.toSeq, s"filter $ft roundtrip")
      assert(imageioPixels(bytes, 3).toSeq === img.pixels.toSeq, s"filter $ft vs ImageIO")
    }
  }

  test("mixed filters per row (r % 5) against ImageIO, gray / RGB / RGBA") {
    for (ch <- Seq(1, 3, 4)) {
      val img = Image(23, 17, ch, pix(23 * 17 * ch, ch))
      val bytes = PngCodec.encode(img, r => r % 5)
      assert(PngCodec.decode(bytes).get.pixels.toSeq === img.pixels.toSeq)
      assert(imageioPixels(bytes, ch).toSeq === img.pixels.toSeq, s"channels=$ch")
    }
  }

  test("gray+alpha (color type 4) round-trips through our codec") {
    val img = Image(9, 5, 2, pix(9 * 5 * 2, 7))
    val dec = PngCodec.decode(PngCodec.encode(img, r => (r * 3) % 5)).get
    assert(dec.channels === 2)
    assert(dec.pixels.toSeq === img.pixels.toSeq)
  }

  test("decodes the JDK encoder's own output (independent filter choices)") {
    val bi = new java.awt.image.BufferedImage(31, 13, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 13; x <- 0 until 31)
      bi.setRGB(x, y, (x * 8 % 256 << 16) | (y * 19 % 256 << 8) | ((x * y + 5) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val dec = PngCodec.decode(bos.toByteArray).get
    assert(dec.width === 31 && dec.height === 13 && dec.channels === 3)
    val expect = imageioPixels(bos.toByteArray, 3)
    assert(dec.pixels.toSeq === expect.toSeq)
  }

  test("MediaSynth PNG pixel sum matches the closed-form oracle formula") {
    for (d <- Seq(0L, 2L, 14L, 126L)) {
      val w = graft.sources.MediaSynth.width(d)
      val h = graft.sources.MediaSynth.height(d)
      val img = PngCodec.decode(graft.sources.MediaSynth.png(w, h)).get
      assert(img.width === w && img.height === h && img.channels === 3)
      val stride = 1 + 3 * w
      val expect = (0 until h * stride).map(i => (i * 31) & 127).sum.toLong -
        (0 until h).map(r => (r * stride * 31) & 127).sum.toLong
      assert(PngCodec.pixelSum(img) === expect)
    }
  }

  test("resizeNearest: exact index math, identity resize, channel preservation") {
    val img = Image(6, 4, 3, pix(6 * 4 * 3, 3))
    val t = PngCodec.resizeNearest(img, 3, 2)
    for (ty <- 0 until 2; tx <- 0 until 3; c <- 0 until 3) {
      val sy = ty * 4 / 2; val sx = tx * 6 / 3
      assert(t.pixels((ty * 3 + tx) * 3 + c) === img.pixels((sy * 6 + sx) * 3 + c))
    }
    val same = PngCodec.resizeNearest(img, 6, 4)
    assert(same.pixels.toSeq === img.pixels.toSeq)
    // upscale: still valid sampling (no out-of-bounds)
    val up = PngCodec.resizeNearest(img, 13, 9)
    assert(up.pixels.length === 13 * 9 * 3)
  }

  test("garbage, truncation, unsupported shapes -> None (no throw)") {
    assert(PngCodec.decode(Array[Byte](1, 2, 3)) === None)
    assert(PngCodec.decode("not a png at all".getBytes("ASCII")) === None)
    val ok = PngCodec.encode(Image(8, 8, 3, pix(192, 1)), _ => 4)
    assert(PngCodec.decode(ok).isDefined)
    assert(PngCodec.decode(ok.take(40)) === None)   // cut inside IDAT
    assert(PngCodec.decode(ok.take(20)) === None)   // cut inside IHDR
    // jpeg skeleton from MediaSynth is not a PNG
    assert(PngCodec.decode(graft.sources.MediaSynth.jpeg(10, 10)) === None)
  }

  test("crafted chunk lengths / IHDR dims -> None (no Int-overflow throw)") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    // chunk length 0x7ffffff0: o + 12 + len wraps negative in Int math
    val hugeChunk = sig ++ be32(0x7ffffff0L) ++ "IHDR".getBytes("ASCII") ++ new Array[Byte](16)
    assert(PngCodec.decode(hugeChunk) === None)
    // IHDR claiming 2^30 x 2^16 RGBA: h*(1+stride) overflows to negative
    val hugeDims = sig ++ be32(13) ++ "IHDR".getBytes("ASCII") ++
      be32(1L << 30) ++ be32(1L << 16) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0) ++ // bit depth 8, color type 6 (RGBA)
      be32(0) ++ "IEND".getBytes("ASCII") ++ be32(0)
    assert(PngCodec.decode(hugeDims) === None)
  }
}
