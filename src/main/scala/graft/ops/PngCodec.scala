package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec in pure JVM (java.util.zip only — no media libs):
  * chunk walk, zlib inflate of the concatenated IDAT stream, and full
  * per-row unfiltering (all five PNG filter types: None/Sub/Up/Average/
  * Paeth). Supports 8-bit non-interlaced grayscale (0), truecolor (2),
  * gray+alpha (4) and RGBA (6); palette (3) and sub-byte depths return
  * None (a metadata-only path — [[Media.HeaderDecoder]] — still covers
  * them). Unit-tested pixel-for-pixel against `javax.imageio` on images
  * that exercise every filter type (PngCodecSpec).
  */
object PngCodec {

  /** 8-bit samples, row-major, `channels` interleaved per pixel. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 0
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 8 || !bytes.take(8).sameElements(Sig)) return None
    var o = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1; var interlace = 0
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && o + 12 <= bytes.length) {
      val len = be32(bytes, o)
      // Long math: o + 12 + len wraps negative for len near 2^31, letting a
      // crafted chunk length slip past the bounds check
      if (len < 0 || o.toLong + 12L + len > bytes.length) return None
      new String(bytes, o + 4, 4, "ASCII") match {
        case "IHDR" =>
          w = be32(bytes, o + 8); h = be32(bytes, o + 12)
          bitDepth = bytes(o + 16) & 0xff; colorType = bytes(o + 17) & 0xff
          interlace = bytes(o + 20) & 0xff
        case "IDAT" => idat.write(bytes, o + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: skip
      }
      o += 12 + len
    }
    val ch = channelsOf(colorType)
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 || ch == 0) return None
    // crafted IHDR dims overflow w*ch / h*(1+stride) to a negative Int and
    // crash allocation; cap the decoded plane at 256 MB — garbage-in must
    // yield None, never a thrown task (decodeImage's contract)
    val strideL = w.toLong * ch
    if (h.toLong * (1L + strideL) > (1L << 28)) return None
    val stride = strideL.toInt
    val raw = inflate(idat.toByteArray, h * (1 + stride))
    if (raw.length < h * (1 + stride)) return None
    val out = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val ft = raw(r * (1 + stride)) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(r * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= ch) out(r * stride + i - ch) & 0xff else 0
        val up = if (r > 0) out((r - 1) * stride + i) & 0xff else 0
        val ul = if (r > 0 && i >= ch) out((r - 1) * stride + i - ch) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) >> 1)
          case 4 => x + paeth(a, up, ul)
          case _ => return None
        }
        out(r * stride + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(Image(w, h, ch, out))
  }

  private def inflate(zb: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(zb)
    val out = new ByteArrayOutputStream(expect)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
    } catch { case _: java.util.zip.DataFormatException => return Array.emptyByteArray }
    finally inf.end()
    out.toByteArray
  }

  /** Nearest-neighbor resize: source sample for thumb (tx, ty) is
    * (tx*w/tw, ty*h/th) with integer floor division — the same closed-form
    * index math the DuckDB oracle recomputes. */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    val ch = img.channels
    val out = new Array[Byte](tw * th * ch)
    var ty = 0
    while (ty < th) {
      val sy = ty * img.height / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * img.width / tw
        var c = 0
        while (c < ch) {
          out((ty * tw + tx) * ch + c) = img.pixels((sy * img.width + sx) * ch + c)
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    Image(tw, th, ch, out)
  }

  /** Unsigned sum of all samples (the oracle-comparable pixel checksum). */
  def pixelSum(img: Image): Long = {
    var s = 0L; var i = 0
    while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 1 }
    s
  }

  /** Average-hash (aHash) over an image of <= 64 cells (call on the 8x8
    * thumbnail): bit j set iff cell j's gray value is above the image mean.
    * All integer math — gray_j = channel sum, and the mean compare is
    * ncells * gray_j > total (no division) — so the hash replays exactly
    * in the oracle SQL. The standard perceptual key for image near-dup
    * detection; band the 64 bits like [[Dedup.simhash]] for pair search. */
  def aHash(img: Image): Long = {
    val ch = img.channels
    val n = img.width * img.height
    require(n <= 64, s"aHash needs <= 64 cells, got $n")
    val gray = new Array[Long](n)
    var j = 0
    while (j < n) {
      var c = 0; var g = 0L
      while (c < ch) { g += img.pixels(j * ch + c) & 0xff; c += 1 }
      gray(j) = g; j += 1
    }
    val tot = gray.sum
    var h = 0L; j = 0
    while (j < n) { if (n * gray(j) > tot) h |= 1L << j; j += 1 }
    h
  }

  /** Test-support encoder: writes a spec-valid PNG applying the REQUESTED
    * filter type per row (`filterOf(row)`), with correct filter encoding
    * (x - predictor, mod 256) — lets the spec synthesize images that
    * exercise every filter type and golden-check both this codec and
    * `javax.imageio` against the same pixels. */
  def encode(img: Image, filterOf: Int => Int): Array[Byte] = {
    val ch = img.channels
    val stride = img.width * ch
    val raw = new Array[Byte](img.height * (1 + stride))
    var r = 0
    while (r < img.height) {
      val ft = filterOf(r)
      raw(r * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = img.pixels(r * stride + i) & 0xff
        val a = if (i >= ch) img.pixels(r * stride + i - ch) & 0xff else 0
        val up = if (r > 0) img.pixels((r - 1) * stride + i) & 0xff else 0
        val ul = if (r > 0 && i >= ch) img.pixels((r - 1) * stride + i - ch) & 0xff else 0
        val enc = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - up
          case 3 => x - ((a + up) >> 1)
          case 4 => x - paeth(a, up, ul)
          case _ => throw new IllegalArgumentException(s"filter $ft")
        }
        raw(r * (1 + stride) + 1 + i) = (enc & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val colorType = img.channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
    ihdr.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zb = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zb.write(buf, 0, d.deflate(buf))
    d.end()
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length)
      val tb = typ.getBytes("ASCII")
      bb.put(tb).put(body)
      val crc = new CRC32(); crc.update(tb); crc.update(body)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val out = new ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", ihdr.array()))
    out.write(chunk("IDAT", zb.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }
}
