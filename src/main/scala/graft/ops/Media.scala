package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video/html payloads are opaque
  * `binary` columns with typed metadata. The Spark side — schema, batched
  * per-partition execution, deterministic outputs — is real and tested;
  * the actual media decode is a STUB (this container has no image/audio
  * libraries): [[StubDecoder]] derives deterministic fake features from
  * the bytes. Swap the decoder for a real one (JNI/ONNX/javacv) without
  * touching the plumbing.
  */
object Media {

  /** Codegen-only metadata sniff: byte length + magic-number format guess.
    * (hex(substring(bin,1,4)) is native — no UDF in the hot path.) */
  def sniff(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("magic", hex(substring(col(binCol), 1, 4)))
      .withColumn("kind",
        when(col("magic") === "3C68746D", "html")        // "<htm"
          .when(col("magic") === "89504E47", "png")
          .when(col("magic").startsWith("FFD8"), "jpeg")
          .when(col("magic") === "52494646", "riff")     // wav/avi container
          .otherwise("unknown"))

  /** Decoder contract: one batch of payloads in, one feature row each out.
    * Mirrors the mapInPandas/Arrow batch shape: the decoder is initialized
    * once per partition and fed fixed-size batches so a real implementation
    * can amortize model/codec setup and use vectorized kernels. */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decodeBatch(payloads: Array[Array[Byte]]): Array[MediaFeatures]
    def close(): Unit = ()
  }

  final case class MediaFeatures(width: Int, height: Int, channels: Int,
                                 feature: Array[Float])

  /** STUB decode: deterministic pseudo-features from a rolling byte hash —
    * NOT a real decode (no media libs offline); exists to exercise the
    * batching, schema, and partition plumbing end-to-end. */
  object StubDecoder extends Decoder {
    private def fmix(zIn: Long): Long = { // murmur3 finalizer: avalanches small deltas
      var z = zIn
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    override def decodeBatch(payloads: Array[Array[Byte]]): Array[MediaFeatures] =
      payloads.map { b =>
        var h = 1125899906842597L
        var i = 0
        while (i < b.length) { h = 31 * h + b(i); i += 1 }
        val dim = 8
        val feat = Array.tabulate(dim) { j =>
          (math.floorMod(fmix(h + j * 40503L), 1000L)).toInt / 1000.0f
        }
        MediaFeatures((math.floorMod(fmix(h + 1), 1024L)).toInt + 1,
          (math.floorMod(fmix(h + 2), 1024L)).toInt + 1, 3, feat)
      }
  }

  /** REAL header decode in pure JVM (no media libs needed): PNG IHDR
    * (width/height/bit-depth/color-type) and JPEG SOF0/1/2 marker walk
    * (height/width/components). Payloads that are neither fall back to the
    * stub's hash-derived dims; feature vectors stay stub-derived (a model
    * embedding has no offline ground truth). */
  object HeaderDecoder extends Decoder {

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG: signature + first chunk must be IHDR at offset 8. */
    def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] =
      if (b.length >= 33 && b.take(8).sameElements(PngSig) &&
          new String(b, 12, 4, "ASCII") == "IHDR") {
        val colorType = b(25) & 0xff
        val channels = colorType match {
          case 0 => 1 // grayscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette
          case 4 => 2 // gray+alpha
          case 6 => 4 // RGBA
          case _ => 0
        }
        Some((be32(b, 16), be32(b, 20), channels))
      } else None

    /** JPEG: walk FF-marker segments from SOI to the first SOF0/1/2. */
    def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          // [FF Cx][len 2][precision 1][height 2][width 2][ncomp 1]
          if (i + 9 >= b.length) return None
          return Some((be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff))
        } else if (marker == 0xd8 || marker == 0xd9 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone marker, no length
        } else {
          i += 2 + be16(b, i + 2) // skip segment body
        }
      }
      None
    }

    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
      b.length >= o + s.length && new String(b, o, s.length, "ASCII") == s

    /** WAV (RIFF/WAVE): chunk walk to `fmt ` (PCM layout) + `data`; audio
      * maps onto the feature struct as (width=frames, height=sampleRate,
      * channels). Real parse, pure JVM. */
    def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (!ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return None
      var o = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, blockAlign)
      while (o + 8 <= b.length) {
        val len = le32(b, o + 4)
        // a negative length would stall the walk forever
        if (len < 0) return None
        // `data` needs only its DECLARED length (content never read), so a
        // truncated-in-flight file still yields its header info
        if (ascii(b, o, "data"))
          return fmt.collect { case (ch, rate, ba) if ba > 0 => (len / ba, rate, ch) }
        // fmt fields are read from the buffer: bounds-check in LONG math —
        // o + 8 + len wraps negative in Int for len near 2^31 (the same
        // overflow PngCodec guards against)
        if (ascii(b, o, "fmt ") && len >= 16) {
          if (o.toLong + 24L > b.length) return None
          fmt = Some((le16(b, o + 10), le32(b, o + 12), le16(b, o + 20)))
        }
        val next = o.toLong + 8L + len + (len & 1) // chunks are word-aligned
        if (next > Int.MaxValue) return None
        o = next.toInt
      }
      None
    }

    /** AVI (RIFF/'AVI ') walk: (offset, length) of every video frame chunk
      * ('xxdc'/'xxdb') inside the 'movi' LIST, recursing into LISTs (movi may
      * nest 'rec ' groups). Word-aligned like all RIFF chunks. */
    def aviFrames(b: Array[Byte]): Array[(Int, Int)] = {
      if (!ascii(b, 0, "RIFF") || !ascii(b, 8, "AVI ")) return Array.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var o = start
        while (o + 8 <= end) {
          val len = le32(b, o + 4)
          if (len < 0 || o + 8 + len > end) return // malformed: stop cleanly
          if (ascii(b, o, "LIST")) walk(o + 12, o + 8 + len)
          else if (b(o + 2) == 'd' && (b(o + 3) == 'c' || b(o + 3) == 'b'))
            out += ((o + 8, len))
          o += 8 + len + (len & 1)
        }
      }
      walk(12, b.length)
      out.toArray
    }

    override def decodeBatch(payloads: Array[Array[Byte]]): Array[MediaFeatures] = {
      val stub = StubDecoder.decodeBatch(payloads) // deterministic features
      payloads.zip(stub).map { case (b, s) =>
        parsePng(b).orElse(parseJpeg(b)).orElse(parseWav(b)) match {
          case Some((w, h, c)) => s.copy(width = w, height = h, channels = c)
          case None => s
        }
      }
    }
  }

  /** REAL image pixel decode + nearest-neighbor resize in one per-partition
    * pass: [[PngCodec.decode]] (zlib inflate + full PNG unfiltering) then
    * [[PngCodec.resizeNearest]] to a `thumbW` x `thumbH` thumbnail. Appends
    * small integer feature columns only — the decoded pixel buffer never
    * enters the plan, so nothing pixel-sized is shuffled or spilled at
    * scale. Non-decodable payloads (JPEG skeletons, garbage) yield nulls.
    */
  def decodeImage(df: DataFrame, binCol: String, thumbW: Int, thumbH: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_w", LongType, nullable = true),
      StructField("img_h", LongType, nullable = true),
      StructField("img_ch", LongType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true),
      StructField("pixel_count", LongType, nullable = true),
      StructField("thumb_sum", LongType, nullable = true),
      StructField("thumb_ahash", LongType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val b = if (r.isNullAt(binIdx)) Array.empty[Byte]
                else r.getAs[Array[Byte]](binIdx)
        val extra: Seq[Any] = PngCodec.decode(b) match {
          case Some(img) =>
            val thumb = PngCodec.resizeNearest(img, thumbW, thumbH)
            Seq(img.width.toLong, img.height.toLong, img.channels.toLong,
              PngCodec.pixelSum(img), img.pixels.length.toLong,
              PngCodec.pixelSum(thumb), PngCodec.aHash(thumb))
          case None => Seq(null, null, null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Video frame sampling over AVI/MJPEG binary columns: walk the RIFF
    * container (no index needed), keep every `every`-th frame, and
    * header-decode each sampled JPEG. One output row per SAMPLED frame —
    * the 1:N analog of [[decode]]'s 1:1 batch shape; a real pipeline swaps
    * the JPEG header parse for a full frame decode + model call without
    * touching the container walk or the row plumbing. */
  def sampleFrames(df: DataFrame, binCol: String, every: Int): DataFrame = {
    require(every >= 1, "every must be >= 1")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_w", LongType, nullable = false),
      StructField("frame_h", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val b = if (r.isNullAt(binIdx)) Array.empty[Byte]
                else r.getAs[Array[Byte]](binIdx)
        val frames = HeaderDecoder.aviFrames(b)
        Iterator.range(0, frames.length, every).map { k =>
          val (off, len) = frames(k)
          val jb = java.util.Arrays.copyOfRange(b, off, off + len)
          val (fw, fh) = HeaderDecoder.parseJpeg(jb)
            .map { case (w, h, _) => (w.toLong, h.toLong) }.getOrElse((-1L, -1L))
          Row.fromSeq(r.toSeq ++ Seq(frames.length.toLong, k.toLong, fw, fh))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Batched per-partition decode: appends a `media` struct column.
    * @param batchSize payloads per decoder call (Arrow-like batch shape). */
  def decode(df: DataFrame, binCol: String, decoder: Decoder = StubDecoder,
             batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media", featureSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    // typed mapPartitions (not df.rdd): stays a Dataset transform, so the
    // encoder path and the surrounding plan (reuse, AQE) are preserved
    df.mapPartitions { it =>
      decoder.open()
      val withClose = it.grouped(batchSize).flatMap { batch =>
        val rows = batch.toArray
        val feats = decoder.decodeBatch(rows.map(r =>
          if (r.isNullAt(binIdx)) Array.empty[Byte] else r.getAs[Array[Byte]](binIdx)))
        rows.zip(feats).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ Row(f.width, f.height, f.channels, f.feature.toSeq))
        }
      }
      new Iterator[Row] {
        override def hasNext: Boolean = { val h = withClose.hasNext; if (!h) decoder.close(); h }
        override def next(): Row = withClose.next()
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
