package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support (north-star extension):
  * media travels as an opaque `binary` column with typed metadata; decode
  * and feature extraction run per-partition so expensive codec/model
  * initialization happens once per task, not per row — the Scala analog
  * of a Pandas-UDF/mapInPandas batch.
  *
  * Codecs whose decoders need EXTERNAL libraries (H.264, MP3…) are
  * unavailable in this environment: for those,
  * `DeterministicFakeDecoder` derives stable pseudo-metadata from the
  * bytes' md5, so the Spark-side plumbing — schema, partition batch
  * shape, per-partition init, typed output — is real and tested, and
  * the features are oracle-reproducible. Everything else decodes for
  * REAL: RIFF/WAVE PCM audio (`encodeWavPcm16`/`decodeWavPcm16`,
  * gated by q367), 24-bit uncompressed BMP images (`encodeBmpGray24`/
  * `decodeBmpGray24`, gated by q368), and THREE true COMPRESSED
  * codecs — non-interlaced 8-bit PNG (`encodePngGray8`/
  * `decodePngGray8`, gated by q373: zlib inflate via
  * `java.util.zip.Inflater` + the five scanline filter types, which
  * are pure byte arithmetic), GIF89a grayscale (`encodeGifGray8`/
  * `decodeGifGray8`, gated by q399: the LZW dictionary coder
  * implemented from the spec with no library at all), and baseline
  * JPEG ([[Jpeg]], gated by q404/q407: Huffman entropy coding +
  * dequantize + IDCT from ITU-T T.81, the codec real web corpora
  * actually arrive in). `RealCodecDecoder` dispatches on magic
  * bytes — real parse for these, a loud
  * UnsupportedOperationException for library-bound formats (H.264,
  * MP3).
  *
  * Scale: feature extraction is map-only over the binary column;
  * `binaryFile` sources should cap `maxPartitionBytes` so a task's batch
  * of blobs fits in memory; decoded frames never materialize as a whole
  * column — only extracted features leave the partition.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], kind: String)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      digest: String, width: Int, height: Int, n_frames: Int)

  case class Decoded(width: Int, height: Int, nFrames: Int)

  /** One instance per partition; `open()` models codec/model init. */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): Decoded
  }

  /** STUB decoder: metadata derived deterministically from md5(bytes).
    * Replaces the real image/audio decode unavailable in this
    * environment; replicable in any engine with md5. */
  class DeterministicFakeDecoder extends MediaDecoder {
    @transient private var openCount = 0
    override def open(): Unit = { openCount += 1 }
    override def decode(bytes: Array[Byte]): Decoded = {
      val hex = DeterministicFakeDecoder.md5Hex(bytes)
      val w = (Integer.parseInt(hex.substring(0, 4), 16) % 1920) + 1
      val h = (Integer.parseInt(hex.substring(4, 8), 16) % 1080) + 1
      Decoded(w, h, (bytes.length % 100).toInt)
    }
  }
  object DeterministicFakeDecoder {
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
  }

  /** Real codec-backed decoder for every format this repo can parse —
    * BMP (24-bit uncompressed), RIFF/WAVE PCM, zlib-compressed
    * non-interlaced 8-bit PNG, LZW-compressed grayscale GIF, and
    * baseline JPEG ([[Jpeg.decodeJpeg]], written from ITU-T T.81) —
    * handled by the strict decoders; any other magic throws
    * UnsupportedOperationException naming the format, because the
    * remaining codecs (H.264, MP3…) need libraries this environment
    * does not ship. Decode errors fail loudly; nothing is
    * fabricated. */
  class RealCodecDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): Decoded = {
      if (bytes.length >= 2 && bytes(0) == 'B'.toByte &&
          bytes(1) == 'M'.toByte) {
        val f = decodeBmpGray24(bytes)
        Decoded(f.width, f.height, 1)
      } else if (bytes.length >= 8 &&
          (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
          bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte) {
        val f = decodePngGray8(bytes)
        Decoded(f.width, f.height, 1)
      } else if (bytes.length >= 12 &&
          new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
          new String(bytes, 8, 4, "US-ASCII") == "WAVE") {
        val f = decodeWavPcm16(bytes)
        Decoded(0, 0, math.min(f.n_samples, Int.MaxValue.toLong).toInt)
      } else if (bytes.length >= 6 &&
          new String(bytes, 0, 4, "US-ASCII") == "GIF8") {
        val f = decodeGifGray8(bytes)
        Decoded(f.width, f.height, 1)
      } else if (bytes.length >= 2 &&
          (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        val img = Jpeg.decodeJpeg(bytes)
        Decoded(img.width, img.height, 1)
      } else {
        val magic = bytes.take(4).map("%02x".format(_)).mkString
        throw new UnsupportedOperationException(
          s"no decoder for magic 0x$magic — H.264/MP3-class codecs " +
            "need libraries absent from this environment")
      }
    }
  }

  /** Wrap a text table as a binary media table (stand-in for
    * `spark.read.format("binaryFile")` on real media files). */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String,
      kind: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("content"),
      lit(kind).as("kind"))

  /** Per-partition feature extraction: decoder initialized once per
    * partition, then a streaming loop over the rows — the batch shape a
    * real codec/model wants. */
  def extractFeatures(media: Dataset[MediaRow],
      newDecoder: () => MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = newDecoder()
      decoder.open()
      rows.map { r =>
        val d = decoder.decode(r.content)
        MediaFeatures(r.doc_id, r.kind, r.content.length.toLong,
          DeterministicFakeDecoder.md5Hex(r.content),
          d.width, d.height, d.nFrames)
      }
    }
  }

  /** Aspect-preserving resize arithmetic (pure; the real pixel work
    * happens wherever the decoder lives). */
  def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** Deterministic frame sampling: every `stride`-th frame index. */
  def sampleFrameIndices(nFrames: Int, stride: Int): Seq[Int] =
    (0 until nFrames by math.max(1, stride)).toSeq

  // ------------------------------------------------------------ WAV/PCM
  // A REAL audio decode path: RIFF/WAVE PCM needs no codec library —
  // the container is pure byte arithmetic — so unlike the image/video
  // stub above, this modality round-trips actual bytes end to end.

  case class PcmRow(doc_id: Long, samples: Seq[Int])

  case class WavRow(doc_id: Long, content: Array[Byte])

  case class WavFeatures(doc_id: Long, sample_rate: Int, n_channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long,
      peak: Int, sum_sq: Long)

  /** Encode 16-bit mono PCM into a standard 44-byte-header WAV blob.
    * Samples are clamped to int16; little-endian throughout (the RIFF
    * contract). Pure function — runs inside mapPartitions. */
  def encodeWavPcm16(samples: Seq[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2.toShort)    // block align
      .putShort(16.toShort)   // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s =>
      buf.putShort(math.max(-32768, math.min(32767, s)).toShort))
    buf.array()
  }

  /** Parse a PCM WAV blob's header and samples; strict on the parts
    * the features depend on (RIFF/WAVE magic, PCM format code, a
    * `data` chunk), chunk-walking past any others (LIST/INFO
    * metadata), honoring the RIFF odd-size pad byte. Throws
    * IllegalArgumentException with the offending field on malformed
    * input — a decode error should fail the row loudly, not fabricate
    * features. Exact-integer features only (count/peak/Σs²), so the
    * decode is oracle-checkable via the round-trip pattern. */
  def decodeWavPcm16(bytes: Array[Byte]): WavFeatures = {
    val (rate, channels, bits, dataOff, n) = decodeWavRaw(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0; var peak = 0; var sumSq = 0L
    while (i < n) {
      val s = buf.getShort(dataOff + 2 * i).toInt
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toLong * s.toLong
      i += 1
    }
    WavFeatures(0L, rate, channels, bits, n.toLong,
      n.toLong * 1000L / rate, peak, sumSq)
  }

  /** Decoded PCM16 samples as an Int array — the sample-space access
    * the audio-fingerprint path needs on top of [[decodeWavPcm16]]'s
    * summary moments. Same strict parse ([[decodeWavRaw]]).
    * @return (sample_rate, samples) */
  def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Int]) = {
    val (rate, _, _, dataOff, n) = decodeWavRaw(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = buf.getShort(dataOff + 2 * i).toInt
      i += 1
    }
    (rate, out)
  }

  /** Strict RIFF/WAVE chunk walk shared by the feature and sample
    * decoders. @return (rate, channels, bits, data offset, n samples) */
  private def decodeWavRaw(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, len: Int) = new String(bytes, off, len, "US-ASCII")
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(ascii(0, 4) == "RIFF", s"bad magic ${ascii(0, 4)}")
    require(ascii(8, 4) == "WAVE", s"bad form type ${ascii(8, 4)}")
    var off = 12L
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || rate < 0)) {
      val id = ascii(off.toInt, 4)
      val len = buf.getInt(off.toInt + 4)
      // bound check in Long: a crafted len near Int.MaxValue must fail
      // the require, not wrap the offset arithmetic
      require(len >= 0 && off + 8L + len <= bytes.length,
        s"chunk $id overruns blob (len $len at $off)")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len)")
          val fmt = buf.getShort(off.toInt + 8).toInt
          require(fmt == 1, s"not PCM (format $fmt)")
          channels = buf.getShort(off.toInt + 10).toInt
          require(channels == 1,
            s"unsupported channel count $channels (mono only — " +
              "interleaved frames would silently skew every feature)")
          rate = buf.getInt(off.toInt + 12)
          bits = buf.getShort(off.toInt + 22).toInt
          require(bits == 16, s"unsupported bit depth $bits")
        case "data" => dataOff = off.toInt + 8; dataLen = len
        case _ => () // LIST/INFO/fact etc: skip
      }
      off += 8L + len + (len & 1) // odd chunks carry a pad byte
    }
    require(rate > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    // an odd length would silently drop the trailing byte — foreign
    // blobs with a corrupt data chunk must fail loudly, not skew n
    require(dataLen % 2 == 0, s"odd PCM16 data length $dataLen")
    (rate, channels, bits, dataOff, dataLen / 2)
  }

  /** Per-partition WAV encode: one ByteBuffer per row, no driver
    * involvement — the write half of the audio plumbing. */
  def encodeWavTable(rows: Dataset[PcmRow],
      sampleRate: Int): Dataset[WavRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r =>
      WavRow(r.doc_id, encodeWavPcm16(r.samples, sampleRate))))
  }

  /** Per-partition WAV decode → exact-integer features. The REAL
    * decode analog of [[extractFeatures]]: same map-only batch shape,
    * but the parser actually reads the bytes. */
  def wavFeatureTable(media: Dataset[WavRow]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      decodeWavPcm16(r.content).copy(doc_id = r.doc_id)))
  }

  // --------------------------------------------------------------- BMP
  // The image analog of the WAV path: 24-bit uncompressed BMP is pure
  // byte arithmetic (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
  // BGR rows padded to 4 bytes), so grayscale image blobs round-trip
  // for real too.

  case class GrayRow(doc_id: Long, lumas: Seq[Int])

  case class BmpFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_gray: Long, max_gray: Int,
      first_gray: Int, last_gray: Int)

  /** Encode a grayscale pixel sequence (row-major, top-left first,
    * values clamped to 0..255 written as r=g=b) into a standard
    * 24-bit BMP. `width` must divide into complete rows
    * (lumas.length % width == 0) — no fake padding pixels. */
  def encodeBmpGray24(lumas: Seq[Int], width: Int): Array[Byte] = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(lumas.nonEmpty && lumas.length % width == 0,
      s"${lumas.length} pixels do not fill rows of $width")
    val height = lumas.length / width
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(width).putInt(height) // positive = bottom-up
      .putShort(1.toShort).putShort(24.toShort) // planes, bpp
      .putInt(0).putInt(dataLen) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = height - 1 // bottom-up storage order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = math.max(0, math.min(255, lumas(y * width + x))).toByte
        buf.put(v).put(v).put(v) // B G R
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP into exact-integer grayscale
    * features (luma = the green channel — encode writes r=g=b).
    * Handles both bottom-up (positive height) and top-down (negative)
    * row order and the 4-byte row padding; strict elsewhere, throwing
    * IllegalArgumentException on any malformed field. first/last are
    * in LOGICAL order (top-left / bottom-right), so a row-order bug
    * flips them even when the sums agree. */
  def decodeBmpGray24(bytes: Array[Byte]): BmpFeatures = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "bad magic")
    val dataOff = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(width >= 1 && width <= (1 << 28),
      s"bad width $width") // 1<<28 keeps width*3 safely inside Int
    // Int.MinValue is its own abs(): the height below would stay
    // negative, the bound require would pass on a negative product,
    // and the pixel loop would silently skip — fabricated features
    // instead of the contracted loud failure
    require(rawHeight != 0 && rawHeight != Int.MinValue,
      s"bad height $rawHeight")
    require(bpp == 24, s"unsupported bit depth $bpp")
    require(compression == 0, s"compressed BMP ($compression)")
    val height = math.abs(rawHeight)
    val topDown = rawHeight < 0
    // stride in Long first: a crafted width near Int.MaxValue must
    // fail the bound require, not wrap negative and dodge it
    val strideL = width.toLong * 3 + (4 - (width.toLong * 3) % 4) % 4
    require(dataOff >= 54 &&
      dataOff.toLong + strideL * height <= bytes.length,
      s"pixel data overruns blob (offset $dataOff, stride $strideL)")
    val stride = strideL.toInt
    var sum = 0L; var maxG = 0
    var first = -1; var last = -1
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val base = dataOff + srcRow * stride
      var x = 0
      while (x < width) {
        val g = bytes(base + 3 * x + 1) & 0xff
        sum += g
        if (g > maxG) maxG = g
        if (first < 0) first = g
        last = g
        x += 1
      }
      y += 1
    }
    BmpFeatures(0L, width, height, width.toLong * height, sum, maxG,
      first, last)
  }

  /** Per-partition BMP encode of one-row-per-doc grayscale strips
    * (width = pixel count, height 1 — callers with 2-D content pass
    * row-major lumas and their width via [[encodeBmpGray24]]). */
  def encodeBmpTable(rows: Dataset[GrayRow]): Dataset[WavRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r =>
      WavRow(r.doc_id, encodeBmpGray24(r.lumas, r.lumas.length))))
  }

  /** Per-partition BMP decode → exact-integer features. */
  def bmpFeatureTable(media: Dataset[WavRow]): Dataset[BmpFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      decodeBmpGray24(r.content).copy(doc_id = r.doc_id)))
  }

  // --------------------------------------------------------------- PNG
  // A REAL compressed codec with zero new jars: PNG's compression is
  // zlib (java.util.zip.Deflater/Inflater, in the JDK since 1.1) and
  // its five scanline filters are pure byte arithmetic — so unlike
  // JPEG (DCT + Huffman tables + chroma upsampling), a strict
  // non-interlaced 8-bit decoder fits the same hardened-parser
  // discipline as the WAV chunk walker above. Scope: bit depth 8,
  // color types 0 (grayscale) and 2 (RGB), interlace 0 — the shape
  // training-data thumbnails actually take; everything else fails
  // loudly with the offending field named.

  case class PngFeatures(doc_id: Long, width: Int, height: Int,
      color_type: Int, n_pixels: Long, sum_gray: Long, max_gray: Int,
      first_gray: Int, last_gray: Int)

  private val PngSig: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  /** Paeth predictor (PNG spec §9.4): the nearest of left/up/up-left
    * to their linear extrapolation, ties broken left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a grayscale pixel sequence (row-major, top-left first,
    * clamped to 0..255) as a standard non-interlaced 8-bit grayscale
    * PNG. Scanline filters ROTATE through all five types (row % 5:
    * None/Sub/Up/Average/Paeth) so a decode of this encoder's output
    * genuinely exercises every reconstruction path — a decoder that
    * botches any one filter cannot round-trip even one 5-row image.
    * Pure function — runs inside mapPartitions. */
  def encodePngGray8(lumas: Seq[Int], width: Int): Array[Byte] = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(lumas.nonEmpty && lumas.length % width == 0,
      s"${lumas.length} pixels do not fill rows of $width")
    val height = lumas.length / width
    val stride = width + 1 // filter byte + one byte per pixel
    val raw = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * stride) = f.toByte
      def orig(yy: Int, xx: Int): Int =
        if (yy < 0 || xx < 0) 0
        else math.max(0, math.min(255, lumas(yy * width + xx)))
      var x = 0
      while (x < width) {
        val o = orig(y, x)
        val a = orig(y, x - 1); val b = orig(y - 1, x)
        val c = orig(y - 1, x - 1)
        val filt = f match {
          case 0 => o
          case 1 => o - a
          case 2 => o - b
          case 3 => o - ((a + b) / 2)
          case 4 => o - paeth(a, b, c)
        }
        raw(y * stride + 1 + x) = (filt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val zBuf = new Array[Byte](8192)
    while (!defl.finished()) zOut.write(zBuf, 0, defl.deflate(zBuf))
    defl.end()
    val idat = zOut.toByteArray
    val out = java.nio.ByteBuffer
      .allocate(8 + (12 + 13) + (12 + idat.length) + 12)
      .order(java.nio.ByteOrder.BIG_ENDIAN) // PNG is BE throughout
    PngSig.foreach(b => out.put(b.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val tagged = typ.getBytes("US-ASCII") ++ data
      out.put(tagged)
      out.putInt(crc32(tagged, 0, tagged.length))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type 0 = grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // zlib, filter0, no interlace
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.array()
  }

  /** Parse a non-interlaced 8-bit grayscale/RGB PNG into exact-integer
    * grayscale features (luma = the gray sample for color type 0, the
    * green channel for color type 2 — matching decodeBmpGray24).
    * Strict per the fail-loudly contract: signature, IHDR-first,
    * per-chunk CRC32 verification, chunk-length bounds walked in Long,
    * inflated size must equal the scanline geometry EXACTLY (a
    * truncated or over-long IDAT stream throws), filter bytes must be
    * 0-4, IEND must close the stream. Ancillary chunks (tEXt, pHYs,
    * gAMA…) are skipped after their CRC checks out. */
  def decodePngGray8(bytes: Array[Byte]): PngFeatures = {
    val (width, height, colorType, raw, stride, bpp, lumaOff) =
      decodePngRaw(bytes)
    var sum = 0L; var maxG = 0; var first = -1; var last = -1
    var y = 0
    while (y < height) {
      val base = y * stride + 1
      var x = 0
      while (x < width) {
        val g = raw(base + x * bpp + lumaOff) & 0xff
        sum += g
        if (g > maxG) maxG = g
        if (first < 0) first = g
        last = g
        x += 1
      }
      y += 1
    }
    PngFeatures(0L, width, height, colorType,
      width.toLong * height, sum, maxG, first, last)
  }

  /** Decoded luma plane as a row-major Int array (gray sample / green
    * channel) — the pixel-space access the perceptual-hash path needs
    * on top of [[decodePngGray8]]'s summary features. Same strict
    * parse ([[decodePngRaw]]). @return (width, height, lumas) */
  def decodePngLumas(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (width, height, _, raw, stride, bpp, lumaOff) =
      decodePngRaw(bytes)
    val out = new Array[Int](width * height)
    var y = 0; var k = 0
    while (y < height) {
      val base = y * stride + 1
      var x = 0
      while (x < width) {
        out(k) = raw(base + x * bpp + lumaOff) & 0xff
        k += 1
        x += 1
      }
      y += 1
    }
    (width, height, out)
  }

  /** Strict PNG parse + zlib inflate + per-row unfilter shared by the
    * feature and pixel decoders: signature, CRC-verified chunk walk,
    * exact-geometry Inflater drain, and filter reconstruction.
    * @return (width, height, colorType, reconstructed scanline buffer,
    *         stride, bytes-per-pixel, luma offset within a pixel) */
  private def decodePngRaw(
      bytes: Array[Byte]): (Int, Int, Int, Array[Byte], Int, Int, Int) = {
    require(bytes.length >= 8 + 25 + 12 + 12,
      s"truncated PNG: ${bytes.length} bytes")
    var i = 0
    while (i < 8) {
      require((bytes(i) & 0xff) == PngSig(i),
        s"bad signature byte $i: 0x${"%02x".format(bytes(i) & 0xff)}")
      i += 1
    }
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    var off = 8L
    var width = -1; var height = -1; var colorType = -1
    var ihdrSeen = false; var iendSeen = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!iendSeen) {
      require(off + 12 <= bytes.length,
        s"chunk header overruns blob at $off")
      val len = buf.getInt(off.toInt)
      // bound in Long: a crafted len near Int.MaxValue must fail the
      // require, not wrap the offset arithmetic (the WAV-walker rule)
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"chunk overruns blob (len $len at $off)")
      val typ = new String(bytes, off.toInt + 4, 4, "US-ASCII")
      val stored = buf.getInt(off.toInt + 8 + len)
      val computed = crc32(bytes, off.toInt + 4, 4 + len)
      require(stored == computed,
        f"$typ CRC mismatch (stored 0x$stored%08x, computed 0x$computed%08x)")
      if (!ihdrSeen) require(typ == "IHDR", s"first chunk is $typ")
      typ match {
        case "IHDR" =>
          require(!ihdrSeen, "duplicate IHDR")
          ihdrSeen = true
          require(len == 13, s"IHDR length $len")
          width = buf.getInt(off.toInt + 8)
          height = buf.getInt(off.toInt + 12)
          val bitDepth = bytes(off.toInt + 16) & 0xff
          colorType = bytes(off.toInt + 17) & 0xff
          val compression = bytes(off.toInt + 18) & 0xff
          val filterMethod = bytes(off.toInt + 19) & 0xff
          val interlace = bytes(off.toInt + 20) & 0xff
          require(width >= 1 && width <= (1 << 24), s"bad width $width")
          require(height >= 1 && height <= (1 << 24),
            s"bad height $height")
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(colorType == 0 || colorType == 2,
            s"unsupported color type $colorType (gray/RGB only)")
          require(compression == 0, s"bad compression $compression")
          require(filterMethod == 0, s"bad filter method $filterMethod")
          require(interlace == 0,
            s"interlaced PNG unsupported (interlace $interlace)")
        case "IDAT" => idat.write(bytes, off.toInt + 8, len)
        case "IEND" =>
          require(len == 0, s"IEND carries $len bytes")
          iendSeen = true
        case _ => () // ancillary: CRC already verified, content skipped
      }
      off += 12L + len
    }
    require(ihdrSeen, "no IHDR chunk")
    require(idat.size > 0, "no IDAT chunk")
    val bpp = if (colorType == 0) 1 else 3
    val strideL = 1L + width.toLong * bpp
    val rawLenL = strideL * height
    require(rawLenL <= Int.MaxValue - 8,
      s"scanline buffer too large ($rawLenL bytes)")
    val raw = new Array[Byte](rawLenL.toInt)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n =
          try infl.inflate(raw, got, raw.length - got)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"corrupt IDAT zlib stream: ${e.getMessage}")
          }
        require(n > 0 || infl.finished(),
          s"IDAT stream stalls at $got of ${raw.length} bytes")
        got += n
      }
      require(got == raw.length,
        s"IDAT inflates to $got bytes, scanlines need ${raw.length}")
      // the stream must END here: extra pixel data means the geometry
      // lies about the image, which a strict parser must not paper over
      val probe = new Array[Byte](1)
      val extra =
        try infl.inflate(probe)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"corrupt IDAT zlib tail: ${e.getMessage}")
        }
      require(extra == 0 && infl.finished(),
        "IDAT stream continues past the scanline geometry")
    } finally infl.end()
    // unfilter in place, top-down (reconstruction needs the prior row)
    val stride = strideL.toInt
    val rowBytes = stride - 1
    var y = 0
    while (y < height) {
      val base = y * stride
      val filter = raw(base) & 0xff
      require(filter <= 4, s"bad filter type $filter in row $y")
      var x = 0
      while (x < rowBytes) {
        val cur = raw(base + 1 + x) & 0xff
        val a = if (x >= bpp) raw(base + 1 + x - bpp) & 0xff else 0
        val b = if (y > 0) raw(base - stride + 1 + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp)
          raw(base - stride + 1 + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) / 2)
          case 4 => cur + paeth(a, b, c)
        }
        raw(base + 1 + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val lumaOff = if (colorType == 0) 0 else 1
    (width, height, colorType, raw, stride, bpp, lumaOff)
  }

  case class Png2dRow(doc_id: Long, lumas: Seq[Int], width: Int)

  /** Per-partition PNG encode of row-major grayscale images. */
  def encodePngTable(rows: Dataset[Png2dRow]): Dataset[WavRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r =>
      WavRow(r.doc_id, encodePngGray8(r.lumas, r.width))))
  }

  /** Per-partition PNG decode → exact-integer features. */
  def pngFeatureTable(media: Dataset[WavRow]): Dataset[PngFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      decodePngGray8(r.content).copy(doc_id = r.doc_id)))
  }

  /** Nearest-neighbor resize of a row-major luma plane — the REAL
    * pixel half of the preprocessing step [[resizeDims]] only sized:
    * target pixel (i, j) samples source (⌊i·H/th⌋, ⌊j·W/tw⌋) — exact
    * integer selection (no interpolation arithmetic to diverge
    * cross-engine), valid for down- AND up-sampling. */
  def resizePixels(lumas: Array[Int], width: Int, height: Int,
      tw: Int, th: Int): Array[Int] = {
    require(width >= 1 && height >= 1 &&
      width.toLong * height == lumas.length,
      s"bad source geometry ${width}x$height for ${lumas.length} lumas")
    // 2^28 keeps tw*th inside Int (and the thumbnail under 1 GiB)
    require(tw >= 1 && th >= 1 && tw.toLong * th <= (1L << 28),
      s"bad target geometry ${tw}x$th")
    val out = new Array[Int](tw * th)
    var i = 0
    while (i < th) {
      val sr = (i.toLong * height / th).toInt
      var j = 0
      while (j < tw) {
        val sc = (j.toLong * width / tw).toInt
        out(i * tw + j) = lumas(sr * width + sc)
        j += 1
      }
      i += 1
    }
    out
  }

  case class DHashRow(doc_id: Long, width: Int, height: Int, dhash: Long)

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint of image-dedup pipelines, cf. pHash/aHash family):
    * the luma plane is average-pooled onto an 8×9 grid (cell (i,j)
    * covers pixel rows r with ⌊8r/H⌋ = i and cols c with ⌊9c/W⌋ = j —
    * every cell non-empty whenever H ≥ 8, W ≥ 9), and bit i·8+j is
    * set iff cell (i,j)'s mean luma exceeds its right neighbor's.
    * Near-identical images (re-encode, small edit, brightness-
    * preserving noise) land within a few bits of Hamming distance;
    * the comparison is cross-multiplied (sum·count vs sum·count), so
    * the hash is EXACT integer arithmetic end to end — bit-stable
    * across engines, never a float mean.
    *
    * The 4-gigapixel bound keeps the cross-multiplication inside
    * Long: cell count ≤ WH/72 + W + H, cell sum ≤ 255× that, so the
    * product stays < 2⁶² for WH ≤ 2³². */
  def dHash64(lumas: Array[Int], width: Int, height: Int): Long = {
    require(width >= 9 && height >= 8,
      s"dHash needs width >= 9 and height >= 8, got ${width}x$height")
    // Long-side bound BEFORE the length equality: width*height in Int
    // could wrap and make the mismatch message lie about the cause
    require(width.toLong * height <= (1L << 32),
      s"image above 4 gigapixels (${width}x$height)")
    require(width.toLong * height == lumas.length,
      s"luma count ${lumas.length} != ${width}x$height")
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < height) {
      val i = (r * 8L / height).toInt
      var c = 0
      while (c < width) {
        val j = (c * 9L / width).toInt
        sums(i)(j) += lumas(r * width + c)
        cnts(i)(j) += 1L
        c += 1
      }
      r += 1
    }
    var h = 0L
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (sums(i)(j) * cnts(i)(j + 1) > sums(i)(j + 1) * cnts(i)(j))
          h |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    h
  }

  /** Per-partition PNG decode → dHash — the map-only fingerprint pass
    * of an image-dedup pipeline (decode and hash never leave the
    * partition; only 8-byte hashes shuffle afterwards). */
  def pngDHashTable(media: Dataset[WavRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, lumas) = decodePngLumas(r.content)
      DHashRow(r.doc_id, w, h, dHash64(lumas, w, h))
    })
  }

  /** Per-partition GIF decode → dHash — [[pngDHashTable]]'s GIF
    * sibling: the hash is computed from DECODED pixels, so the same
    * picture hashes identically whichever codec stored it (pinned as
    * data by the codec-invariance gate row). */
  def gifDHashTable(media: Dataset[WavRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, lumas) = decodeGifLumas(r.content)
      DHashRow(r.doc_id, w, h, dHash64(lumas, w, h))
    })
  }

  /** Perceptual near-duplicate image pairs over a dHash table: the
    * 64-bit hash splits into four 16-bit bands — by pigeonhole any
    * pair within Hamming distance 3 shares at least one band intact
    * (guaranteed recall), and pairs out to maxHamming are found
    * whenever their differing bits cluster into ≤ 3 bands (the
    * standard 4×16 banding trade). Candidates share ANY band exactly
    * (Dedup.candidatePairs — bounded buckets, skew cap),
    * and survivors verify by bit_count(xor) ≤ maxHamming. The
    * perceptual sibling of text SimHash dedup, generic over any
    * 64-bit fingerprint — [[dHash64]] image hashes and
    * [[audioEnergyHash64]] audio hashes both feed it; because the
    * hashes come from DECODED content, a re-compressed copy of the
    * same picture or clip still collides.
    *
    * Scale model (PerceptualSmoke-measured, BENCH_NOTES round-8 stanza): true
    * pairs grow linearly, but random band collisions add
    * ~4·N²/2¹⁷ verify-only candidates (birthday on four 16-bit
    * bands — the realized counts match this prediction within 0.2%).
    * The constant is tiny, the term is quadratic: beyond ~10M hashes
    * per invocation, SHARD the corpus (near-dups of a shard union are
    * the union of per-shard runs plus cross-shard runs) or extend the
    * banding; `maxBucketSize` protects against HOT buckets
    * (boilerplate blank thumbnails), not against this diffuse term.
    * A capped bucket trades RECALL, never correctness: its candidates
    * are dropped (logged by candidatePairs), so pairs meeting only in
    * an over-cap bucket go unreported — every reported pair is still
    * exact. Oracles restating this operator are UNCAPPED; gate parity
    * holds because fixture buckets stay far below the cap (asserted
    * in MultimodalSpec).
    * @return (id1, id2, hamming) with id1 < id2 */
  /** The 4×16-bit band keys of a 64-bit hash — THE banding scheme of
    * the perceptual near-dup family, defined once so the batch
    * operator, the incremental index, and the smoke harness can never
    * silently diverge (extend the banding HERE and everything moves
    * together). */
  private[graft] def bands64(hashCol: Column): Column =
    array((0 until 4).map(k =>
      concat(lit(s"b$k:"),
        shiftrightunsigned(hashCol, 16 * k)
          .bitwiseAND(lit(0xffffL)).cast("string"))): _*)

  def hammingNearDupPairs(hashes: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int = 10,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming ($maxHamming) out of [0, 64]")
    val h = hashes.select(col(idCol), col(hashCol).cast("long").as("__dh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = h.withColumn("__bands", bands64(col("__dh")))
    val pairs = Dedup.candidatePairs(banded, idCol, "__bands",
      maxBucketSize)
    val result = pairs
      .join(h.withColumnRenamed(idCol, "id1")
        .withColumnRenamed("__dh", "__h1"), "id1")
      .join(h.withColumnRenamed(idCol, "id2")
        .withColumnRenamed("__dh", "__h2"), "id2")
      .withColumn("hamming", bit_count(col("__h1").bitwiseXOR(col("__h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
      .localCheckpoint(true)
    h.unpersist()
    result
  }

  // --------------------------------------------------------------- GIF
  // A FOURTH real compressed codec (beside PNG/zip deflate and Avro
  // deflate): GIF's LZW is a genuinely different compression family
  // (dictionary codes with growing code width, LSB-first bit packing,
  // 255-byte sub-blocks), implemented here from the GIF89a spec in
  // pure Scala — no library involved at all.

  case class GifFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_gray: Long, max_gray: Int,
      first_gray: Int, last_gray: Int)

  /** GIF-variant LZW encode of 8-bit index data: 9→12-bit growing
    * codes, clear/EOI, dictionary reset at 4096, LSB-first packing. */
  private def lzwEncode(idx: Array[Int]): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    var cur = idx(0)
    var i = 1
    while (i < idx.length) {
      val k = idx(i)
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next == 4096) {
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = eoi + 1
          codeSize = minCode + 1
        } else {
          dict.put(key, Integer.valueOf(next))
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decode (strict): mirrors [[lzwEncode]]'s growth
    * rule — the decoder's table lags the encoder's by one entry, so
    * its width switch fires at 2ⁿ−1 (the classic GIF off-by-one). */
  private def lzwDecode(data: Array[Byte], nExpected: Int): Array[Int] = {
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    val out = new Array[Int](nExpected)
    var outN = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    def expandInto(code: Int): Int = { // returns first byte
      // walk to the root collecting the chain, then write forward
      var stack = List.empty[Int]
      var c = code
      while (c >= clear + 2) { stack = append(c) :: stack; c = prefix(c) }
      val first = c
      require(first < clear, s"corrupt LZW chain root $first")
      require(outN + 1 + stack.length <= nExpected,
        s"LZW output overruns ${nExpected} pixels")
      out(outN) = first; outN += 1
      stack.foreach { b => out(outN) = b; outN += 1 }
      first
    }
    var done = false
    while (!done) {
      while (bitCnt < codeSize && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      require(bitCnt >= codeSize, "LZW stream truncated")
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      if (code == clear) {
        next = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"first code after clear is $code")
        require(outN < nExpected, "LZW output overruns")
        out(outN) = code; outN += 1
        prev = code
      } else {
        require(code <= next, s"LZW code $code beyond table ($next)")
        val first =
          if (code < next) expandInto(code)
          else { // code == next: the KwKwK case
            val f = firstByteOf(code = prev, clear, prefix, append)
            // entry = expand(prev) ++ first(expand(prev))
            val start = outN
            expandInto(prev)
            require(outN < nExpected, "LZW output overruns")
            out(outN) = f; outN += 1
            out(start) // first byte of prev's expansion
          }
        if (next < 4096) {
          prefix(next) = prev
          append(next) = first
          next += 1
          if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(outN == nExpected,
      s"LZW decoded $outN pixels, geometry says $nExpected")
    out
  }

  private def firstByteOf(code: Int, clear: Int,
      prefix: Array[Int], append: Array[Int]): Int = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c
  }

  /** Encode 8-bit grayscale pixels into a standard GIF89a blob:
    * logical screen + 256-entry grayscale palette + one image block,
    * LZW-compressed, 255-byte sub-blocks. */
  def encodeGifGray8(lumas: Seq[Int], width: Int): Array[Byte] = {
    require(width >= 1 && width <= 0xffff, s"bad width $width")
    require(lumas.nonEmpty && lumas.length % width == 0,
      s"luma count ${lumas.length} not a multiple of width $width")
    val height = lumas.length / width
    require(height <= 0xffff, s"bad height $height")
    require(lumas.forall(g => g >= 0 && g <= 255), "luma out of [0,255]")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0xf7) // GCT present, 8 bits/color, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect
    var g = 0
    while (g < 256) { out.write(g); out.write(g); out.write(g); g += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no LCT, no interlace
    out.write(8)    // LZW min code size
    val lzw = lzwEncode(lumas.toArray)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Strict GIF decode → exact-integer grayscale features: signature,
    * screen descriptor, REQUIRED grayscale global palette (r = g = b —
    * color GIFs fail loudly, nothing is averaged silently), extension
    * blocks skipped by length, single non-interlaced image, LZW
    * inflate with exact pixel-count geometry check, trailing-data
    * check. The fail-loudly contract of the WAV/BMP/PNG walkers. */
  def decodeGifGray8(bytes: Array[Byte]): GifFeatures = {
    val (width, height, lumas) = decodeGifLumas(bytes)
    var sum = 0L; var maxG = 0
    var k = 0
    while (k < lumas.length) {
      val g2 = lumas(k)
      sum += g2
      if (g2 > maxG) maxG = g2
      k += 1
    }
    GifFeatures(0L, width, height, lumas.length.toLong, sum, maxG,
      lumas(0), lumas(lumas.length - 1))
  }

  /** Decoded GIF luma plane as a row-major Int array — the pixel-space
    * access the perceptual-hash path needs on top of
    * [[decodeGifGray8]]'s summary features (same strict parse).
    * @return (width, height, lumas) */
  def decodeGifLumas(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 13, s"truncated GIF: ${bytes.length} bytes")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"bad signature $sig")
    def at(o: Int): Int = {
      require(o < bytes.length, s"blob ends at $o (truncated GIF)")
      bytes(o) & 0xff
    }
    def u16(off: Int): Int = at(off) | (at(off + 1) << 8)
    val packed = bytes(10) & 0xff
    require((packed & 0x80) != 0, "no global color table")
    val gctSize = 2 << (packed & 7)
    var off = 13
    val palette = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      val r = at(off)
      val gg = at(off + 1)
      val b = at(off + 2)
      require(r == gg && gg == b,
        s"non-grayscale palette entry $i ($r,$gg,$b)")
      palette(i) = r
      i += 1
      off += 3
    }
    // walk blocks: skip extensions, find the image descriptor
    while (at(off) == 0x21) {
      off += 2 // 0x21 + label
      var blk = at(off)
      while (blk != 0) {
        off += 1 + blk
        blk = at(off)
      }
      off += 1 // terminator
    }
    require(at(off) == 0x2c,
      f"expected image descriptor, got 0x${at(off)}%02x")
    val width = u16(off + 5)
    val height = u16(off + 7)
    val ipacked = at(off + 9)
    require((ipacked & 0x80) == 0, "local color table unsupported")
    require((ipacked & 0x40) == 0, "interlaced GIF unsupported")
    require(width >= 1 && height >= 1, s"bad geometry ${width}x$height")
    // Long-side bound BEFORE any allocation: header-claimed geometry
    // must not drive an Int overflow or a multi-GB buffer from a
    // tiny crafted blob (the dHash64/resizePixels rule)
    require(width.toLong * height <= (1L << 28),
      s"image above 256 megapixels (${width}x$height)")
    off += 10
    val minCode = at(off)
    require(minCode == 8, s"unsupported LZW min code size $minCode")
    off += 1
    val data = new java.io.ByteArrayOutputStream()
    var blk = at(off)
    while (blk != 0) {
      require(off + 1 + blk < bytes.length, "image data overruns blob")
      data.write(bytes, off + 1, blk)
      off += 1 + blk
      blk = at(off)
    }
    off += 1
    require(at(off) == 0x3b, "missing GIF trailer")
    require(off == bytes.length - 1,
      s"${bytes.length - 1 - off} trailing bytes after trailer")
    val nPix = width * height
    val idx = lzwDecode(data.toByteArray, nPix)
    val lumas = new Array[Int](nPix)
    var k = 0
    while (k < nPix) {
      val ci = idx(k)
      require(ci < gctSize, s"pixel index $ci outside palette")
      lumas(k) = palette(ci)
      k += 1
    }
    (width, height, lumas)
  }

  /** Per-partition GIF encode of row-major grayscale images. */
  def encodeGifTable(rows: Dataset[Png2dRow]): Dataset[WavRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r =>
      WavRow(r.doc_id, encodeGifGray8(r.lumas, r.width))))
  }

  /** Per-partition JPEG encode of row-major grayscale images
    * ([[Jpeg.encodeJpegGray]], flat quant ≈ quality 100) — baseline
    * SOF0 by default; `progressive`/`successiveApprox` select the
    * SOF2 scripts (the latter is the libjpeg-style real-web
    * progressive shape the q410 gate re-encodes through). */
  def encodeJpegTable(rows: Dataset[Png2dRow],
      quant: Array[Int] = Jpeg.QuantFlat,
      progressive: Boolean = false,
      successiveApprox: Boolean = false): Dataset[WavRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map(r =>
      WavRow(r.doc_id, Jpeg.encodeJpegGray(r.lumas, r.width, quant,
        progressive = progressive, successiveApprox = successiveApprox))))
  }

  /** Per-partition JPEG decode → dHash — [[pngDHashTable]]'s JPEG
    * sibling. JPEG is LOSSY, so unlike the PNG/GIF pair (hash
    * equality, q403) a JPEG re-encode lands WITHIN A FEW BITS of the
    * source hash — close enough that [[hammingNearDupPairs]] still
    * pairs the copies (the bound q407 pins as data). */
  def jpegDHashTable(media: Dataset[WavRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, lumas) = Jpeg.decodeJpegLumas(r.content)
      DHashRow(r.doc_id, w, h, dHash64(lumas, w, h))
    })
  }

  /** Per-partition GIF decode → exact-integer features. */
  def gifFeatureTable(media: Dataset[WavRow]): Dataset[GifFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      decodeGifGray8(r.content).copy(doc_id = r.doc_id)))
  }

  case class AudioHashRow(doc_id: Long, sample_rate: Int,
      n_samples: Long, ahash: Long)

  /** 64-bit audio energy-difference fingerprint — [[dHash64]]'s audio
    * sibling (the FFT-free cousin of spectral fingerprints à la
    * Chromaprint: with no DSP library in this environment, the
    * time-domain energy envelope stands in for the spectrogram): the
    * sample stream splits into 65 equal-share frames (frame f covers
    * samples k with ⌊65k/n⌋ = f), per-frame energy is the exact
    * Σ s² (BIGINT), and bit i is set iff frame i's MEAN energy
    * strictly exceeds frame i+1's — compared cross-multiplied, so the
    * hash is exact integer arithmetic end to end. Loudness-profile-
    * preserving edits (re-encode, small sample noise, level-neutral
    * patches) move few bits; unrelated clips differ in ~32.
    *
    * The 4M-sample bound (≈ 8.7 min at 8 kHz — fingerprint longer
    * audio per chunk upstream) keeps the cross-multiplication inside
    * Long: frame count ≤ n/65 + 1, frame energy ≤ 2³⁰ × that. */
  def audioEnergyHash64(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= 65, s"audio fingerprint needs >= 65 samples, got $n")
    require(n <= 4000000, s"fingerprint chunks must be <= 4M samples ($n)")
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var k = 0
    while (k < n) {
      val f = (k.toLong * 65L / n).toInt
      sums(f) += samples(k).toLong * samples(k)
      cnts(f) += 1L
      k += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i)) h |= 1L << i
      i += 1
    }
    h
  }

  /** Per-partition WAV decode → audio fingerprint — the map-only
    * hash pass of an audio-dedup pipeline (decode and hash never
    * leave the partition; only 8-byte hashes shuffle afterwards).
    * Feed the output to [[hammingNearDupPairs]]. */
  def wavAudioHashTable(media: Dataset[WavRow]): Dataset[AudioHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, samples) = decodeWavSamples(r.content)
      AudioHashRow(r.doc_id, rate, samples.length.toLong,
        audioEnergyHash64(samples))
    })
  }

  /** 64-bit SPECTRAL audio fingerprint, gain-invariant by
    * construction — the frequency-domain upgrade of
    * [[audioEnergyHash64]] (whose amplitude envelope a volume change
    * defeats), following the band-energy-comparison design of
    * Haitsma & Kalker 2002 with an INTEGER spectral transform: the
    * stream chops into 8-sample windows (remainder dropped), each
    * window takes an 8-point natural-order Walsh–Hadamard transform
    * (coefficients are ±1 — exact integer arithmetic, the classic
    * cheap-DCT substitute, so no cos table and no float anywhere),
    * window w of W belongs to frame ⌊16w/W⌋, and per (frame, band)
    * the energy Σ coef² accumulates as an exact BIGINT. Bit f·4+k
    * (16 frames × 4 comparisons) is set iff band k's energy strictly
    * exceeds band k+4's WITHIN the same frame — a comparison of two
    * energies that any uniform gain g scales by the same g², so the
    * hash is EXACTLY invariant under exact scaling (×2 always; ÷2
    * when samples are even) and robust to quantized gain changes
    * (bits flip only where band energies nearly tie). Unrelated
    * clips differ in ~32 bits; feed [[hammingNearDupPairs]].
    *
    * Long bounds: |coef| ≤ 8·2¹⁵ = 2¹⁸, coef² ≤ 2³⁶, ≤ 2¹⁹ windows
    * per frame at the 4M-sample cap → energy < 2⁵⁵. That analysis
    * assumes 16-bit samples, so the range is ENFORCED (strict-contract
    * convention): [[decodeWavSamples]] output always satisfies it; a
    * caller feeding wider integers would silently overflow c·c and
    * hash garbage. Needs ≥ 128 samples (W ≥ 16 keeps every frame
    * non-empty). */
  def spectralWhtHash64(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= 128, s"spectral fingerprint needs >= 128 samples, got $n")
    require(n <= 4000000, s"fingerprint chunks must be <= 4M samples ($n)")
    var i0 = 0
    while (i0 < n) {
      val s = samples(i0)
      require(s >= -32768 && s <= 32767,
        s"sample $s at $i0 outside 16-bit PCM range (the exact-integer " +
          "energy bound assumes |sample| < 2^15)")
      i0 += 1
    }
    val nw = n / 8
    val energy = Array.ofDim[Long](16, 8)
    var w = 0
    while (w < nw) {
      val f = (w.toLong * 16L / nw).toInt
      var k = 0
      while (k < 8) {
        var c = 0L
        var t = 0
        while (t < 8) {
          if (java.lang.Integer.bitCount(k & t) % 2 == 0)
            c += samples(8 * w + t)
          else c -= samples(8 * w + t)
          t += 1
        }
        energy(f)(k) += c * c
        k += 1
      }
      w += 1
    }
    var h = 0L
    var f = 0
    while (f < 16) {
      var k = 0
      while (k < 4) {
        if (energy(f)(k) > energy(f)(k + 4)) h |= 1L << (f * 4 + k)
        k += 1
      }
      f += 1
    }
    h
  }

  /** Per-partition WAV decode → spectral fingerprint —
    * [[wavAudioHashTable]]'s gain-invariant sibling (same map-only
    * shape; only 8-byte hashes shuffle). */
  def wavSpectralHashTable(media: Dataset[WavRow]): Dataset[AudioHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, samples) = decodeWavSamples(r.content)
      AudioHashRow(r.doc_id, rate, samples.length.toLong,
        spectralWhtHash64(samples))
    })
  }

  /** Linear-interpolation PCM resampler, exact integer in and out —
    * the resizePixels convention brought to the time axis: output
    * sample i sits at source position i·fromRate/toRate held as an
    * EXACT rational (numerator i·fromRate, denominator toRate; no
    * float anywhere), taking the source sample on an exact hit and
    * the floor of the linear interpolation between the two
    * neighbors otherwise (floorDiv — one deterministic rounding
    * rule for positive and negative samples alike). Output length
    * ⌊n·toRate/fromRate⌋. Doubling then halving a rate is the
    * IDENTITY by construction (even output positions are exact
    * hits), which is what makes resample-robust dedup oracle-exact;
    * non-integer ratios interpolate and are spec-pinned. Values
    * interpolate between in-range neighbors, so 16-bit inputs stay
    * 16-bit — [[spectralWhtHash64]]'s range contract survives. */
  def resampleLinear(samples: Array[Int], fromRate: Int,
      toRate: Int): Array[Int] = {
    require(fromRate >= 1 && toRate >= 1,
      s"sample rates must be >= 1 (got $fromRate -> $toRate)")
    require(samples.nonEmpty, "cannot resample an empty stream")
    if (fromRate == toRate) return samples
    val n = samples.length
    val nOutL = n.toLong * toRate / fromRate
    require(nOutL >= 1,
      s"resampling $n samples $fromRate -> $toRate leaves none")
    // loud bound instead of an Int-overflowed allocation on an
    // extreme upsampling ratio; matches the fingerprint chunk cap's
    // order of magnitude (chunk upstream, don't resample monoliths)
    require(nOutL <= 100000000L,
      s"resampling $n samples $fromRate -> $toRate yields $nOutL " +
        "(cap 1e8) — chunk upstream first")
    val nOut = nOutL.toInt
    val out = new Array[Int](nOut)
    var i = 0
    while (i < nOut) {
      val p = i.toLong * fromRate
      val idx = (p / toRate).toInt
      val rem = p % toRate
      out(i) =
        if (rem == 0L || idx + 1 >= n) samples(idx)
        // widen BEFORE subtracting: the parameter type admits any Int,
        // and an Int difference of extreme neighbors would overflow
        // and interpolate garbage instead of failing or computing
        else samples(idx) + Math.floorDiv(
          (samples(idx + 1).toLong - samples(idx).toLong) * rem,
          toRate.toLong).toInt
      i += 1
    }
    out
  }

  /** Per-WINDOW spectral fingerprint sequence — the shift-robust
    * upgrade of [[spectralWhtHash64]] (whose fixed 16-frame grid a
    * trim or pad mis-aligns everywhere, the same weakness class the
    * gain fix closed for q390): the stream chops into consecutive
    * `windowSamples`-sample windows (remainder dropped) and each
    * window fingerprints INDEPENDENTLY, so dropping or inserting
    * whole windows leaves every other window's hash untouched — the
    * sequences then align by LCS exactly like video frame hashes
    * (q394's machinery, reused verbatim by [[audioShiftDedup]]).
    * Trim granularity equals the HOP: a trim of k·hopSamples samples
    * shifts the sequence by k tokens (windows at aligned phases are
    * sample-identical) and the alignment survives; a trim finer than
    * the hop re-phases every window. The default hop = windowSamples
    * (non-overlapping, cheapest); lowering the hop buys finer trim
    * robustness at proportionally more tokens — the standard
    * overlap/cost dial, spec-pinned both ways. Tokens render as
    * decimal strings (engine-portable join keys). */
  def audioSpectralSeq(samples: Array[Int], windowSamples: Int,
      hopSamples: Int = 0): Seq[String] =
    audioSpectralSeqLongs(samples, windowSamples, hopSamples)
      .map(java.lang.Long.toString)

  /** [[audioSpectralSeq]]'s raw-LONG sibling — the Hamming-tolerant
    * alignment path needs the 64-bit values themselves (popcount of
    * an xor has no decimal-string analog); the string variant above
    * renders these same longs for the engine-portable exact join. */
  def audioSpectralSeqLongs(samples: Array[Int], windowSamples: Int,
      hopSamples: Int = 0): Seq[Long] = {
    val hop = if (hopSamples == 0) windowSamples else hopSamples
    require(windowSamples >= 128 && windowSamples % 8 == 0,
      s"windowSamples ($windowSamples) must be >= 128 and a multiple " +
        "of 8 (the spectral fingerprint's own minimum and WHT width)")
    require(hop >= 1 && hop <= windowSamples,
      s"hopSamples ($hop) out of [1, windowSamples]")
    val nw =
      if (samples.length < windowSamples) 0
      else (samples.length - windowSamples) / hop + 1
    require(nw <= 4096,
      s"$nw windows exceed the LCS alignment bound (4096); use a " +
        "longer window/hop or chunk upstream")
    (0 until nw).map { w =>
      spectralWhtHash64(
        java.util.Arrays.copyOfRange(samples, w * hop,
          w * hop + windowSamples))
    }
  }

  /** Per-partition WAV decode → window-hash sequence (map-only; only
    * the token sequences shuffle). `canonicalRate` > 0 first
    * [[resampleLinear]]s every clip to that rate — without it, a
    * sample-rate-converted copy (44.1 → 16 kHz is the most common
    * real audio transform after trim/gain) shares NO window tokens
    * with its original, because every window holds different sample
    * values on a different time grid. 0 = off (clips already share
    * a rate). */
  def wavSpectralSeqTable(media: Dataset[WavRow],
      windowSamples: Int, hopSamples: Int = 0,
      canonicalRate: Int = 0): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, decoded) = decodeWavSamples(r.content)
      val samples =
        if (canonicalRate > 0 && rate != canonicalRate)
          resampleLinear(decoded, rate, canonicalRate)
        else decoded
      (r.doc_id, audioSpectralSeq(samples, windowSamples, hopSamples))
    }).toDF("doc_id", "seq")
  }

  /** SHIFT-robust audio near-dup: window-hash sequences aligned by
    * LCS — [[videoFrameHashDedup]] applied to audio windows, so a
    * copy with leading/trailing windows trimmed (or spliced) still
    * aligns where the fixed-grid [[spectralWhtHash64]] verdict would
    * flip every frame. Same scale shape: candidates share ≥ 1 exact
    * window hash (bounded buckets, skew cap), each pair pays one
    * codegen'd integer LCS on window-COUNT-sized arrays.
    * @return (id1, id2, n1, n2, lcs, sim) with sim >= minSim */
  def audioShiftDedup(media: Dataset[WavRow], minSim: Double,
      windowSamples: Int = 128, hopSamples: Int = 0,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      canonicalRate: Int = 0): DataFrame =
    videoFrameHashDedup(
      wavSpectralSeqTable(media, windowSamples, hopSamples,
        canonicalRate),
      "doc_id", "seq", minSim, maxBucketSize)

  /** Per-partition WAV decode → window-hash LONG sequence — the
    * [[wavSpectralSeqTable]] front-end for the Hamming-tolerant
    * alignment path (same map-only shape; only the 8·nw-byte hash
    * arrays shuffle). */
  def wavSpectralSeqLongTable(media: Dataset[WavRow],
      windowSamples: Int, hopSamples: Int = 0,
      canonicalRate: Int = 0): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (rate, decoded) = decodeWavSamples(r.content)
      val samples =
        if (canonicalRate > 0 && rate != canonicalRate)
          resampleLinear(decoded, rate, canonicalRate)
        else decoded
      (r.doc_id,
        audioSpectralSeqLongs(samples, windowSamples, hopSamples))
    }).toDF("doc_id", "seq")
  }

  /** HAMMING-TOLERANT audio near-dup — the lossy frontier the exact
    * window-token family honestly stops short of (r11 VERDICT #1):
    * [[audioShiftDedup]]'s candidates and LCS both require EXACT
    * 64-bit window-hash equality, so any VALUE-perturbing transform —
    * a non-integer resample (44.1 → 16 kHz, the single most common
    * real ratio, whose roundtrip through [[resampleLinear]] is NOT
    * the identity), an MP3-style lossy re-encode, light noise —
    * flips a few bits of most window hashes and the exact join is a
    * total miss, where the image path tolerates Hamming ≤ 6. Here
    * both layers relax together: candidates share a 16-bit BAND of
    * any window hash ([[bands64]] — the q389/IncrementalPerceptual
    * layout, pigeonhole-guaranteed for windows within Hamming ≤ 3,
    * probabilistic past it: a window whose flips touch all four
    * bands shares no band key, and the PAIR is recalled as long as
    * ANY of its windows keeps a band intact — AudioSeqSmoke measured
    * 2 misses in 9000 planted pairs at per-window distances of 5–8),
    * and alignment is
    * [[graft.expressions.EditDistanceUtil.hammingLcs]] — LCS whose
    * match predicate is popcount(xor) ≤ maxHamming instead of
    * equality.
    *
    * Scale: same two-stage shape as the exact path with a ×4 token
    * fan-out in the candidate join (4 bands per window instead of 1
    * raw token — priced in BENCH_NOTES) and the identical quadratic
    * LCS per surviving pair; 16-bit bands collide by birthday at
    * ~4·N²/2¹⁷ like the image family, so the same ~10M-hash shard
    * guidance applies. maxHamming trades recall for false alignment:
    * unrelated windows differ in ~32 bits (measured ≥ 23 on the gate
    * fixture), while the 441:160 roundtrip's interpolation error
    * flips ≤ 9 bits per window there — the gate pins BOTH sides at
    * maxHamming = 10 (every planted window within it, every
    * unrelated window far outside).
    * @return (id1, id2, n1, n2, lcs, sim) with sim >= minSim */
  def audioTolerantDedup(media: Dataset[WavRow], minSim: Double,
      windowSamples: Int = 128, hopSamples: Int = 0,
      maxHamming: Int = 6,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      canonicalRate: Int = 0): DataFrame =
    frameHashSeqTolerantDedup(
      wavSpectralSeqLongTable(media, windowSamples, hopSamples,
        canonicalRate),
      "doc_id", "seq", minSim, maxHamming, maxBucketSize)

  /** Hamming-tolerant near-dup over 64-bit frame/window-hash LONG
    * sequences — [[videoFrameHashDedup]] with both layers relaxed
    * (see [[audioTolerantDedup]]); generic over any fingerprint
    * sequence, so per-frame dHash video sequences get the same
    * lossy-transform robustness.
    * @param frames (idCol, seqCol array<long> of frame hashes) */
  def frameHashSeqTolerantDedup(frames: DataFrame, idCol: String,
      seqCol: String, minSim: Double, maxHamming: Int,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      maxFrames: Int = 4096): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim ($minSim) out of (0, 1]")
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming ($maxHamming) out of [0, 64]")
    require(maxFrames >= 1 && maxFrames <= 4096,
      s"maxFrames ($maxFrames) out of [1, 4096]")
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val v = frames
      .select(col(idCol),
        slice(col(seqCol), 1, maxFrames).cast("array<long>").as("__seq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate keys: every 16-bit band of every window hash, deduped
    // per clip — ONE shared banding definition (bands64) with the
    // whole perceptual family
    val banded = v.withColumn("__bands",
      array_distinct(flatten(transform(col("__seq"), h => bands64(h)))))
    val pairs = Dedup.candidatePairs(banded, idCol, "__bands",
      maxBucketSize)
    val lcs = C(graft.expressions.HammingLcsExpression(
      E(col("__s1")), E(col("__s2")), maxHamming)).cast("long")
    val result = pairs
      .join(v.withColumnRenamed(idCol, "id1")
        .withColumnRenamed("__seq", "__s1"), "id1")
      .join(v.withColumnRenamed(idCol, "id2")
        .withColumnRenamed("__seq", "__s2"), "id2")
      .select(col("id1"), col("id2"),
        size(col("__s1")).cast("long").as("n1"),
        size(col("__s2")).cast("long").as("n2"), lcs.as("lcs"))
      .withColumn("sim", (lit(2L) * col("lcs")).cast("double") /
        (col("n1") + col("n2")).cast("double"))
      .filter(col("sim") >= minSim)
      .localCheckpoint(true)
    v.unpersist()
    result
  }

  /** Video-style near-duplicate detection over FRAME-HASH SEQUENCES —
    * the fourth modality beside bytes ([[binaryNearDups]]), pixels
    * ([[dHash64]] + [[hammingNearDupPairs]]), and samples
    * ([[audioEnergyHash64]]): a video is an ordered array of
    * per-frame perceptual-hash tokens (e.g. [[dHash64]] per sampled
    * frame, rendered as strings); two videos are near-dups when their
    * hash sequences ALIGN — longest common subsequence over frame
    * hashes, so a copy with frames dropped, inserted, or re-sampled
    * still matches (the shot-level matching rule of video dedup;
    * Hamming on a single global hash can't survive frame
    * insertions).
    *
    * Scale: candidates share at least ONE exact frame hash
    * (Dedup.candidatePairs over the sequence itself — bounded
    * buckets, skew cap; a hash shared by everything is boilerplate
    * and capped away), then each candidate pair pays one exact
    * integer LCS (codegen'd TokenLcsExpression, O(n₁·n₂) on
    * frame-COUNT-sized arrays — tens, not pixels). sim = 2·LCS/(n₁+n₂)
    * is ONE division of exact integers. Raw frame hashes ARE the band
    * keys, so a ubiquitous frame (a solid-black intro card) makes one
    * giant bucket that `maxBucketSize` caps away — the cap trades
    * RECALL (pairs meeting only in the capped bucket go unreported),
    * never correctness; pre-filter boilerplate frames upstream if
    * that recall matters.
    * @param videos (idCol, seqCol array<string> of frame hashes)
    * @return (id1, id2, n1, n2, lcs, sim) with sim >= minSim */
  def videoFrameHashDedup(videos: DataFrame, idCol: String,
      seqCol: String, minSim: Double,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      maxFrames: Int = 4096): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim ($minSim) out of (0, 1]")
    // 4096² = 2²⁴ DP cells — TokenLcsExpression's hard bound. Longer
    // videos TRUNCATE to their first maxFrames hashes for BOTH the
    // counts and the alignment (the rougeL discipline: the metric is
    // quadratic per pair; sample frames sparser upstream instead of
    // raising this).
    require(maxFrames >= 1 && maxFrames <= 4096,
      s"maxFrames ($maxFrames) out of [1, 4096]")
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val v = videos
      .select(col(idCol), slice(col(seqCol), 1, maxFrames).as("__seq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = v.withColumn("__bands", col("__seq"))
    val pairs = Dedup.candidatePairs(banded, idCol, "__bands",
      maxBucketSize)
    val lcs = C(graft.expressions.TokenLcsExpression(
      E(col("__s1")), E(col("__s2")))).cast("long")
    val result = pairs
      .join(v.withColumnRenamed(idCol, "id1")
        .withColumnRenamed("__seq", "__s1"), "id1")
      .join(v.withColumnRenamed(idCol, "id2")
        .withColumnRenamed("__seq", "__s2"), "id2")
      .select(col("id1"), col("id2"),
        size(col("__s1")).cast("long").as("n1"),
        size(col("__s2")).cast("long").as("n2"), lcs.as("lcs"))
      .withColumn("sim", (lit(2L) * col("lcs")).cast("double") /
        (col("n1") + col("n2")).cast("double"))
      .filter(col("sim") >= minSim)
      .localCheckpoint(true)
    v.unpersist()
    result
  }

  /** Byte-level near-duplicate detection over binary media columns:
    * content bytes are reinterpreted losslessly as a Latin-1 string
    * (one char per byte) and fed through the SimHash near-dup pipeline
    * — byte-shingle SimHash is genuinely similarity-preserving over
    * raw byte streams, so blobs differing by small edits (metadata
    * patch, re-mux, truncated tail) land within `maxHamming` bits
    * while unrelated blobs do not. This is the modality-agnostic
    * half of media dedup (a REAL computation, not the stubbed codec
    * path): content-identical-modulo-container dups are caught without
    * decoding; perceptual (pixel-space) dedup additionally needs the
    * decoder to emit frame features, which then feed the same pipeline
    * or the embedding near-dup path. Same banded bucket-join scale
    * shape as text SimHash, but over BYTE shingles (binary has no
    * whitespace token structure — word tokenization would hash most
    * blobs to one giant token). Output: (id1, id2, hamming). */
  def binaryNearDups(media: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", maxHamming: Int = 6,
      shingleBytes: Int = 8): DataFrame =
    Dedup.simhashNearDupsFromTokens(
      media.withColumn("__bytes_as_text",
        decode(col(contentCol), "ISO-8859-1")),
      idCol,
      // RAW shingles: the text path's normalization (lower/trim/
      // whitespace-collapse) would alias byte values — 'A' vs 'a',
      // padding runs — into one sketch and report distinct blobs as
      // duplicates
      graft.functions.TextAnalysis.rawCharShingles(col("__bytes_as_text"),
        shingleBytes),
      maxHamming)
}
