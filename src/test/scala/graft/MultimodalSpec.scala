package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Multimodal plumbing: binary schema, per-partition decode batching,
  * deterministic fake features, resize/frame-sample stubs. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = asMediaTable(
    Seq((1L, "hello world"), (2L, ""), (3L, "third document"))
      .toDF("doc_id", "text"), "doc_id", "text", "image").as[MediaRow]

  test("binary media table schema") {
    val df = media.toDF()
    df.schema("content").dataType.typeName shouldBe "binary"
    df.schema("kind").dataType.typeName shouldBe "string"
  }

  test("feature extraction is deterministic and md5-consistent") {
    val feats = extractFeatures(media, () => new DeterministicFakeDecoder)
      .collect().sortBy(_.doc_id)
    feats.map(_.n_bytes).toSeq shouldBe Seq(11L, 0L, 14L)
    // digest matches JVM md5 of the utf-8 bytes
    feats(0).digest shouldBe Multimodal.DeterministicFakeDecoder
      .md5Hex("hello world".getBytes("UTF-8"))
    // dims in the fake decoder's declared ranges
    all(feats.map(_.width).toSeq) should (be >= 1 and be <= 1920)
    all(feats.map(_.height).toSeq) should (be >= 1 and be <= 1080)
    // deterministic across runs
    val again = extractFeatures(media, () => new DeterministicFakeDecoder)
      .collect().sortBy(_.doc_id)
    again.map(f => (f.digest, f.width, f.height)).toSeq shouldBe
      feats.map(f => (f.digest, f.width, f.height)).toSeq
  }

  test("decoder initialized per partition, not per row") {
    val counter = spark.sparkContext.longAccumulator("decoder_opens")
    val parts = media.repartition(2)
    extractFeatures(parts, () => new DeterministicFakeDecoder {
      override def open(): Unit = counter.add(1)
    }).collect()
    counter.value shouldBe 2 // one open() per partition
  }

  test("resize stub keeps aspect and bounds") {
    resizeDims(1920, 1080, 512) shouldBe ((512, 288))
    resizeDims(1080, 1920, 512) shouldBe ((288, 512))
    resizeDims(100, 50, 512) shouldBe ((100, 50))
  }

  test("frame sampling stub") {
    sampleFrameIndices(10, 3) shouldBe Seq(0, 3, 6, 9)
    sampleFrameIndices(0, 3) shouldBe Seq.empty
  }

  test("binaryNearDups pairs lightly-edited blobs, not unrelated ones") {
    // deterministic pseudo-random byte blobs (seeded LCG); blob 2 is
    // blob 1 with a one-byte "metadata patch" (the 2-band scheme
    // GUARANTEES candidate recall only at hamming <= 1 — a larger edit
    // can flip one bit in each 16-bit half and skip banding, which is
    // the documented simhash recall contract, not a bug), blob 3 is
    // unrelated
    var seed = 987654321L
    def nextByte(): Byte = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 40).toByte
    }
    val base = Array.fill(400)(nextByte())
    val edited = base.clone(); edited(0) = 'X'.toByte
    val unrelated = Array.fill(400)(nextByte())
    val media = Seq(
      (1L, base), (2L, edited), (3L, unrelated))
      .toDF("doc_id", "content")
    val pairs = Multimodal.binaryNearDups(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain ((1L, 2L))
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 3L
  }

  test("binaryNearDups is byte-exact: case-differing blobs do not alias") {
    // the text path normalizes (lowercase); the binary path must not —
    // 'A' vs 'a' bytes are different data, and blobs differing in EVERY
    // byte's case share no raw shingle
    val upper = Array.fill(300)('A'.toByte)
    val lower = Array.fill(300)('a'.toByte)
    val media = Seq((1L, upper), (2L, lower)).toDF("doc_id", "content")
    val paired = Multimodal.binaryNearDups(media, maxHamming = 0)
      .collect()
    paired shouldBe empty
  }

  test("WAV round trip: encode then decode recovers header fields and " +
      "exact sample moments") {
    val samples = Seq(0, 100, -32768, 32767, -5)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 8000)
    bytes.length shouldBe 44 + 10
    val f = Multimodal.decodeWavPcm16(bytes)
    f.sample_rate shouldBe 8000
    f.n_channels shouldBe 1
    f.bits_per_sample shouldBe 16
    f.n_samples shouldBe 5L
    f.duration_ms shouldBe 0L // 5 samples at 8 kHz
    f.peak shouldBe 32768
    f.sum_sq shouldBe (100L * 100 + 32768L * 32768 + 32767L * 32767 + 25L)
  }

  test("WAV decode walks unknown chunks (with RIFF odd-size padding) " +
      "to find fmt/data") {
    // hand-build: RIFF [LIST len=3 +pad] [fmt ] [data]
    val inner = Multimodal.encodeWavPcm16(Seq(7, -7), 44100)
    val fmtAndData = inner.drop(12) // the fmt + data chunks
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // 3 + pad
    val body = listChunk ++ fmtAndData
    val hdr = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WAVE".getBytes("US-ASCII")).array()
    val f = Multimodal.decodeWavPcm16(hdr ++ body)
    f.sample_rate shouldBe 44100
    f.n_samples shouldBe 2L
    f.sum_sq shouldBe 98L
  }

  test("WAV decode fails loudly on malformed input, never fabricates") {
    val good = Multimodal.encodeWavPcm16(Seq(1, 2, 3), 8000)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavPcm16(good.take(20)) // truncated
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavPcm16(badMagic)
    // format code 2 (ADPCM) in the fmt chunk -> not PCM
    val nonPcm = good.clone(); nonPcm(20) = 2
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavPcm16(nonPcm)
    // stereo must fail loudly, not halve the duration silently
    val stereo = good.clone(); stereo(22) = 2
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavPcm16(stereo)
    // a chunk length near Int.MaxValue must fail the bound require,
    // not wrap the offset arithmetic past it
    val hugeLen = good.clone()
    java.nio.ByteBuffer.wrap(hugeLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 4)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavPcm16(hugeLen)
    // odd data-chunk length must fail, not silently drop the last byte
    // (r7 ADVICE): shrink the 6-byte data chunk to 5 declared bytes
    val oddLen = good.clone()
    java.nio.ByteBuffer.wrap(oddLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 5)
    val eo = the[IllegalArgumentException] thrownBy
      Multimodal.decodeWavPcm16(oddLen)
    eo.getMessage should include("odd")
  }

  test("encode clamps out-of-range samples to int16") {
    val bytes = Multimodal.encodeWavPcm16(Seq(40000, -40000), 8000)
    val f = Multimodal.decodeWavPcm16(bytes)
    f.peak shouldBe 32768
    f.sum_sq shouldBe (32767L * 32767 + 32768L * 32768)
  }

  test("BMP round trip: multi-row bottom-up storage, padding, and " +
      "logical first/last order") {
    // 3x2 image (rowBytes 9 -> 3 pad bytes/row): logical top row
    // (10,20,30), bottom row (40,50,60)
    val lumas = Seq(10, 20, 30, 40, 50, 60)
    val bytes = Multimodal.encodeBmpGray24(lumas, width = 3)
    bytes.length shouldBe 54 + 2 * 12
    val f = Multimodal.decodeBmpGray24(bytes)
    (f.width, f.height, f.n_pixels) shouldBe (3, 2, 6L)
    f.sum_gray shouldBe 210L
    f.max_gray shouldBe 60
    f.first_gray shouldBe 10 // top-left, NOT the bottom-up first byte
    f.last_gray shouldBe 60
    // top-down variant (negative height) decodes to the same logical
    // image: flip the height sign and the row order by hand
    val td = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(td)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val rows = td.slice(54, 54 + 24)
    System.arraycopy(rows, 12, td, 54, 12)
    System.arraycopy(rows, 0, td, 66, 12)
    Multimodal.decodeBmpGray24(td) shouldBe f
  }

  test("BMP decode fails loudly on malformed input") {
    val good = Multimodal.encodeBmpGray24(Seq(1, 2, 3), 3)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeBmpGray24(good.take(40)) // truncated
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeBmpGray24(badMagic)
    val bad32 = good.clone(); bad32(28) = 32 // 32 bpp unsupported
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeBmpGray24(bad32)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.encodeBmpGray24(Seq(1, 2, 3), 2) // partial row
    // a crafted huge width must fail the bound require, not wrap
    // width*3 negative and dodge the overrun check
    val hugeW = good.clone()
    java.nio.ByteBuffer.wrap(hugeW)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 0x40000000)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeBmpGray24(hugeW)
    // rawHeight = Int.MinValue is its own abs(): must throw, never
    // skip the pixel loop and fabricate features (r7 ADVICE)
    val minH = good.clone()
    java.nio.ByteBuffer.wrap(minH)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    val eh = the[IllegalArgumentException] thrownBy
      Multimodal.decodeBmpGray24(minH)
    eh.getMessage should include("height")
  }

  test("RealCodecDecoder dispatches on magic: real BMP/WAV/PNG parse, " +
      "loud unsupported elsewhere") {
    val dec = new Multimodal.RealCodecDecoder
    val bmp = dec.decode(Multimodal.encodeBmpGray24(Seq(5, 6), 2))
    (bmp.width, bmp.height, bmp.nFrames) shouldBe (2, 1, 1)
    val wav = dec.decode(Multimodal.encodeWavPcm16(Seq(1, 2, 3), 8000))
    wav.nFrames shouldBe 3
    // PNG is a REAL decode now (r8) — no longer the unsupported branch
    val png = dec.decode(Multimodal.encodePngGray8(Seq(5, 6, 7, 8), 2))
    (png.width, png.height, png.nFrames) shouldBe (2, 2, 1)
    // JPEG is a REAL decode now (r9): FFD8 routes to the strict T.81
    // parser, so a truncated JPEG fails as a PARSE error, not as an
    // unsupported format
    val jpg = dec.decode(graft.operators.Jpeg.encodeJpegGray(
      Seq(5, 6, 7, 8), 2))
    (jpg.width, jpg.height, jpg.nFrames) shouldBe (2, 2, 1)
    an[IllegalArgumentException] should be thrownBy
      dec.decode(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte))
    // genuinely library-bound formats (MP3's ID3 container here) stay
    // the loud unsupported branch, magic named
    val mp3 = Array(0x49, 0x44, 0x33, 0x04).map(_.toByte) // "ID3"
    val e = the[UnsupportedOperationException] thrownBy dec.decode(mp3)
    e.getMessage should include("49443304")
  }

  // ------------------------------------------------------------- PNG

  test("PNG round trip: all five filter types reconstruct exactly " +
      "(gradient image makes each filter's delta distinct)") {
    // 6 rows of 4 so the rotating encoder uses filters 0,1,2,3,4,0;
    // values chosen so Sub/Up/Average/Paeth deltas all differ
    val lumas = Seq(
      10, 20, 30, 40,
      15, 25, 35, 45,
      100, 90, 80, 70,
      0, 255, 0, 255,
      7, 7, 7, 7,
      1, 2, 4, 8)
    val bytes = Multimodal.encodePngGray8(lumas, width = 4)
    // container sanity: signature + IHDR/IDAT/IEND present
    (bytes(0) & 0xff) shouldBe 0x89
    new String(bytes.slice(12, 16), "US-ASCII") shouldBe "IHDR"
    val f = Multimodal.decodePngGray8(bytes)
    (f.width, f.height, f.color_type) shouldBe (4, 6, 0)
    f.n_pixels shouldBe 24L
    f.sum_gray shouldBe lumas.map(_.toLong).sum
    f.max_gray shouldBe 255
    f.first_gray shouldBe 10
    f.last_gray shouldBe 8
  }

  test("PNG round trip survives pseudo-random content at odd " +
      "geometries (1-wide, 1-tall, prime width)") {
    def lcg(seed: Long, n: Int): Seq[Int] = {
      var s = seed
      Seq.fill(n) { s = (s * 6364136223846793005L + 1442695040888963407L); ((s >>> 33) % 256).toInt }
    }
    for ((w, h) <- Seq((1, 17), (17, 1), (7, 13))) {
      val lumas = lcg(w * 1000L + h, w * h)
      val f = Multimodal.decodePngGray8(
        Multimodal.encodePngGray8(lumas, w))
      (f.width, f.height) shouldBe (w, h)
      f.sum_gray shouldBe lumas.map(_.toLong).sum
      f.first_gray shouldBe lumas.head
      f.last_gray shouldBe lumas.last
    }
  }

  test("PNG decode fails loudly on malformed input, never fabricates") {
    val good = Multimodal.encodePngGray8(Seq(1, 2, 3, 4, 5, 6), 3)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodePngGray8(badMagic)
    // truncated blob (cut inside IDAT)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodePngGray8(good.take(good.length - 15))
    // corrupt IDAT byte: CRC must catch it (strict parsers verify)
    val idatOff = {
      var o = 8
      while (new String(good, o + 4, 4, "US-ASCII") != "IDAT")
        o += 12 + java.nio.ByteBuffer.wrap(good).getInt(o)
      o
    }
    val corrupt = good.clone()
    corrupt(idatOff + 8) = (corrupt(idatOff + 8) ^ 0x55).toByte
    val e = the[IllegalArgumentException] thrownBy
      Multimodal.decodePngGray8(corrupt)
    e.getMessage should include("CRC")
    // crafted chunk length near Int.MaxValue: bound check in Long,
    // no offset wrap (the WAV-walker rule)
    val hugeLen = good.clone()
    java.nio.ByteBuffer.wrap(hugeLen).putInt(8, Int.MaxValue - 4)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodePngGray8(hugeLen)
    // interlaced flag rejected (Adam7 would need a different walker)
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR data byte 12 = interlace method
    // fix the IHDR CRC so the interlace require (not CRC) fires
    val ihdrCrc = {
      val c = new java.util.zip.CRC32()
      c.update(interlaced, 12, 4 + 13)
      c.getValue.toInt
    }
    java.nio.ByteBuffer.wrap(interlaced).putInt(8 + 4 + 4 + 13, ihdrCrc)
    val ei = the[IllegalArgumentException] thrownBy
      Multimodal.decodePngGray8(interlaced)
    ei.getMessage should include("interlace")
    // IDAT stream shorter than the scanline geometry: reject
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodePngGray8(
        // claim 100 rows in IHDR of a 2-row image (CRC refreshed)
        {
          val tall = good.clone()
          java.nio.ByteBuffer.wrap(tall).putInt(8 + 8 + 4, 100)
          val c = new java.util.zip.CRC32()
          c.update(tall, 12, 4 + 13)
          java.nio.ByteBuffer.wrap(tall).putInt(8 + 4 + 4 + 13,
            c.getValue.toInt)
          tall
        })
    an[IllegalArgumentException] should be thrownBy
      Multimodal.encodePngGray8(Seq(1, 2, 3), 2) // partial row
  }

  test("PNG decode handles 8-bit RGB (color type 2) taking the green " +
      "channel as luma, and skips CRC-valid ancillary chunks") {
    // hand-build a 2x2 RGB PNG: pixels (R,G,B) with distinct greens
    val px = Seq( // row-major: (r, g, b)
      (1, 10, 2), (3, 20, 4),
      (5, 30, 6), (7, 255, 8))
    val stride = 1 + 2 * 3
    val raw = new Array[Byte](stride * 2)
    for (y <- 0 until 2) {
      raw(y * stride) = 0 // filter None
      for (x <- 0 until 2) {
        val (r, g, b) = px(y * 2 + x)
        raw(y * stride + 1 + x * 3) = r.toByte
        raw(y * stride + 2 + x * 3) = g.toByte
        raw(y * stride + 3 + x * 3) = b.toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val zBuf = new Array[Byte](256)
    while (!defl.finished()) zOut.write(zBuf, 0, defl.deflate(zBuf))
    defl.end()
    val idat = zOut.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tagged = typ.getBytes("US-ASCII") ++ data
      val c = new java.util.zip.CRC32(); c.update(tagged)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tagged).putInt(c.getValue.toInt)
        .array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(2.toByte) // RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr) ++
      chunk("tEXt", "Comment graft".getBytes("ISO-8859-1")) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
    val f = Multimodal.decodePngGray8(png)
    (f.width, f.height, f.color_type) shouldBe (2, 2, 2)
    f.sum_gray shouldBe (10L + 20 + 30 + 255)
    f.max_gray shouldBe 255
    f.first_gray shouldBe 10
    f.last_gray shouldBe 255
  }

  test("decodePngLumas round-trips the exact pixel plane through " +
      "real compression") {
    val lumas = (0 until 9 * 11).map(i => (i * 37 + 11) % 256)
    val png = Multimodal.encodePngGray8(lumas, width = 9)
    val (w, h, got) = Multimodal.decodePngLumas(png)
    (w, h) shouldBe (9, 11)
    got.toSeq shouldBe lumas
  }

  test("dHash64: hand-computed 9x8 bits, one-pixel edit flips at most " +
      "one bit, pooled cells use exact cross-multiplied means") {
    // 9x8, one pixel per cell: alternating 10/0 columns -> bit set
    // exactly where col j's pixel (10) > col j+1's (0): even j
    val alt = Array.tabulate(8 * 9)(k => if (k % 9 % 2 == 0) 10 else 0)
    Multimodal.dHash64(alt, 9, 8) shouldBe 0x5555555555555555L
    // one-pixel edit perturbs only cell (0,0) -> Hamming <= 1
    val base = Array.tabulate(9 * 16)(k => (k * 53 + 7) % 256)
    val h0 = Multimodal.dHash64(base, 9, 16)
    val nudged = base.clone(); nudged(0) = (nudged(0) + 1) % 256
    java.lang.Long.bitCount(
      h0 ^ Multimodal.dHash64(nudged, 9, 16)) should be <= 1
    // 18x16: every cell is a 2x2 block; means compare exactly.
    // col-cell j covers cols {2j, 2j+1}; make block means rise with j
    // except a tie between j=3 and j=4 -> strict > leaves bit 3 unset
    val grid = Array.tabulate(16 * 18) { k =>
      val c = k % 18
      val j = c * 9 / 18
      if (j == 4) 3 * 10 else j * 10 // j=3 mean 30 == j=4 mean 30
    }
    val hg = Multimodal.dHash64(grid, 18, 16)
    hg shouldBe 0L // means never strictly exceed the right neighbor
    // strictly falling means -> every one of the 64 bits set
    val fall = Array.tabulate(16 * 18)(k => (8 - (k % 18) * 9 / 18) * 10)
    Multimodal.dHash64(fall, 18, 16) shouldBe -1L
    an[IllegalArgumentException] should be thrownBy
      Multimodal.dHash64(alt, 8, 9) // width 8 < 9
    an[IllegalArgumentException] should be thrownBy
      Multimodal.dHash64(alt.take(10), 9, 8) // length mismatch
  }

  test("hammingNearDupPairs: 1-bit pairs collide via band pigeonhole, " +
      "unrelated hashes do not pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val h = 0x123456789abcdef0L
    val df = Seq(
      (1L, h), (2L, h ^ 1L), // Hamming 1
      (3L, 0x0f0f0f0f0f0f0f0fL), // far from everything
      (4L, h ^ 0x8000000000000000L)) // Hamming 1 via the sign bit
      .toDF("doc_id", "dhash")
    val got = Multimodal.hammingNearDupPairs(df, "doc_id", "dhash",
        maxHamming = 2)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.toSeq shouldBe Seq((1L, 2L, 1), (1L, 4L, 1), (2L, 4L, 2))
  }

  test("GIF round trip: real LZW through growing code widths and a " +
      "dictionary reset, multi-row geometry, exact features") {
    // small image
    val lumas = Seq(10, 20, 30, 40, 50, 60)
    val bytes = Multimodal.encodeGifGray8(lumas, width = 3)
    new String(bytes.take(6), "US-ASCII") shouldBe "GIF89a"
    val f = Multimodal.decodeGifGray8(bytes)
    (f.width, f.height, f.n_pixels) shouldBe (3, 2, 6L)
    f.sum_gray shouldBe 210L
    (f.first_gray, f.last_gray, f.max_gray) shouldBe (10, 60, 60)
    // pseudo-random 12000-px image: the LZW dictionary passes every
    // code width 9..12 AND the 4096 reset; geometry stays exact
    var seed = 0x5eed5eedL
    val big = Seq.fill(12000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toInt
    }
    val fb = Multimodal.decodeGifGray8(
      Multimodal.encodeGifGray8(big, width = 100))
    (fb.width, fb.height, fb.n_pixels) shouldBe (100, 120, 12000L)
    fb.sum_gray shouldBe big.map(_.toLong).sum
    fb.first_gray shouldBe big.head
    fb.last_gray shouldBe big.last
    // highly repetitive content (LZW's best case) also round-trips
    val rep = (0 until 3000).map(i => (i / 100) % 7 * 30)
    val fr = Multimodal.decodeGifGray8(
      Multimodal.encodeGifGray8(rep, width = 50))
    fr.sum_gray shouldBe rep.map(_.toLong).sum
  }

  test("resizePixels: exact nearest-neighbor selection, down- and " +
      "up-sampling, identity at equal dims") {
    // 4x2 source, halve to 2x1: picks (0,0) and (0,2)
    val src = Array(1, 2, 3, 4, 5, 6, 7, 8)
    Multimodal.resizePixels(src, 4, 2, tw = 2, th = 1).toSeq shouldBe
      Seq(1, 3)
    // upsample 2x1 -> 4x2: each source pixel replicated 2x2
    Multimodal.resizePixels(Array(9, 7), 2, 1, 4, 2).toSeq shouldBe
      Seq(9, 9, 7, 7, 9, 9, 7, 7)
    // identity
    Multimodal.resizePixels(src, 4, 2, 4, 2).toSeq shouldBe src.toSeq
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resizePixels(src, 4, 2, 0, 1)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resizePixels(src, 3, 2, 2, 2) // length mismatch
  }

  test("decodeGifLumas round-trips exact pixels; dHash is identical " +
      "through the PNG and GIF codecs (codec invariance)") {
    var seed = 0xfeedL
    val lumas = Seq.fill(9 * 12) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toInt
    }
    val (gw, gh, gifPx) = Multimodal.decodeGifLumas(
      Multimodal.encodeGifGray8(lumas, width = 9))
    (gw, gh) shouldBe (9, 12)
    gifPx.toSeq shouldBe lumas
    val (_, _, pngPx) = Multimodal.decodePngLumas(
      Multimodal.encodePngGray8(lumas, width = 9))
    Multimodal.dHash64(gifPx, 9, 12) shouldBe
      Multimodal.dHash64(pngPx, 9, 12)
  }

  test("GIF decode fails loudly on malformed input, never fabricates") {
    val good = Multimodal.encodeGifGray8(Seq(1, 2, 3, 4), width = 2)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGifGray8(good.take(10)) // truncated header
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGifGray8(badMagic)
    // a COLOR palette entry must fail loudly, not silently average
    val colored = good.clone()
    colored(13) = 99.toByte // red of palette entry 0 != green/blue
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGifGray8(colored)
    // truncated image data
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGifGray8(good.dropRight(3))
    // trailing garbage after the trailer
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGifGray8(good ++ Array[Byte](1, 2))
    // geometry lying about the pixel count: patch height 2 -> 3
    val lied = good.clone()
    val idOff = 13 + 768 // image descriptor
    lied(idOff + 7) = 3.toByte
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGifGray8(lied)
    // RealCodecDecoder dispatches GIF on magic
    new Multimodal.RealCodecDecoder().decode(good) shouldBe
      Multimodal.Decoded(2, 2, 1)
  }

  test("videoFrameHashDedup: frame-drop copies align via LCS, shared-" +
      "hash candidates gate the join, low-overlap pairs filtered") {
    import org.apache.spark.sql.functions.col
    val vids = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "c", "d")), // frame 'b' dropped: LCS 3, sim 6/7
      (3L, Seq("x", "y", "z", "w")), // no shared hash with anyone
      (4L, Seq("a", "p", "q", "r"))) // shares 'a' only: sim 2/8
      .toDF("vid", "seq")
    val got = Multimodal.videoFrameHashDedup(vids, "vid", "seq",
        minSim = 0.75)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    got.toSeq shouldBe Seq((1L, 2L, 4L, 3L, 3L))
    // a REORDERED copy is NOT a near-dup: LCS is order-sensitive
    val shuffled = Seq(
      (1L, Seq("a", "b", "c", "d")), (2L, Seq("d", "c", "b", "a")))
      .toDF("vid", "seq")
    Multimodal.videoFrameHashDedup(shuffled, "vid", "seq",
      minSim = 0.5).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Multimodal.videoFrameHashDedup(vids, "vid", "seq", minSim = 0.0)
  }

  test("IncrementalPerceptualDedup: flag-iff-any-earlier-batch, " +
      "within-batch pairs don't flag, retries are idempotent") {
    import org.apache.spark.sql.functions.col
    import graft.operators.IncrementalPerceptualDedup
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ipd_spec").toString
    val h = 0x0123456789abcdefL
    def accept(tag: String, rows: (Long, Long)*) =
      IncrementalPerceptualDedup.acceptBatch(
        rows.toSeq.toDF("id", "hash"), "id", "hash", idx, tag,
        maxHamming = 6)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3)))
    // batch 0: empty index -> nothing flags
    accept("b0", (1L, h), (2L, h ^ 0x0f0f0f0f0f0f0f0fL)).toSeq shouldBe
      Seq.empty
    // batch 1: 3 and 4 are near-dups of 1 AND of each other — only
    // the earlier-batch hit flags, once each
    accept("b1", (3L, h ^ 1L), (4L, h ^ 2L)).toSeq shouldBe
      Seq((3L, 1L, 1, 1L), (4L, 1L, 1, 1L))
    // batch 2: 5 sees 1 (d 0), 3 (d 1), 4 (d 1) — all earlier now
    accept("b2", (5L, h)).toSeq shouldBe Seq((5L, 3L, 0, 1L))
    // retry of batch 2 under the SAME tag: identical verdicts (the
    // index excludes the tag's own files while probing)
    accept("b2", (5L, h)).toSeq shouldBe Seq((5L, 3L, 0, 1L))
  }

  test("compactIndex is tag-preserving: flag sets and retry " +
      "idempotence survive compaction, file count drops") {
    import graft.operators.IncrementalPerceptualDedup
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ipd_compact").toString
    val h = 0x0123456789abcdefL
    def accept(tag: String, rows: (Long, Long)*) =
      IncrementalPerceptualDedup.acceptBatch(
        rows.toSeq.toDF("id", "hash"), "id", "hash", idx, tag,
        maxHamming = 6)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3)))
    accept("b0", (1L, h)).toSeq shouldBe Seq.empty
    accept("b1", (2L, h ^ 1L)).toSeq shouldBe Seq((2L, 1L, 1, 1L))
    // 3 sees 1 (Hamming 2) and 2 (Hamming 1)
    accept("b2", (3L, h ^ 3L)).toSeq shouldBe Seq((3L, 2L, 1, 1L))
    // 4 sees 1 (0), 2 (1), 3 (2)
    val probeFlags = accept("b3", (4L, h)).toSeq
    probeFlags shouldBe Seq((4L, 3L, 0, 1L))
    val (before, after) = IncrementalPerceptualDedup
      .compactIndex(spark, idx)
    before should be > after
    after should be >= 1
    // retry of b3 AFTER compaction: its rows now live in files
    // without the tag prefix, so idempotence rests on the tag COLUMN
    accept("b3", (4L, h)).toSeq shouldBe probeFlags
    // a new batch still sees every compacted earlier item:
    // 5 sees 1 (1), 2 (0), 3 (2), 4 (1)
    accept("b4", (5L, h ^ 1L)).toSeq shouldBe Seq((5L, 4L, 0, 1L))
    // compacting again (now with the retry's double-stored b3 bands
    // present) dedups storage and changes no verdict:
    // 6 sees 1 (0), 2 (1), 3 (2), 4 (0), 5 (1)
    IncrementalPerceptualDedup.compactIndex(spark, idx)
    accept("b5", (6L, h)).toSeq shouldBe Seq((6L, 5L, 0, 1L))
    // a directory that exists but holds no data files compacts as a
    // no-op (0, 0), not an AnalysisException from schema inference
    val bare = java.nio.file.Files
      .createTempDirectory("graft_ipd_bare").toString
    IncrementalPerceptualDedup.compactIndex(spark, bare) shouldBe ((0, 0))
    // and an empty-batch accept (which may leave a zero-row part
    // file) followed by compaction must not crash either
    val empty = java.nio.file.Files
      .createTempDirectory("graft_ipd_empty").toString
    IncrementalPerceptualDedup.acceptBatch(
      Seq.empty[(Long, Long)].toDF("id", "hash"), "id", "hash",
      empty, "e0", maxHamming = 6).count() shouldBe 0L
    noException should be thrownBy
      IncrementalPerceptualDedup.compactIndex(spark, empty)
  }

  test("decodeWavSamples round-trips exact samples (with clamping) " +
      "through the strict parser") {
    val samples = Seq(0, 100, -32768, 32767, -5, 40000)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 8000)
    val (rate, got) = Multimodal.decodeWavSamples(bytes)
    rate shouldBe 8000
    got.toSeq shouldBe Seq(0, 100, -32768, 32767, -5, 32767) // clamped
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavSamples(bytes.take(20))
  }

  test("audioEnergyHash64: hand-computed frame bits, one-sample edit " +
      "flips at most two bits, bounds enforced") {
    // 65 samples, one per frame: energies alternate 100, 0 -> bit i
    // set exactly where frame i's energy (100) > frame i+1's (0):
    // even i
    val alt = Array.tabulate(65)(i => if (i % 2 == 0) 10 else 0)
    Multimodal.audioEnergyHash64(alt) shouldBe 0x5555555555555555L
    // strictly falling energies -> all 64 bits
    val fall = Array.tabulate(65)(i => 65 - i)
    Multimodal.audioEnergyHash64(fall) shouldBe -1L
    // a one-sample edit perturbs one frame -> at most 2 bits (the
    // frame's comparisons with both neighbors)
    val base = Array.tabulate(130)(k => ((k * 97 + 13) % 65536) - 32768)
    val h0 = Multimodal.audioEnergyHash64(base)
    val nudged = base.clone(); nudged(70) += 1
    java.lang.Long.bitCount(
      h0 ^ Multimodal.audioEnergyHash64(nudged)) should be <= 2
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioEnergyHash64(Array.fill(64)(1)) // < 65 samples
  }

  test("spectralWhtHash64: hand-computed band bits, exact gain " +
      "invariance, one-window locality, bounds") {
    // constant samples: every 8-point WHT has only the k=0 (DC)
    // coefficient, so e(f,0) > e(f,4) = 0 sets exactly bit f*4 per
    // frame -> 0x1111111111111111
    val const = Array.fill(128)(100)
    Multimodal.spectralWhtHash64(const) shouldBe 0x1111111111111111L
    Multimodal.spectralWhtHash64(Array.fill(128)(0)) shouldBe 0L
    // alternating +c/-c matches WHT basis k=1 exactly: only e(f,1)
    // is nonzero -> bit f*4+1 per frame -> 0x2222222222222222
    val alt = Array.tabulate(128)(t => if (t % 2 == 0) 60 else -60)
    Multimodal.spectralWhtHash64(alt) shouldBe 0x2222222222222222L
    // EXACT gain invariance: x2 always, /2 on even samples
    val base = Array.tabulate(512) { k =>
      val m = k * 2654435761L + 1013904223L
      2 * ((((m ^ (m >>> 17)) & 0x3fffL) - 8192L).toInt)
    }
    val h0 = Multimodal.spectralWhtHash64(base)
    Multimodal.spectralWhtHash64(base.map(_ * 2)) shouldBe h0
    Multimodal.spectralWhtHash64(base.map(_ / 2)) shouldBe h0
    // a one-window edit perturbs one frame -> at most 4 bits
    val nudged = base.clone(); nudged(200) += 2
    java.lang.Long.bitCount(
      h0 ^ Multimodal.spectralWhtHash64(nudged)) should be <= 4
    // pin the DIFFERENCE the spectral hash adds over the amplitude
    // hash: sensitivity to within-frame reordering that preserves the
    // energy envelope. Swapping two samples inside one window changes
    // no frame energy sum, so audioEnergyHash64 is blind to it, but
    // it changes the window's WHT decomposition. The swap below turns
    // window 0 of the k=1-basis signal into a different band mix.
    val alt2 = alt.clone()
    val tmp = alt2(0); alt2(0) = alt2(1); alt2(1) = tmp
    Multimodal.audioEnergyHash64(alt2) shouldBe
      Multimodal.audioEnergyHash64(alt) // envelope-blind
    Multimodal.spectralWhtHash64(alt2) should not be
      Multimodal.spectralWhtHash64(alt) // spectrum-aware
    an[IllegalArgumentException] should be thrownBy
      Multimodal.spectralWhtHash64(Array.fill(127)(1))
  }

  test("gate-fixture band buckets stay far below the candidate cap") {
    // hammingNearDupPairs' maxBucketSize silently trades recall above
    // the cap while the DuckDB oracles are UNCAPPED — gate parity
    // therefore rests on fixture buckets staying small. Pin that
    // assumption as a failing test instead of a hope: the hottest
    // band bucket of the q389/q397 dHash fixture must sit at least
    // an order of magnitude under the cap (bucket sizes scale ~10×
    // from this sf0.001 check to the driver's sf0.01 gate).
    import org.apache.spark.sql.functions.{col, count, explode, lit, max}
    val fixture = QueriesMultimodal.dhashFixture(spark,
      "/root/testdata/sf0.001")
    val hottest = fixture
      .select(explode(Multimodal.bands64(col("dhash"))).as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    hottest should be <= (graft.operators.Dedup.DefaultMaxBucketSize / 100L)
  }

  test("audioShiftDedup aligns window-trimmed copies that the fixed " +
      "16-frame grid loses, and ignores unrelated clips") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def clip(): Array[Int] =
      Array.fill(6 * 128)(rnd.nextInt(65536) - 32768)
    val a = clip()
    val trimmed = java.util.Arrays.copyOfRange(a, 256, a.length)
    val other = clip()
    // the sequence view: dropping two whole windows shifts tokens,
    // leaving the remaining window hashes untouched
    val seqA = Multimodal.audioSpectralSeq(a, 128)
    val seqT = Multimodal.audioSpectralSeq(trimmed, 128)
    seqA.length shouldBe 6
    seqT shouldBe seqA.drop(2)
    // the fixed-grid hash meanwhile flips many bits on the same trim
    java.lang.Long.bitCount(Multimodal.spectralWhtHash64(a) ^
      Multimodal.spectralWhtHash64(trimmed)) should be > 6
    // end to end through real WAV encode/decode + LCS alignment
    val pcm = Seq(Multimodal.PcmRow(1L, a.toSeq),
      Multimodal.PcmRow(2L, trimmed.toSeq),
      Multimodal.PcmRow(3L, other.toSeq)).toDS()
    val got = Multimodal.audioShiftDedup(
        Multimodal.encodeWavTable(pcm, 8000), minSim = 0.5,
        windowSamples = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe Seq((1L, 2L, 6L, 4L, 4L)) // lcs = the 4 shared windows
    // window constraints are enforced loudly
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioSpectralSeq(a, 64)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioSpectralSeq(a, 130)
    // hop overlap is the trim-granularity dial: a 32-sample trim
    // (finer than the window) re-phases every non-overlapping window,
    // but with hop = 32 the trimmed sequence is exactly the original
    // minus its first token — priced both ways
    val subTrim = java.util.Arrays.copyOfRange(a, 32, a.length)
    Multimodal.audioSpectralSeq(subTrim, 128)
      .intersect(Multimodal.audioSpectralSeq(a, 128)) shouldBe empty
    val hopA = Multimodal.audioSpectralSeq(a, 128, hopSamples = 32)
    val hopT = Multimodal.audioSpectralSeq(subTrim, 128, hopSamples = 32)
    hopT shouldBe hopA.drop(1)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.audioSpectralSeq(a, 128, hopSamples = 129)
  }

  test("resampleLinear: exact rational positions — 2x up/down is the " +
      "identity, non-integer ratios interpolate with floor semantics") {
    // identity roundtrip at 2x, negatives and range extremes included
    val a = Array(0, -3, 7, 32767, -32768, 100, 5, -5)
    val up = Multimodal.resampleLinear(a, 8000, 16000)
    up.length shouldBe 16
    up(0) shouldBe 0
    up(1) shouldBe Math.floorDiv(-3 - 0, 2) // floored midpoint
    Multimodal.resampleLinear(up, 16000, 8000).toSeq shouldBe a.toSeq
    // same rate: untouched
    Multimodal.resampleLinear(a, 8000, 8000).toSeq shouldBe a.toSeq
    // 3 -> 2 (non-integer per-sample phase): hand-computed — exact
    // hits at even output positions, floored interpolation between
    Multimodal.resampleLinear(
      Array(0, 300, -300, 900, 60, -60), 3, 2).toSeq shouldBe
      Seq(0, 0, 900, 0)
    // floor, NOT truncation, on negative interpolants
    Multimodal.resampleLinear(Array(0, -3), 1, 2).toSeq shouldBe
      Seq(0, -2, -3, -3)
    // interpolated values stay inside the endpoints' range, so the
    // spectralWhtHash64 16-bit contract survives resampling
    val r = Multimodal.resampleLinear(Array(-32768, 32767), 16000, 44100)
    all(r.toSeq) should (be >= -32768 and be <= 32767)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resampleLinear(Array.empty[Int], 8000, 16000)
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resampleLinear(a, 0, 8000)
    // a downsample that leaves no samples fails loudly
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resampleLinear(Array(1, 2), 44100, 16000)
    // ADVICE r11: the neighbor DIFFERENCE widens to Long BEFORE
    // subtracting — full-Int-range neighbors (outside the documented
    // 16-bit PCM envelope but admitted by the parameter type) must
    // interpolate on the true line, not an Int-overflowed one
    Multimodal.resampleLinear(
      Array(Int.MinValue, Int.MaxValue), 1, 2).toSeq shouldBe
      Seq(Int.MinValue, -1, Int.MaxValue, Int.MaxValue)
  }

  test("canonicalRate: a 2x-rate copy shares EVERY window token after " +
      "normalization and NONE without it (the q416 contract)") {
    val samples = Array.tabulate(512)(i =>
      ((i * 2654435761L) % 4096).toInt - 2048)
    val up = Multimodal.resampleLinear(samples, 8000, 16000)
    val media = Seq(
      Multimodal.WavRow(1L, Multimodal.encodeWavPcm16(samples.toSeq, 8000)),
      Multimodal.WavRow(2L, Multimodal.encodeWavPcm16(up.toSeq, 16000)))
      .toDS()
    val withNorm = Multimodal.audioShiftDedup(media, minSim = 0.9,
      windowSamples = 128, canonicalRate = 8000).collect()
    withNorm.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 2L))
    withNorm.head.getAs[Double]("sim") shouldBe 1.0
    // without normalization the copy's windows live on a different
    // time grid with different values: zero shared tokens, no pair —
    // the documented miss the canonical rate exists to close
    Multimodal.audioShiftDedup(media, minSim = 0.1,
      windowSamples = 128).collect() shouldBe empty
  }

  test("audioTolerantDedup: a 441:160 (44.1 kHz) roundtrip copy — " +
      "value-perturbed in every sample, NOT the identity — is found " +
      "by the Hamming-tolerant arm, missed by the exact arm, and " +
      "unrelated clips never collide (the q420 contract)") {
    val rnd = new java.util.Random(7)
    val a = Array.tabulate(640)(_ => (rnd.nextInt(32768) - 16384) * 2)
    val b = Array.tabulate(640)(_ => (rnd.nextInt(32768) - 16384) * 2)
    // the real-web chain: studio upsample to 44.1 kHz, stored there;
    // the pipeline canonicalizes back to 16 kHz — interpolation
    // composed with interpolation perturbs every sample
    val aCopy = Multimodal.resampleLinear(a, 16000, 44100)
    val media = Seq(
      Multimodal.WavRow(1L, Multimodal.encodeWavPcm16(a.toSeq, 16000)),
      Multimodal.WavRow(2L, Multimodal.encodeWavPcm16(b.toSeq, 16000)),
      Multimodal.WavRow(100001L,
        Multimodal.encodeWavPcm16(aCopy.toSeq, 44100))).toDS()
    val tol = Multimodal.audioTolerantDedup(media, minSim = 0.5,
      windowSamples = 128, maxHamming = 10, canonicalRate = 16000)
      .collect()
    tol.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 100001L)) // found — and ONLY the planted pair
    // the copy comes back one sample short (floor-of-floor), so the
    // perfect alignment is 2*min(nw, nw')/(nw+nw')
    val n1 = tol.head.getAs[Long]("n1")
    val n2 = tol.head.getAs[Long]("n2")
    tol.head.getAs[Long]("lcs") shouldBe math.min(n1, n2)
    // the exact arm is a total miss on the same blobs — the lossy
    // frontier the tolerance exists to cross
    Multimodal.audioShiftDedup(media, minSim = 0.1,
        windowSamples = 128, canonicalRate = 16000)
      .collect() shouldBe empty
    // at k = 0 the tolerant operator degenerates to the exact verdict
    Multimodal.audioTolerantDedup(media, minSim = 0.1,
        windowSamples = 128, maxHamming = 0, canonicalRate = 16000)
      .collect() shouldBe empty
  }

  test("q410/q413 gate fixtures hold at sf0.001: every SA-progressive " +
      "re-encode collides within Hamming 6; every decoded RGB channel " +
      "sits inside the JFIF-conversion tolerance") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val q410 = QueriesMultimodal.registry("q410_jpeg_sa_collision")(
      spark, dir)
    q410.count() should be > 0L
    q410.filter(!col("collides")).count() shouldBe 0L
    val q413 = QueriesMultimodal.registry("q413_jpeg_color_features")(
      spark, dir)
    q413.count() should be > 0L
    q413.filter(!col("r_ok") || !col("g_ok") || !col("b_ok"))
      .count() shouldBe 0L
  }
}
