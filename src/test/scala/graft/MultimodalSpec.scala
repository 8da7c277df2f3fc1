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
  }

  test("RealCodecDecoder dispatches on magic: real BMP/WAV parse, " +
      "loud unsupported elsewhere") {
    val dec = new Multimodal.RealCodecDecoder
    val bmp = dec.decode(Multimodal.encodeBmpGray24(Seq(5, 6), 2))
    (bmp.width, bmp.height, bmp.nFrames) shouldBe (2, 1, 1)
    val wav = dec.decode(Multimodal.encodeWavPcm16(Seq(1, 2, 3), 8000))
    wav.nFrames shouldBe 3
    val e = the[UnsupportedOperationException] thrownBy
      dec.decode("PNG1234".getBytes("ISO-8859-1"))
    e.getMessage should include("89504e47") // the PNG magic, named
  }
}
