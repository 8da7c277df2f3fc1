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
  }

  test("encode clamps out-of-range samples to int16") {
    val bytes = Multimodal.encodeWavPcm16(Seq(40000, -40000), 8000)
    val f = Multimodal.decodeWavPcm16(bytes)
    f.peak shouldBe 32768
    f.sum_sq shouldBe (32767L * 32767 + 32768L * 32768)
  }
}
