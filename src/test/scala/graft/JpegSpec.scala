package graft

import graft.operators.Jpeg

/** Baseline JPEG codec (Jpeg.scala, written from ITU-T T.81): lossy
  * round-trip TOLERANCE contracts, exact cases, the multi-component
  * and restart-interval paths, and the strict-parser malformed-input
  * battery. */
class JpegSpec extends SparkSpec {

  /** Deterministic pseudo-random pixels (seeded LCG — random noise is
    * JPEG's adversarial case: maximal high-frequency energy). */
  private def noise(n: Int, seed: Long): Array[Int] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt
    }
  }

  private def maxErr(a: Seq[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("flat-quant round-trip error <= 2 on noise, sizes incl. " +
      "non-multiple-of-8 and single-pixel") {
    for ((w, h) <- Seq((8, 8), (16, 16), (9, 8), (17, 13), (1, 1),
        (32, 5), (5, 32))) {
      val px = noise(w * h, seed = w * 1000L + h)
      val blob = Jpeg.encodeJpegGray(px.toSeq, w)
      val (gw, gh, got) = Jpeg.decodeJpegLumas(blob)
      (gw, gh) shouldBe ((w, h))
      withClue(s"${w}x$h: ") { maxErr(px.toSeq, got) should be <= 2 }
    }
  }

  test("constant and smooth-ramp images round-trip EXACTLY at flat quant") {
    // a constant block has only a DC coefficient (an exact multiple of
    // 8 in doubles), so quantize/dequantize/IDCT is error-free
    for (v <- Seq(0, 128, 255, 7)) {
      val px = Array.fill(24 * 16)(v)
      val (_, _, got) = Jpeg.decodeJpegLumas(
        Jpeg.encodeJpegGray(px.toSeq, 24))
      got.toSeq shouldBe px.toSeq
    }
    // horizontal ramp: one AC mode per row block — still near-exact;
    // pin the measured 0 so a transform regression is loud
    val ramp = Array.tabulate(16 * 8)(k => (k % 16) * 16)
    val (_, _, got) = Jpeg.decodeJpegLumas(
      Jpeg.encodeJpegGray(ramp.toSeq, 16))
    maxErr(ramp.toSeq, got) should be <= 1
  }

  test("Annex K luminance quant: decode succeeds, smooth images stay " +
      "close, noise bounded") {
    val w = 24; val h = 24
    val smooth = Array.tabulate(w * h)(k => 100 + (k % w) * 3 + (k / w))
    val (_, _, gotS) = Jpeg.decodeJpegLumas(
      Jpeg.encodeJpegGray(smooth.toSeq, w, Jpeg.QuantAnnexKLuma))
    maxErr(smooth.toSeq, gotS) should be <= 25
    val px = noise(w * h, 42L)
    val (_, _, gotN) = Jpeg.decodeJpegLumas(
      Jpeg.encodeJpegGray(px.toSeq, w, Jpeg.QuantAnnexKLuma))
    // noise is the adversarial input for a coarse quantizer; the point
    // is a sane bound, not fidelity
    maxErr(px.toSeq, gotN) should be <= 160
  }

  test("4:4:4 and 4:2:0 color scans: Y plane matches the grayscale " +
      "decode, nComponents = 3") {
    val w = 20; val h = 12
    val y = noise(w * h, 7L)
    val gray = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(y.toSeq, w))
    val c444 = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(
      y.toSeq, Seq.fill(w * h)(128), Seq.fill(w * h)(128), w,
      subsample420 = false))
    c444.nComponents shouldBe 3
    c444.lumas.toSeq shouldBe gray.lumas.toSeq
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val c420 = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(
      y.toSeq, Seq.fill(cw * ch)(128), Seq.fill(cw * ch)(128), w,
      subsample420 = true))
    c420.nComponents shouldBe 3
    (c420.width, c420.height) shouldBe ((w, h))
    // 4:2:0 pads Y to 16-pixel MCUs — same pixels after crop
    c420.lumas.toSeq shouldBe gray.lumas.toSeq
  }

  test("restart intervals: DRI-coded stream decodes to the same pixels") {
    val w = 24; val h = 24 // 9 MCUs -> 4 RST markers at interval 2
    val px = noise(w * h, 11L)
    val plain = Jpeg.decodeJpegLumas(Jpeg.encodeJpegGray(px.toSeq, w))._3
    val blob = Jpeg.encodeJpegGray(px.toSeq, w, restartInterval = 2)
    val withRst = Jpeg.decodeJpegLumas(blob)._3
    withRst.toSeq shouldBe plain.toSeq
    // the DRI stream really does carry RST markers
    blob.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 &&
        (p(1) & 0xff) <= 0xd7) should be >= 4
  }

  test("malformed inputs fail loudly with the offending field named") {
    val good = Jpeg.encodeJpegGray(noise(16 * 16, 3L).toSeq, 16)
    // truncated scan: cut the entropy data before EOI
    val cut = good.take(good.length - 12)
    val e1 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(cut)
    }
    e1.getMessage should (include("truncated") or include("marker"))
    // trailing bytes after EOI
    val e2 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(good ++ Array[Byte](0, 1, 2))
    }
    e2.getMessage should include("trailing bytes")
    // lossless SOF3 rejected by name (SOF2 is a REAL decode since r9,
    // so a baseline stream relabeled SOF2 instead fails the
    // progressive scan-shape rules)
    val sofAt = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xc0).get
    val lossless = good.clone()
    lossless(sofAt + 1) = 0xc3.toByte
    val e3 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(lossless)
    }
    e3.getMessage should include("SOF")
    val relabeled = good.clone()
    relabeled(sofAt + 1) = 0xc2.toByte
    val e3b = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(relabeled)
    }
    e3b.getMessage should include("progressive DC scan")
    // bad magic
    an[IllegalArgumentException] should be thrownBy
      Jpeg.decodeJpeg("not a jpeg at all".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      Jpeg.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte))
    // over-subscribed Huffman table: corrupt the first DHT's BITS so
    // it declares 3 codes of length 1
    val badDht = good.clone()
    val dhtAt = badDht.indices.find(i => (badDht(i) & 0xff) == 0xff &&
      i + 1 < badDht.length && (badDht(i + 1) & 0xff) == 0xc4).get
    badDht(dhtAt + 5) = 3 // BITS[1]
    val e4 = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(badDht) }
    e4.getMessage should (include("Huffman") or include("DHT"))
    // encoder contracts
    an[IllegalArgumentException] should be thrownBy
      Jpeg.encodeJpegGray(Seq(1, 2, 3), 2) // rows don't fill
    an[IllegalArgumentException] should be thrownBy
      Jpeg.encodeJpegGray(Seq(300), 1) // out of range
    an[IllegalArgumentException] should be thrownBy
      Jpeg.encodeJpegGray(Seq(1), 1, Array.fill(64)(0)) // zero quant
  }

  test("dHash of a JPEG re-encode stays within the near-dup threshold " +
      "of the source hash") {
    import graft.operators.Multimodal
    // 9-wide images (the q389 shape) at several heights
    for (h <- Seq(8, 16, 40)) {
      val px = noise(9 * h, h.toLong)
      val h0 = Multimodal.dHash64(px, 9, h)
      val (_, _, dec) = Jpeg.decodeJpegLumas(
        Jpeg.encodeJpegGray(px.toSeq, 9))
      val h1 = Multimodal.dHash64(dec, 9, h)
      java.lang.Long.bitCount(h0 ^ h1) should be <= 6
    }
  }

  test("progressive (SOF2) decodes PIXEL-IDENTICAL to baseline: same " +
      "coefficients, shared dequant+IDCT — gray, 4:4:4, 4:2:0, odd sizes") {
    for ((w, h) <- Seq((8, 8), (17, 13), (24, 24), (9, 8))) {
      val px = noise(w * h, w * 100L + h)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(px.toSeq, w))
      val prog = Jpeg.decodeJpeg(
        Jpeg.encodeJpegGray(px.toSeq, w, progressive = true))
      withClue(s"${w}x$h gray: ") {
        prog.lumas.toSeq shouldBe base.lumas.toSeq
      }
    }
    val w = 20; val h = 12
    val y = noise(w * h, 77L)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val b420 = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y.toSeq,
      Seq.fill(cw * ch)(128), Seq.fill(cw * ch)(128), w,
      subsample420 = true))
    val p420 = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y.toSeq,
      Seq.fill(cw * ch)(128), Seq.fill(cw * ch)(128), w,
      subsample420 = true, progressive = true))
    p420.nComponents shouldBe 3
    p420.lumas.toSeq shouldBe b420.lumas.toSeq
    val b444 = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y.toSeq,
      Seq.fill(w * h)(128), Seq.fill(w * h)(128), w,
      subsample420 = false))
    val p444 = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y.toSeq,
      Seq.fill(w * h)(128), Seq.fill(w * h)(128), w,
      subsample420 = false, progressive = true))
    p444.lumas.toSeq shouldBe b444.lumas.toSeq
  }

  test("progressive EOB-run coding: coarse quant on smooth images " +
      "forces real EOBn runs, still pixel-equal to baseline") {
    // Annex K quant zeroes most AC bands on smooth content -> the AC
    // scan's EOB-run accumulator emits genuine EOBn (run > 1) symbols
    // from the extended tables, exercising the decoder's run-skip path
    val w = 48; val h = 48
    val smooth = Array.tabulate(w * h)(k => 80 + (k % w) / 2 + (k / w) / 2)
    val base = Jpeg.decodeJpeg(
      Jpeg.encodeJpegGray(smooth.toSeq, w, Jpeg.QuantAnnexKLuma))
    val progBlob = Jpeg.encodeJpegGray(smooth.toSeq, w,
      Jpeg.QuantAnnexKLuma, progressive = true)
    Jpeg.decodeJpeg(progBlob).lumas.toSeq shouldBe base.lumas.toSeq
    // and an all-constant image: EVERY band empty -> one maximal run
    val const = Array.fill(40 * 40)(200)
    Jpeg.decodeJpeg(Jpeg.encodeJpegGray(const.toSeq, 40,
      Jpeg.QuantAnnexKLuma, progressive = true)).lumas.toSeq shouldBe
      Jpeg.decodeJpeg(Jpeg.encodeJpegGray(const.toSeq, 40,
        Jpeg.QuantAnnexKLuma)).lumas.toSeq
  }

  test("progressive strictness: approximation-sequence violations, " +
      "partial coverage, and unfinished refinement are rejected by name") {
    val good = Jpeg.encodeJpegGray(noise(16 * 16, 9L).toSeq, 16,
      progressive = true)
    // flip the first SOS's Ah/Al byte (Ss=0, Se=0 scan -> AhAl at
    // +5+2*ns) to claim Al=1: the scan itself is legal, but no
    // refinement follows, so EOI must flag the unfinished level
    val sosAt = good.indices.find(i => (good(i) & 0xff) == 0xff &&
      i + 1 < good.length && (good(i + 1) & 0xff) == 0xda).get
    val ns = good(sosAt + 4) & 0xff
    val sa = good.clone()
    sa(sosAt + 7 + 2 * ns) = 0x01.toByte // Al=1, no Ah=1 scan follows
    val e1 = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(sa) }
    e1.getMessage should include("approximation level")
    // a skipped-level refinement claim (Ah=3, Al=1) is rejected at the
    // scan header: one bit per scan
    val skip = good.clone()
    skip(sosAt + 7 + 2 * ns) = 0x31.toByte
    val e1b = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(skip) }
    e1b.getMessage should include("one bit per scan")
    // a refinement over a never-scanned band is rejected by name: make
    // the FIRST DC scan claim Ah=1 (refining level-1 state that does
    // not exist)
    val orphan = good.clone()
    orphan(sosAt + 7 + 2 * ns) = 0x10.toByte // Ah=1, Al=0
    val e1c = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(orphan) }
    e1c.getMessage should include("refinement scan")
    // truncate before the AC scan: DC-only coverage must fail loudly
    val acSosAt = good.indices.drop(sosAt + 2).find(i =>
      (good(i) & 0xff) == 0xff && i + 1 < good.length &&
        (good(i + 1) & 0xff) == 0xda).get
    val dcOnly = good.take(acSosAt) ++
      Array(0xff.toByte, 0xd9.toByte)
    val e2 = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(dcOnly) }
    e2.getMessage should include("never scanned")
    // successive approximation: dropping the refinement scans leaves
    // every band at level 1 — named at EOI
    val saGood = Jpeg.encodeJpegGray(noise(16 * 16, 9L).toSeq, 16,
      progressive = true, successiveApprox = true)
    val saSos = (0 until 3).foldLeft(-1) { (from, _) =>
      saGood.indices.drop(from + 2).find(i =>
        (saGood(i) & 0xff) == 0xff && (saGood(i + 1) & 0xff) == 0xda).get
    } // position of the 3rd SOS (the first refinement scan)
    val firstHalf = saGood.take(saSos) ++ Array(0xff.toByte, 0xd9.toByte)
    val e3 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(firstHalf)
    }
    e3.getMessage should include("approximation level 1")
  }

  test("successive approximation (Ah/Al refinement scans) decodes " +
      "PIXEL-IDENTICAL to baseline: gray, 4:4:4, 4:2:0, coarse quant, " +
      "and with restart intervals") {
    for ((w, h) <- Seq((8, 8), (17, 13), (24, 24), (9, 8))) {
      val px = noise(w * h, w * 31L + h)
      val base = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(px.toSeq, w))
      val sa = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(px.toSeq, w,
        progressive = true, successiveApprox = true))
      withClue(s"${w}x$h gray SA: ") {
        sa.lumas.toSeq shouldBe base.lumas.toSeq
      }
    }
    // coarse quant: EOB runs + refinement correction bits interact
    // (the G.1.2.3 buffered-bit path)
    val w = 48; val h = 48
    val smooth = Array.tabulate(w * h)(k => 80 + (k % w) / 2 + (k / w) / 2)
    Jpeg.decodeJpeg(Jpeg.encodeJpegGray(smooth.toSeq, w,
        Jpeg.QuantAnnexKLuma, progressive = true,
        successiveApprox = true)).lumas.toSeq shouldBe
      Jpeg.decodeJpeg(Jpeg.encodeJpegGray(smooth.toSeq, w,
        Jpeg.QuantAnnexKLuma)).lumas.toSeq
    // color, both subsampling shapes
    val w2 = 20; val h2 = 12
    val y2 = noise(w2 * h2, 78L)
    val cw = (w2 + 1) / 2; val ch = (h2 + 1) / 2
    val cb = noise(cw * ch, 79L).map(v => 64 + v / 2)
    val cr = noise(cw * ch, 80L).map(v => 64 + v / 2)
    Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y2.toSeq, cb.toSeq, cr.toSeq, w2,
        subsample420 = true, progressive = true,
        successiveApprox = true)).lumas.toSeq shouldBe
      Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y2.toSeq, cb.toSeq, cr.toSeq,
        w2, subsample420 = true)).lumas.toSeq
    val cbF = noise(w2 * h2, 81L).map(v => 64 + v / 2)
    val crF = noise(w2 * h2, 82L).map(v => 64 + v / 2)
    Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y2.toSeq, cbF.toSeq, crF.toSeq,
        w2, subsample420 = false, progressive = true,
        successiveApprox = true)).lumas.toSeq shouldBe
      Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y2.toSeq, cbF.toSeq, crF.toSeq,
        w2, subsample420 = false)).lumas.toSeq
    // DRI inside progressive AND successive-approximation scans
    // (restart markers between DC MCUs and between AC blocks, EOB
    // runs flushed at each restart point)
    val px3 = noise(32 * 24, 83L)
    val plain = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(px3.toSeq, 32))
    Jpeg.decodeJpeg(Jpeg.encodeJpegGray(px3.toSeq, 32,
      restartInterval = 3, progressive = true)).lumas.toSeq shouldBe
      plain.lumas.toSeq
    Jpeg.decodeJpeg(Jpeg.encodeJpegGray(px3.toSeq, 32,
      restartInterval = 3, progressive = true,
      successiveApprox = true)).lumas.toSeq shouldBe plain.lumas.toSeq
    Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y2.toSeq, cb.toSeq, cr.toSeq, w2,
        subsample420 = true, restartInterval = 2, progressive = true,
        successiveApprox = true)).lumas.toSeq shouldBe
      Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y2.toSeq, cb.toSeq, cr.toSeq,
        w2, subsample420 = true)).lumas.toSeq
  }

  test("4:2:2 and 4:1:1 subsampling (the full T.81 factor range): Y " +
      "plane matches the grayscale decode across baseline/progressive/" +
      "SA, ImageIO agrees on geometry, and the MCU block bound holds") {
    val w = 24; val h = 16
    val y = noise(w * h, 71L)
    val gray = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(y.toSeq, w))
    for (scheme <- Seq("422", "411")) {
      val (cw, ch, _, _) = Jpeg.chromaDims(scheme, w, h)
      val cb = noise(cw * ch, 72L).map(v => 64 + v / 2)
      val cr = noise(cw * ch, 73L).map(v => 64 + v / 2)
      def enc(prog: Boolean, sa: Boolean) = Jpeg.encodeJpegYccScheme(
        y.toSeq, cb.toSeq, cr.toSeq, w, scheme,
        progressive = prog, successiveApprox = sa)
      withClue(s"$scheme: ") {
        val blob = enc(prog = false, sa = false)
        val dec = Jpeg.decodeJpeg(blob)
        dec.nComponents shouldBe 3
        // same luma as the single-component encode of the same pixels
        dec.lumas.toSeq shouldBe gray.lumas.toSeq
        // progressive and SA layouts decode pixel-identical
        Jpeg.decodeJpeg(enc(prog = true, sa = false)).lumas.toSeq shouldBe
          dec.lumas.toSeq
        Jpeg.decodeJpeg(enc(prog = true, sa = true)).lumas.toSeq shouldBe
          dec.lumas.toSeq
        // the independent JDK codec accepts the stream
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob))
        img should not be null
        (img.getWidth, img.getHeight) shouldBe ((w, h))
        // constant-chroma RGB decode: replication upsampling reads
        // each chroma sample for its pixel span
        val rgb = Jpeg.decodeJpegRgb(Jpeg.encodeJpegYccScheme(y.toSeq,
          Seq.fill(cw * ch)(160), Seq.fill(cw * ch)(90), w, scheme))
        def clamp(v: Long): Int = math.max(0, math.min(255, v.toInt))
        val exR0 = clamp(Math.round(y(0) + 1.402 * (90 - 128)))
        math.abs(rgb.r(0) - exR0) should be <= 6
      }
    }
    // a 4x4-luma frame would need a 18-block MCU: rejected by name
    // on BOTH sides of the codec (T.81 B.2.3 caps an MCU at 10)
    val sofBlob = Jpeg.encodeJpegYccScheme(y.toSeq,
      Seq.fill(((w + 3) / 4) * h)(128), Seq.fill(((w + 3) / 4) * h)(128),
      w, "411")
    val sofAt2 = sofBlob.indices.find(i => (sofBlob(i) & 0xff) == 0xff &&
      (sofBlob(i + 1) & 0xff) == 0xc0).get
    val bad = sofBlob.clone()
    bad(sofAt2 + 11) = 0x44.toByte // luma factors 4x4 -> MCU 18 blocks
    val e = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(bad) }
    e.getMessage should include("bound of 10")
  }

  test("SOF1 (extended sequential, 8-bit) decodes exactly like SOF0: " +
      "the marker lifts limits baseline imposes, not semantics") {
    val w = 24; val h = 16
    val px = noise(w * h, 63L)
    val blob = Jpeg.encodeJpegGray(px.toSeq, w)
    val base = Jpeg.decodeJpeg(blob)
    val sofAt = blob.indices.find(i => (blob(i) & 0xff) == 0xff &&
      (blob(i + 1) & 0xff) == 0xc0).get
    val sof1 = blob.clone()
    sof1(sofAt + 1) = 0xc1.toByte
    Jpeg.decodeJpeg(sof1).lumas.toSeq shouldBe base.lumas.toSeq
    // 12-bit precision (what SOF1 exists for) stays rejected by name
    val deep = sof1.clone()
    deep(sofAt + 4) = 12.toByte // precision byte
    val e = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(deep) }
    e.getMessage should include("not 8-bit")
    // lossless (SOF3) still fails loudly
    val sof3 = blob.clone()
    sof3(sofAt + 1) = 0xc3.toByte
    val e2 = intercept[IllegalArgumentException] { Jpeg.decodeJpeg(sof3) }
    e2.getMessage should include("unsupported SOF")
  }

  test("single-component (Ns=1) DC scans: the T.81-legal per-component " +
      "DC script decodes pixel-identical to the interleaved one — " +
      "plain, successive-approximation, subsampled, and with DRI") {
    val w = 20; val h = 12
    val y = noise(w * h, 41L)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val cb = noise(cw * ch, 42L).map(v => 64 + v / 2)
    val cr = noise(cw * ch, 43L).map(v => 64 + v / 2)
    val base = Jpeg.decodeJpeg(Jpeg.encodeJpegYcc(y.toSeq, cb.toSeq,
      cr.toSeq, w, subsample420 = true))
    for (sa <- Seq(false, true); dri <- Seq(0, 2)) {
      withClue(s"sa=$sa dri=$dri: ") {
        val blob = Jpeg.encodeJpegYcc(y.toSeq, cb.toSeq, cr.toSeq, w,
          subsample420 = true, restartInterval = dri,
          progressive = true, successiveApprox = sa,
          separateDcScans = true)
        // the stream really carries Ns=1 DC scans
        val dcNs = blob.indices.filter { i =>
          (blob(i) & 0xff) == 0xff && i + 9 < blob.length &&
            (blob(i + 1) & 0xff) == 0xda && {
              val ns = blob(i + 4) & 0xff
              (blob(i + 5 + 2 * ns) & 0xff) == 0 && // Ss = 0
                (blob(i + 6 + 2 * ns) & 0xff) == 0  // Se = 0
            }
        }.map(i => blob(i + 4) & 0xff)
        dcNs should not be empty
        all(dcNs) shouldBe 1
        Jpeg.decodeJpeg(blob).lumas.toSeq shouldBe base.lumas.toSeq
      }
    }
    // a DC scan over a strict SUBSET (2 of 3 components) stays
    // rejected: patch the first Ns=1 DC scan's Ns up to 2 (header
    // fields shift, so the decoder must fail loudly either on the
    // count or on the malformed header it implies)
    val blob2 = Jpeg.encodeJpegYcc(y.toSeq, cb.toSeq, cr.toSeq, w,
      subsample420 = true, progressive = true, separateDcScans = true)
    val sosAt = blob2.indices.find(i => (blob2(i) & 0xff) == 0xff &&
      (blob2(i + 1) & 0xff) == 0xda).get
    val patched = blob2.clone()
    patched(sosAt + 4) = 2.toByte // Ns 1 -> 2, length now wrong too
    an[IllegalArgumentException] should be thrownBy
      Jpeg.decodeJpeg(patched)
  }

  test("decodeJpegRgb: gray frames replicate the luma; color frames " +
      "reconstruct RGB within the lossy tolerance of the exact JFIF " +
      "conversion of the source planes") {
    val w = 16; val h = 16
    val px = noise(w * h, 91L)
    val gray = Jpeg.decodeJpegRgb(Jpeg.encodeJpegGray(px.toSeq, w))
    gray.nComponents shouldBe 1
    gray.r.toSeq shouldBe gray.g.toSeq
    gray.g.toSeq shouldBe gray.b.toSeq
    gray.r.toSeq shouldBe Jpeg.decodeJpegLumas(
      Jpeg.encodeJpegGray(px.toSeq, w))._3.toSeq
    // 4:4:4 flat quant: each decoded plane is within 2 of its source
    // (the q404 bound), so each RGB channel is within the propagated
    // JFIF-matrix bound of the exact conversion
    val y = noise(w * h, 92L)
    val cb = noise(w * h, 93L).map(v => 64 + v / 2)
    val cr = noise(w * h, 94L).map(v => 64 + v / 2)
    val rgb = Jpeg.decodeJpegRgb(Jpeg.encodeJpegYcc(y.toSeq, cb.toSeq,
      cr.toSeq, w, subsample420 = false))
    rgb.nComponents shouldBe 3
    def clamp(v: Long): Int = math.max(0, math.min(255, v.toInt))
    var maxd = 0
    for (i <- 0 until w * h) {
      val exR = clamp(Math.round(y(i) + 1.402 * (cr(i) - 128)))
      val exG = clamp(Math.round(y(i) - 0.344136 * (cb(i) - 128) -
        0.714136 * (cr(i) - 128)))
      val exB = clamp(Math.round(y(i) + 1.772 * (cb(i) - 128)))
      maxd = math.max(maxd, math.abs(rgb.r(i) - exR))
      maxd = math.max(maxd, math.abs(rgb.g(i) - exG))
      maxd = math.max(maxd, math.abs(rgb.b(i) - exB))
    }
    maxd should be <= 8
    // 4:2:0: replication upsampling reads each chroma sample for its
    // 2x2 pixel quad — check a constant-chroma image is exact there
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val rgb420 = Jpeg.decodeJpegRgb(Jpeg.encodeJpegYcc(y.toSeq,
      Seq.fill(cw * ch)(160), Seq.fill(cw * ch)(90), w,
      subsample420 = true))
    for (i <- Seq(0, w + 1, w * h - 1)) {
      val exR = clamp(Math.round(y(i) + 1.402 * (90 - 128)))
      math.abs(rgb420.r(i) - exR) should be <= 6
    }
  }

  test("Ns=1 scans use the NON-interleaved grid: a single-component " +
      "frame declaring 2x2 factors decodes identically to its 1x1 twin") {
    // jpegtran-style grayscale keeps the source luma's 2x2 factors in
    // SOF while the scan data stays on the ceil(w/8) grid (T.81
    // A.2.2 ignores sampling factors for Ns=1) — patch our blob's SOF
    // sampling byte and the decode must not change
    val w = 24; val h = 24
    val px = noise(w * h, 57L)
    val blob = Jpeg.encodeJpegGray(px.toSeq, w)
    val plain = Jpeg.decodeJpegLumas(blob)._3
    val sofAt = blob.indices.find(i => (blob(i) & 0xff) == 0xff &&
      i + 1 < blob.length && (blob(i + 1) & 0xff) == 0xc0).get
    val patched = blob.clone()
    // SOF0 payload: len(2) P(1) Y(2) X(2) Nf(1) [Cid HV Tq] — HV at +10
    (patched(sofAt + 11) & 0xff) shouldBe 0x11
    patched(sofAt + 11) = 0x22.toByte
    val got = Jpeg.decodeJpeg(patched)
    (got.width, got.height) shouldBe ((w, h))
    got.lumas.toSeq shouldBe plain.toSeq
    // same invariance under a restart interval (blocks, not MCUs)
    val blobR = Jpeg.encodeJpegGray(px.toSeq, w, restartInterval = 2)
    val sofR = blobR.indices.find(i => (blobR(i) & 0xff) == 0xff &&
      i + 1 < blobR.length && (blobR(i + 1) & 0xff) == 0xc0).get
    val patchedR = blobR.clone()
    patchedR(sofR + 11) = 0x22.toByte
    Jpeg.decodeJpeg(patchedR).lumas.toSeq shouldBe plain.toSeq
  }

  test("interop with the JDK's independent JPEG codec: ImageIO reads " +
      "our streams, we read ImageIO's (incl. real 4:2:0 color)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // ours -> ImageIO: an independent libjpeg-derived implementation
    // must accept our baseline stream and agree on pixels (its integer
    // IDCT vs our double IDCT differ by a couple of gray levels)
    val w = 24; val h = 16
    val px = noise(w * h, 21L)
    val blob = Jpeg.encodeJpegGray(px.toSeq, w)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(blob))
    img should not be null
    (img.getWidth, img.getHeight) shouldBe ((w, h))
    val (_, _, ours) = Jpeg.decodeJpegLumas(blob)
    val raster = img.getRaster
    val diffs = for (y <- 0 until h; x <- 0 until w)
      yield math.abs(raster.getSample(x, y, 0) - ours(y * w + x))
    diffs.max should be <= 3
    // ImageIO -> ours: gray content in an RGB frame makes the JDK
    // writer emit a REAL 3-component YCbCr 4:2:0 baseline stream
    // (default subsampling) — foreign DHT/DQT tables, foreign entropy
    // layout, subsampled chroma our decoder must walk correctly
    val w2 = 20; val h2 = 12
    val px2 = noise(w2 * h2, 33L)
    val bi = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h2; x <- 0 until w2) {
      val v = px2(y * w2 + x)
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.97f)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    writer.dispose(); ios.close()
    val foreign = bos.toByteArray
    val dec = Jpeg.decodeJpeg(foreign)
    (dec.width, dec.height, dec.nComponents) shouldBe ((w2, h2, 3))
    // our Y plane vs ImageIO's own re-decode of the same bytes: the
    // original was gray (Y == gray level), so the green channel of
    // their decode approximates Y; allow RGB<->YCbCr conversion slack
    val re = ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    val d2 = for (y <- 0 until h2; x <- 0 until w2)
      yield math.abs(((re.getRGB(x, y) >> 8) & 0xff) -
        dec.lumas(y * w2 + x))
    d2.max should be <= 6
    // the JDK writer's PROGRESSIVE mode uses libjpeg's default scan
    // script — successive-approximation refinement scans, what real
    // web progressive JPEGs carry. Since r10 this MUST decode here,
    // pixel-equivalent to ImageIO's own re-decode (the r9 either/or
    // collapsed to its strong arm)
    val bos2 = new java.io.ByteArrayOutputStream()
    val wr2 = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios2 = ImageIO.createImageOutputStream(bos2)
    wr2.setOutput(ios2)
    val p2 = wr2.getDefaultWriteParam
    p2.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    wr2.write(null, new javax.imageio.IIOImage(bi, null, null), p2)
    wr2.dispose(); ios2.close()
    val prog = bos2.toByteArray
    // confirm the fixture really exercises successive approximation:
    // some SOS must carry AhAl != 0
    val sawSa = prog.indices.exists { i =>
      (prog(i) & 0xff) == 0xff && i + 3 < prog.length &&
        (prog(i + 1) & 0xff) == 0xda && {
          val ns = prog(i + 4) & 0xff
          i + 7 + 2 * ns < prog.length &&
            (prog(i + 7 + 2 * ns) & 0xff) != 0
        }
    }
    sawSa shouldBe true
    val d = Jpeg.decodeJpeg(prog)
    (d.width, d.height) shouldBe ((w2, h2))
    val re2 = ImageIO.read(new java.io.ByteArrayInputStream(prog))
    val d3 = for (y <- 0 until h2; x <- 0 until w2)
      yield math.abs(((re2.getRGB(x, y) >> 8) & 0xff) -
        d.lumas(y * w2 + x))
    d3.max should be <= 8
    // the reverse direction: ImageIO reads OUR successive-
    // approximation stream and agrees with our decode of it
    val oursSa = Jpeg.encodeJpegGray(px.toSeq, w, progressive = true,
      successiveApprox = true)
    val imgSa = ImageIO.read(new java.io.ByteArrayInputStream(oursSa))
    imgSa should not be null
    val (_, _, oursSaDec) = Jpeg.decodeJpegLumas(oursSa)
    val d4 = for (y <- 0 until h; x <- 0 until w)
      yield math.abs(imgSa.getRaster.getSample(x, y, 0) -
        oursSaDec(y * w + x))
    d4.max should be <= 3
    // GRAYSCALE progressive from ImageIO: the single-component
    // libjpeg script (chained Al=2 -> 1 -> 0 refinements)
    val biG = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h2; x <- 0 until w2)
      biG.getRaster.setSample(x, y, 0, px2(y * w2 + x))
    val bos3 = new java.io.ByteArrayOutputStream()
    val wr3 = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios3 = ImageIO.createImageOutputStream(bos3)
    wr3.setOutput(ios3)
    val p3 = wr3.getDefaultWriteParam
    p3.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    wr3.write(null, new javax.imageio.IIOImage(biG, null, null), p3)
    wr3.dispose(); ios3.close()
    val progG = bos3.toByteArray
    val dG = Jpeg.decodeJpeg(progG)
    (dG.width, dG.height, dG.nComponents) shouldBe ((w2, h2, 1))
    val reG = ImageIO.read(new java.io.ByteArrayInputStream(progG))
    val d5 = for (y <- 0 until h2; x <- 0 until w2)
      yield math.abs(reG.getRaster.getSample(x, y, 0) -
        dG.lumas(y * w2 + x))
    d5.max should be <= 3
  }

  test("randomized property: any geometry x any quant table round-trips, " +
      "progressive == baseline EXACTLY, ImageIO accepts the stream") {
    val rnd = new scala.util.Random(0x5ca1ab1eL)
    (0 until 25).foreach { trial =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      // random quant: mix of fine and brutal entries
      val quant = Array.fill(64)(1 + rnd.nextInt(255))
      val blob = Jpeg.encodeJpegGray(px.toSeq, w, quant)
      val (gw, gh, base) = Jpeg.decodeJpegLumas(blob)
      withClue(s"trial $trial ${w}x$h: ") {
        (gw, gh) shouldBe ((w, h))
        // the progressive layout of the SAME coefficients is
        // pixel-identical regardless of quant — structural, not a
        // tolerance
        val (_, _, prog) = Jpeg.decodeJpegLumas(
          Jpeg.encodeJpegGray(px.toSeq, w, quant, progressive = true))
        prog.toSeq shouldBe base.toSeq
        // ... and so is the successive-approximation layout, with a
        // random restart interval thrown in every third trial
        val saDri = if (trial % 3 == 0) 1 + rnd.nextInt(4) else 0
        val (_, _, sa) = Jpeg.decodeJpegLumas(
          Jpeg.encodeJpegGray(px.toSeq, w, quant, restartInterval = saDri,
            progressive = true, successiveApprox = true))
        sa.toSeq shouldBe base.toSeq
        // a random Exif orientation every 4th trial: the tagged
        // decode must EXACTLY equal the transform applied to the
        // untagged decode of the same stored plane — structural
        // equality (same codec pipeline, the only delta is APP1 +
        // the final re-index), so arbitrary quant loss cancels out
        if (trial % 4 == 0) {
          val o = 2 + rnd.nextInt(7)
          val (stored, sw, sh) = Jpeg.applyExifOrientation(px, w, h,
            Jpeg.inverseExifOrientation(o))
          val tagged = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(
            stored.toSeq, sw, quant, exifOrientation = o))
          tagged.orientation shouldBe o
          (tagged.width, tagged.height) shouldBe ((w, h))
          val raw = Jpeg.decodeJpeg(
            Jpeg.encodeJpegGray(stored.toSeq, sw, quant))
          val (expUp, _, _) =
            Jpeg.applyExifOrientation(raw.lumas, sw, sh, o)
          tagged.lumas.toSeq shouldBe expUp.toSeq
        }
        // an independent implementation parses our stream and agrees
        // on geometry (pixel agreement is checked in the dedicated
        // interop test; arbitrary quant tables only widen IDCT slack)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(blob))
        img should not be null
        (img.getWidth, img.getHeight) shouldBe ((w, h))
        // restart intervals leave baseline pixels untouched
        if (trial % 5 == 0) {
          val (_, _, rst) = Jpeg.decodeJpegLumas(Jpeg.encodeJpegGray(
            px.toSeq, w, quant, restartInterval = 1 + rnd.nextInt(4)))
          rst.toSeq shouldBe base.toSeq
        }
      }
    }
  }

  test("RealCodecDecoder routes FFD8 blobs to the real JPEG parser") {
    val blob = Jpeg.encodeJpegGray(noise(16 * 8, 5L).toSeq, 16)
    val d = new graft.operators.Multimodal.RealCodecDecoder()
      .decode(blob)
    (d.width, d.height, d.nFrames) shouldBe ((16, 8, 1))
  }

  test("Exif orientation: all 8 cases decode back to upright pixels " +
      "(dims swap for 5-8), the transform pair is exact, color too") {
    val w = 9; val h = 16
    val px = noise(w * h, 77L)
    for (o <- 1 to 8) {
      val inv = Jpeg.inverseExifOrientation(o)
      val (stored, sw, sh) = Jpeg.applyExifOrientation(px, w, h, inv)
      if (o >= 5) (sw, sh) shouldBe ((h, w)) else (sw, sh) shouldBe ((w, h))
      // the pure transforms are exact inverses
      val (back, bw, bh) = Jpeg.applyExifOrientation(stored, sw, sh, o)
      (bw, bh) shouldBe ((w, h))
      back.toSeq shouldBe px.toSeq
      // codec round trip under the tag: the decoder re-uprights, so
      // the result compares against the ORIGINAL upright pixels
      // within the flat-quant bound (the lossy DCT runs on the stored
      // grid; the re-index afterwards is lossless)
      val dec = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(stored.toSeq, sw,
        exifOrientation = o))
      dec.orientation shouldBe o
      (dec.width, dec.height) shouldBe ((w, h))
      withClue(s"orientation $o: ") {
        maxErr(px.toSeq, dec.lumas) should be <= 2
      }
    }
    // color path: all three planes re-index (constant chroma makes the
    // expected planes derivable from the gray case)
    val (stored6, sw6, _) = Jpeg.applyExifOrientation(px, w, h,
      Jpeg.inverseExifOrientation(6))
    val n6 = stored6.length
    val rgb = Jpeg.decodeJpegRgb(Jpeg.encodeJpegYcc(stored6.toSeq,
      Seq.fill(n6)(128), Seq.fill(n6)(128), sw6, subsample420 = false,
      exifOrientation = 6))
    (rgb.width, rgb.height, rgb.orientation) shouldBe ((w, h, 6))
    maxErr(px.toSeq, rgb.g) should be <= 3
  }

  /** Splice a raw APP1 payload (after the 2-byte length) into an
    * untagged gray blob right after its 18-byte APP0 (offset 20). */
  private def withApp1(blob: Array[Byte], payload: Array[Byte])
      : Array[Byte] = {
    val len = payload.length + 2
    blob.take(20) ++
      Array(0xff.toByte, 0xe1.toByte, (len >> 8).toByte, len.toByte) ++
      payload ++ blob.drop(20)
  }

  private def bePayload(body: Int*): Array[Byte] =
    "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
      body.map(_.toByte).toArray

  test("Exif APP1 strictness: malformed TIFF fails loudly by name, " +
      "non-Exif APP1 and orientation-free Exif decode untransformed") {
    val w = 16; val h = 8
    val px = noise(w * h, 9L)
    val blob = Jpeg.encodeJpegGray(px.toSeq, w)
    val base = Jpeg.decodeJpeg(blob)
    // a valid big-endian block, as the encoder writes it
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Seq[Int] = Seq(
      tag >> 8, tag & 0xff, typ >> 8, typ & 0xff,
      cnt >>> 24, (cnt >> 16) & 0xff, (cnt >> 8) & 0xff, cnt & 0xff,
      v >> 8, v & 0xff, 0, 0)
    def tiff(orientEntry: Seq[Int], count: Int = 1): Array[Byte] =
      bePayload(Seq(0x4d, 0x4d, 0, 42, 0, 0, 0, 8, count >> 8,
        count & 0xff) ++ orientEntry ++ Seq(0, 0, 0, 0): _*)
    // well-formed: applies
    val good = withApp1(blob, tiff(entry(0x0112, 3, 1, 3)))
    Jpeg.decodeJpeg(good).orientation shouldBe 3
    // truncated TIFF header
    val e1 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(withApp1(blob, bePayload(0x4d, 0x4d)))
    }
    e1.getMessage should include("TIFF header truncated")
    // bad byte-order mark
    val e2 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(withApp1(blob, bePayload(
        'X', 'X', 0, 42, 0, 0, 0, 8)))
    }
    e2.getMessage should include("byte-order")
    // bad magic
    val e3 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(withApp1(blob, bePayload(
        0x4d, 0x4d, 0, 43, 0, 0, 0, 8)))
    }
    e3.getMessage should include("magic")
    // IFD0 offset outside the segment
    val e4 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(withApp1(blob, bePayload(
        0x4d, 0x4d, 0, 42, 0, 0, 0xff, 0xff)))
    }
    e4.getMessage should include("outside the segment")
    // entry count overruns the segment
    val e5 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(withApp1(blob, bePayload(
        0x4d, 0x4d, 0, 42, 0, 0, 0, 8, 0, 200)))
    }
    e5.getMessage should include("overruns")
    // wrong type (LONG, not SHORT)
    val e6 = intercept[IllegalArgumentException] {
      Jpeg.decodeJpeg(withApp1(blob, tiff(entry(0x0112, 4, 1, 3))))
    }
    e6.getMessage should include("must be one SHORT")
    // out-of-range values
    for (bad <- Seq(0, 9)) {
      val e = intercept[IllegalArgumentException] {
        Jpeg.decodeJpeg(withApp1(blob, tiff(entry(0x0112, 3, 1, bad))))
      }
      e.getMessage should include("out of [1, 8]")
    }
    // little-endian block parses too ("II", everything byte-swapped)
    val ii = bePayload(Seq(0x49, 0x49, 42, 0, 8, 0, 0, 0, 1, 0,
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 6, 0, 0, 0, 0, 0, 0, 0): _*)
    Jpeg.decodeJpeg(withApp1(blob, ii)).orientation shouldBe 6
    // non-Exif APP1 (XMP): ignored entirely
    val xmp = "http://ns.adobe.com/xap/1.0/ <x:xmpmeta/>"
      .getBytes("US-ASCII")
    val decXmp = Jpeg.decodeJpeg(withApp1(blob, xmp))
    decXmp.orientation shouldBe 1
    decXmp.lumas.toSeq shouldBe base.lumas.toSeq
    // Exif with an orientation-free IFD0: upright default
    val noOrient = withApp1(blob, tiff(entry(0x0100, 3, 1, w), count = 1))
    Jpeg.decodeJpeg(noOrient).orientation shouldBe 1
    // two Exif blocks: the FIRST wins (CP-3451 allows one; real
    // readers take the first)
    val twice = withApp1(withApp1(blob, tiff(entry(0x0112, 3, 1, 3))),
      tiff(entry(0x0112, 3, 1, 2)))
    Jpeg.decodeJpeg(twice).orientation shouldBe 2
  }

  test("Exif orientation interop: our upright decode equals the 8-case " +
      "transform applied to ImageIO's orientation-IGNORING raw decode") {
    import javax.imageio.ImageIO
    val w = 9; val h = 16
    val px = noise(w * h, 55L)
    val (stored, sw, sh) = Jpeg.applyExifOrientation(px, w, h,
      Jpeg.inverseExifOrientation(6))
    val blob = Jpeg.encodeJpegGray(stored.toSeq, sw, exifOrientation = 6)
    val ours = Jpeg.decodeJpeg(blob)
    (ours.width, ours.height) shouldBe ((w, h))
    // ImageIO's plain read ignores Exif: raw stored-orientation pixels
    val img = ImageIO.read(new java.io.ByteArrayInputStream(blob))
    img should not be null
    (img.getWidth, img.getHeight) shouldBe ((sw, sh))
    val raw = Array.tabulate(sw * sh)(k =>
      img.getRaster.getSample(k % sw, k / sw, 0))
    val (upright, uw, uh) = Jpeg.applyExifOrientation(raw, sw, sh, 6)
    (uw, uh) shouldBe ((w, h))
    // both decoders' pixels agree within IDCT slack; the transform is
    // the SAME 8-case table on both sides
    val diffs = upright.toSeq.zip(ours.lumas.toSeq)
      .map { case (a, b) => math.abs(a - b) }
    diffs.max should be <= 3
  }
}
