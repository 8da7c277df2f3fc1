package graft.operators

/** JPEG (ITU-T T.81 / ISO 10918-1), encoder and decoder, pure Scala —
  * the fifth real codec family in the repo (beside PNG's
  * zlib/filters, GIF's LZW, zip deflate, and Avro deflate) and the
  * one that matters most at corpus scale: a 100 TB web crawl's images
  * are overwhelmingly JPEG, so perceptual dedup that cannot decode
  * `FFD8` blobs falls back to byte-level SimHash, which any re-encode
  * defeats.
  *
  * Scope (the strict-parser discipline of the PNG/GIF/WAV walkers):
  * baseline sequential (SOF0) AND Huffman progressive (SOF2) — BOTH
  * progressive dimensions: spectral selection (band scans with
  * EOB-run coding, G.1.2.2) and successive approximation (Ah/Al
  * point-transform scans with DC/AC refinement, G.1.2.3 — what
  * libjpeg's default progression script, i.e. most real web
  * progressive JPEGs, emits) — 8-bit precision, 1 or 3 components,
  * sampling factors 1..4, the full T.81 range (covers 4:4:4, 4:2:2,
  * 4:2:0, 4:1:1), restart
  * intervals in baseline AND progressive scans; SOF1 (extended
  * sequential) accepted at 8-bit precision, where it is
  * semantically identical to baseline. Arithmetic coding, lossless,
  * 12-bit precision, and hierarchical
  * modes fail LOUDLY naming the marker/field; every length field,
  * table reference, Huffman code walk, coefficient position, and
  * per-coefficient successive-approximation level is bounds-checked
  * (a band must be first-scanned once and refined one bit at a time
  * down to level 0 by EOI); trailing bytes after EOI are rejected
  * (the GIF trailer rule).
  *
  * Structure, straight from the spec with no codec library at all:
  *  - FDCT/IDCT: separable double-precision transforms from the
  *    orthonormal cosine kernel K(u,x) = c(u)/2 · cos((2x+1)uπ/16)
  *    (T.81 A.3.3); the cosine table uses StrictMath so the kernel is
  *    bit-identical on every JVM.
  *  - Entropy coding: canonical Huffman code construction (C.2),
  *    decode via the MINCODE/MAXCODE/VALPTR walk (F.2.2.3), DIFF
  *    categories and EXTEND (F.2.2.1), run/size AC symbols with ZRL
  *    and EOB (F.1.2.2), EOB runs in progressive AC scans (G.1.2.2),
  *    0xFF byte stuffing (F.1.2.3).
  *  - Tables: the Annex K.1 quantization and K.3 Huffman tables are
  *    transcribed as the defaults (the encoder parameterizes the
  *    quant tables; `QuantFlat` = all-ones ≈ quality 100, the
  *    round-trip-tolerance fixture table); progressive AC scans ship
  *    a purpose-built canonical table carrying the EOBn symbols
  *    Annex K has no code space for.
  *  - All modes accumulate QUANTIZED coefficients and share one
  *    final dequantize + IDCT, so progressive — spectral-selection
  *    AND successive-approximation — and baseline encodings of the
  *    same image decode PIXEL-IDENTICAL (q409/q410 pin this as
  *    data); every component's plane is kept (refinement scans are
  *    history-dependent), which is also what [[decodeJpegRgb]] turns
  *    into color (q413).
  *
  * JPEG is LOSSY, so unlike the PNG/GIF rows the round-trip gate
  * contract is a TOLERANCE, not bit equality: q404 pins per-image
  * max |decoded − original| under a bound with flat quant; q407 pins
  * that a JPEG re-encode of a PNG-decoded image dHashes within the
  * near-dup Hamming threshold (the q403 codec-invariance pattern with
  * a bound instead of equality).
  *
  * Scale: both directions are pure per-blob functions run inside
  * mapPartitions — map-only, nothing but fixed-size tables in the
  * closure; only extracted features/hashes leave the partition.
  */
object Jpeg {

  // ------------------------------------------------------------ tables

  /** Natural-order index of the k-th zigzag position (T.81 Figure 5),
    * generated from the diagonal walk rather than transcribed: even
    * diagonals run bottom-left→top-right, odd ones the reverse. */
  private[operators] val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    var s = 0
    while (s <= 14) {
      val rs = math.max(0, s - 7) to math.min(7, s)
      val order = if (s % 2 == 1) rs else rs.reverse
      order.foreach { r => out(k) = r * 8 + (s - r); k += 1 }
      s += 1
    }
    out
  }

  /** All-ones quantization (≈ quality 100): round-trip error reduces
    * to DCT coefficient rounding — the q404 tolerance fixture. */
  val QuantFlat: Array[Int] = Array.fill(64)(1)

  /** Annex K.1 Table K.1 — luminance quantization (natural order). */
  val QuantAnnexKLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.1 Table K.2 — chrominance quantization (natural order). */
  val QuantAnnexKChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 Huffman table specifications: (BITS[1..16], HUFFVAL).
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Orthonormal DCT kernel K(u,x) = c(u)/2 · cos((2x+1)uπ/16) with
    * c(0) = 1/√2 (T.81 A.3.3). StrictMath: bit-identical kernel on
    * every JVM, so decoded pixels never vary by platform libm. */
  private val CosK: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) =
          cu / 2.0 * StrictMath.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  // --------------------------------------------------------- transforms

  /** Separable FDCT: F(u,v) = Σ_r K(u,r) Σ_c f(r,c) K(v,c).
    * `block` row-major (r·8+c), level-shifted; output natural order
    * (u·8+v). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val g = new Array[Double](64)
    val out = new Array[Double](64)
    var r = 0
    while (r < 8) { // rows: g(r,v) = Σ_c f(r,c)·K(v,c)
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var c = 0
        while (c < 8) { acc += block(r * 8 + c) * CosK(v * 8 + c); c += 1 }
        g(r * 8 + v) = acc
        v += 1
      }
      r += 1
    }
    var u = 0
    while (u < 8) { // cols: F(u,v) = Σ_r K(u,r)·g(r,v)
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var rr = 0
        while (rr < 8) { acc += CosK(u * 8 + rr) * g(rr * 8 + v); rr += 1 }
        out(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    out
  }

  /** Separable IDCT: f(r,c) = Σ_v K(v,c) Σ_u K(u,r) F(u,v). */
  private def idct(coef: Array[Int]): Array[Double] = {
    val g = new Array[Double](64)
    val out = new Array[Double](64)
    var r = 0
    while (r < 8) { // g(r,v) = Σ_u K(u,r)·F(u,v)
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += CosK(u * 8 + r) * coef(u * 8 + v); u += 1 }
        g(r * 8 + v) = acc
        v += 1
      }
      r += 1
    }
    r = 0
    while (r < 8) { // f(r,c) = Σ_v K(v,c)·g(r,v)
      var c = 0
      while (c < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += CosK(v * 8 + c) * g(r * 8 + v); v += 1 }
        out(r * 8 + c) = acc
        c += 1
      }
      r += 1
    }
    out
  }

  // ------------------------------------------------------ entropy layer

  /** Canonical Huffman ENCODE table (T.81 C.2): code/size per symbol. */
  private final class EncHuff(bits: Array[Int], vals: Array[Int]) {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    private var code = 0
    private var k = 0
    (1 to 16).foreach { l =>
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k)) = code
        sizes(vals(k)) = l
        code += 1
        k += 1
        i += 1
      }
      require(code <= (1 << l), s"over-subscribed Huffman table at length $l")
      code <<= 1
    }
  }

  /** Canonical Huffman DECODE table (T.81 F.2.2.3 walk). */
  private final class DecHuff(bits: Array[Int], val vals: Array[Int]) {
    require(bits.length == 16, s"DHT BITS has ${bits.length} lengths")
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    private var code = 0
    private var k = 0
    (1 to 16).foreach { l =>
      require(bits(l - 1) >= 0, s"negative DHT count at length $l")
      if (bits(l - 1) > 0) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = code - 1
        require(code <= (1 << l),
          s"over-subscribed Huffman table at length $l")
      }
      code <<= 1
    }
    require(k == vals.length,
      s"DHT declares $k codes but carries ${vals.length} values")
  }

  private val EncDcLuma = new EncHuff(DcLumaBits, DcLumaVals)
  private val EncAcLuma = new EncHuff(AcLumaBits, AcLumaVals)
  private val EncDcChroma = new EncHuff(DcChromaBits, DcChromaVals)
  private val EncAcChroma = new EncHuff(AcChromaBits, AcChromaVals)

  /** Progressive AC scans code EOB RUNS (G.1.2.2) — run/size symbols
    * with size 0 and run 1..14, which the SEQUENTIAL Annex K tables
    * deliberately lack (and cannot be extended to carry: Annex K's AC
    * table fills 65535 of the 65536 length-16 code slots). The
    * progressive encoder therefore ships its own canonical table: the
    * hottest symbols (EOB, the two shortest coefficients, ZRL) at 4
    * bits, every other run/size symbol plus EOBn 0x10..0x70 at 9 —
    * Kraft-valid by the canonical builder's own check. Decoders read
    * whatever DHT the stream carries, so interop is unaffected;
    * compression of the fixed table is secondary to correctness
    * here (real encoders optimize per image). */
  private val (acProgBits: Array[Int], acProgVals: Array[Int]) = {
    val short = Array(0x00, 0x01, 0x02, 0x11, 0xf0)
    val eobn = (1 to 7).map(_ << 4)
    val runSize = for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s
    val rest = (runSize ++ eobn).filterNot(short.contains).sorted
    val bits = new Array[Int](16)
    bits(3) = short.length // code length 4
    bits(8) = rest.length  // code length 9
    (bits, (short ++ rest).toArray)
  }
  private val EncAcProg = new EncHuff(acProgBits, acProgVals)

  /** MSB-first bit writer with 0xFF→0xFF00 stuffing (F.1.2.3). */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (B.1.1.5). */
    def flushWithOnes(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** MSB-first bit reader over the entropy segment: unstuffs 0xFF00,
    * fails loudly on truncation or a marker mid-code. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def nextBit(): Int = {
      if (n == 0) {
        require(pos < bytes.length,
          "truncated scan: entropy stream ends mid-code")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated scan after 0xFF")
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) pos += 1
          else throw new IllegalArgumentException(
            f"marker 0xff$b2%02x inside entropy stream (truncated scan)")
        }
        acc = b
        n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Discard pad bits to the next byte boundary (end of restart
      * interval / end of scan). */
    def align(): Unit = n = 0
    def expectRestart(idx: Int): Unit = {
      align()
      require(pos + 2 <= bytes.length, "truncated scan at restart point")
      val m = bytes(pos + 1) & 0xff
      require((bytes(pos) & 0xff) == 0xff && m == 0xd0 + (idx % 8),
        f"expected RST${idx % 8} at $pos, found 0x${bytes(pos) & 0xff}%02x$m%02x")
      pos += 2
    }
  }

  /** EXTEND (F.2.2.1): map a `s`-bit magnitude field to its signed
    * coefficient value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Magnitude category: smallest s with |v| < 2^s. */
  private def category(v: Int): Int =
    32 - java.lang.Integer.numberOfLeadingZeros(math.abs(v))

  private def decodeSym(r: BitReader, t: DecHuff): Int = {
    var l = 1
    var code = r.nextBit()
    while (code > t.maxcode(l)) {
      require(l < 16, "corrupt Huffman code (walks past length 16)")
      l += 1
      code = (code << 1) | r.nextBit()
    }
    t.vals(t.valptr(l) + code - t.mincode(l))
  }

  // ------------------------------------------------------------ encoder

  private case class EncComp(plane: Array[Int], w: Int, h: Int,
      hSamp: Int, vSamp: Int, quantId: Int, huffId: Int)

  /** FDCT + quantize one block of a component plane (edge-replicated
    * pad pixels); returns the 64 quantized coefficients in ZIGZAG
    * order. Shared by the baseline block coder and both progressive
    * scan passes, so the coefficient integers — and hence the decoded
    * pixels — are identical across modes by construction. */
  private def quantizeBlock(c: EncComp, bx: Int, by: Int,
      quant: Array[Int]): Array[Int] = {
    val px = new Array[Double](64)
    var r = 0
    while (r < 8) {
      val sy = math.min(by * 8 + r, c.h - 1)
      var cc = 0
      while (cc < 8) {
        val sx = math.min(bx * 8 + cc, c.w - 1)
        px(r * 8 + cc) = c.plane(sy * c.w + sx) - 128.0
        cc += 1
      }
      r += 1
    }
    val f = fdct(px)
    val q = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val nat = Zigzag(k)
      q(k) = Math.round(f(nat) / quant(nat)).toInt
      k += 1
    }
    q
  }

  /** Encode one level-shifted, FDCT'd, quantized block; returns its DC
    * (the next predictor). */
  private def encodeBlock(bw: BitWriter, c: EncComp, bx: Int, by: Int,
      quant: Array[Int], dcH: EncHuff, acH: EncHuff, pred: Int): Int = {
    val q = quantizeBlock(c, bx, by, quant)
    val diff = q(0) - pred
    val s = category(diff)
    require(s <= 11, s"DC category $s out of baseline range") // 8-bit input bound
    bw.put(dcH.codes(s), dcH.sizes(s))
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = q(k)
      if (v == 0) run += 1
      else {
        while (run >= 16) { bw.put(acH.codes(0xf0), acH.sizes(0xf0)); run -= 16 }
        val sz = category(v)
        require(sz <= 10, s"AC category $sz out of baseline range")
        val sym = (run << 4) | sz
        bw.put(acH.codes(sym), acH.sizes(sym))
        bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(acH.codes(0x00), acH.sizes(0x00)) // EOB
    q(0)
  }

  private def encodeBaseline(width: Int, height: Int, comps: Seq[EncComp],
      quants: Seq[Array[Int]], restartInterval: Int,
      progressive: Boolean = false,
      successive: Boolean = false,
      separateDcScans: Boolean = false,
      exifOrientation: Int = 1): Array[Byte] = {
    require(width >= 1 && width <= 0xffff, s"bad width $width")
    require(height >= 1 && height <= 0xffff, s"bad height $height")
    require(exifOrientation >= 1 && exifOrientation <= 8,
      s"Exif orientation $exifOrientation out of [1, 8]")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"bad restart interval $restartInterval")
    require(!successive || progressive,
      "successive approximation is a progressive-mode script")
    require(!separateDcScans || progressive,
      "separate DC scans are a progressive-mode script")
    quants.foreach { q =>
      require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
        "quant table must be 64 entries in [1, 255]")
    }
    require(comps.size == 1 ||
      comps.map(c => c.hSamp * c.vSamp).sum <= 10,
      "MCU exceeds the T.81 bound of 10 blocks (B.2.3)")
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    comps.foreach { c =>
      require(c.hSamp >= 1 && c.hSamp <= 4 && c.vSamp >= 1 && c.vSamp <= 4,
        s"sampling factors out of [1, 4]: ${c.hSamp}x${c.vSamp}")
      val wc = (width * c.hSamp + hMax - 1) / hMax
      val hc = (height * c.vSamp + vMax - 1) / vMax
      require(c.w == wc && c.h == hc,
        s"component plane ${c.w}x${c.h}, geometry needs ${wc}x$hc")
      require(c.plane.length == c.w * c.h, "plane length mismatch")
      require(c.plane.forall(v => v >= 0 && v <= 255),
        "sample out of [0, 255]")
    }
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF 1.1
    u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    if (exifOrientation != 1) {
      // APP1/Exif with ONE IFD0 entry (Orientation, SHORT) — the
      // minimal CP-3451 block, big-endian TIFF; omitted entirely for
      // the upright default so untagged streams stay byte-identical
      marker(0xe1)
      u16(34) // 2 len + 6 "Exif\0\0" + 8 TIFF header + 2 + 12 + 4
      out.write("Exif".getBytes("US-ASCII")); u8(0); u8(0)
      u8(0x4d); u8(0x4d); u16(42); u16(0); u16(8) // "MM", 42, IFD0@8
      u16(1) // one entry
      u16(0x0112); u16(3); u16(0); u16(1) // Orientation, SHORT, count 1
      u16(exifOrientation); u16(0) // value left-justified
      u16(0); u16(0) // no next IFD
    }
    quants.zipWithIndex.foreach { case (q, id) => // DQT, zigzag payload
      marker(0xdb); u16(67); u8(id)
      (0 until 64).foreach(k => u8(q(Zigzag(k))))
    }
    marker(if (progressive) 0xc2 else 0xc0) // SOF2 / SOF0
    u16(8 + 3 * comps.size); u8(8); u16(height); u16(width)
    u8(comps.size)
    comps.zipWithIndex.foreach { case (c, i) =>
      u8(i + 1); u8((c.hSamp << 4) | c.vSamp); u8(c.quantId)
    }
    val usedHuff = comps.map(_.huffId).distinct.sorted
    usedHuff.foreach { id =>
      val (dcB, dcV) =
        if (id == 0) (DcLumaBits, DcLumaVals)
        else (DcChromaBits, DcChromaVals)
      // progressive AC scans need the EOB-run symbols — ship the
      // progressive table (the stream carries its own DHT either way)
      val (acB, acV) =
        if (progressive) (acProgBits, acProgVals)
        else if (id == 0) (AcLumaBits, AcLumaVals)
        else (AcChromaBits, AcChromaVals)
      marker(0xc4); u16(2 + 1 + 16 + dcV.length)
      u8(id); dcB.foreach(u8); dcV.foreach(u8)
      marker(0xc4); u16(2 + 1 + 16 + acV.length)
      u8(0x10 | id); acB.foreach(u8); acV.foreach(u8)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    if (!progressive) {
      marker(0xda) // SOS: the one full baseline scan
      u16(6 + 2 * comps.size); u8(comps.size)
      comps.zipWithIndex.foreach { case (c, i) =>
        u8(i + 1); u8((c.huffId << 4) | c.huffId)
      }
      u8(0); u8(63); u8(0) // Ss, Se, Ah/Al
      val bw = new BitWriter(out)
      val preds = Array.fill(comps.size)(0)
      var mcu = 0
      var rst = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            bw.flushWithOnes()
            marker(0xd0 + (rst % 8))
            rst += 1
            java.util.Arrays.fill(preds, 0)
          }
          comps.zipWithIndex.foreach { case (c, ci) =>
            val (dcH, acH) =
              if (c.huffId == 0) (EncDcLuma, EncAcLuma)
              else (EncDcChroma, EncAcChroma)
            var v = 0
            while (v < c.vSamp) {
              var h = 0
              while (h < c.hSamp) {
                preds(ci) = encodeBlock(bw, c, mx * c.hSamp + h,
                  my * c.vSamp + v, quants(c.quantId), dcH, acH, preds(ci))
                h += 1
              }
              v += 1
            }
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
      bw.flushWithOnes()
    } else {
      // precompute each component's quantized blocks ONCE on the
      // interleaved grid (a superset of the AC scans' non-interleaved
      // grid), so no scan pays the FDCT twice
      val blocksW = comps.map(c => mcusX * c.hSamp)
      val coefs: IndexedSeq[Array[Array[Int]]] =
        comps.zipWithIndex.map { case (c, ci) =>
          val bwc = blocksW(ci)
          Array.tabulate(mcusY * c.vSamp * bwc) { i =>
            quantizeBlock(c, i % bwc, i / bwc, quants(c.quantId))
          }
        }.toIndexedSeq
      // point-transform schedule: plain spectral selection sends full
      // precision at once (Al=0); successive approximation sends the
      // first pass at Al=1 plus one-bit refinement scans (Ah=1, Al=0)
      // — both decode to the SAME coefficients exactly, because the
      // split is two's-complement bit slicing for DC and
      // magnitude-bit slicing with sign for AC
      val firstAl = if (successive) 1 else 0

      def sosHeader(scanComps: Seq[Int], ss: Int, se: Int, ah: Int,
          al: Int): Unit = {
        marker(0xda)
        u16(6 + 2 * scanComps.size); u8(scanComps.size)
        scanComps.foreach { ci =>
          u8(ci + 1); u8((comps(ci).huffId << 4) | comps(ci).huffId)
        }
        u8(ss); u8(se); u8((ah << 4) | al)
      }

      // one block's DC emission, shared by the interleaved and the
      // Ns=1 DC scans: first pass diff-codes the point-transformed DC
      // (arithmetic shift, G.1.2.1), refinement sends one raw bit;
      // returns the new predictor
      def emitDc(bw: BitWriter, dcH: EncHuff, dc: Int, pred: Int,
          ah: Int, al: Int): Int =
        if (ah == 0) {
          val t = dc >> al
          val diff = t - pred
          val s = category(diff)
          require(s <= 11, s"DC category $s out of range")
          bw.put(dcH.codes(s), dcH.sizes(s))
          if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          t
        } else {
          bw.put((dc >> al) & 1, 1)
          pred
        }

      // ---- DC scan, all components, interleaved MCU order
      def dcScan(ah: Int, al: Int): Unit = {
        sosHeader(comps.indices, 0, 0, ah, al)
        val bw = new BitWriter(out)
        val preds = Array.fill(comps.size)(0)
        var mcu = 0
        var rst = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (restartInterval > 0 && mcu > 0 &&
                mcu % restartInterval == 0) {
              bw.flushWithOnes()
              marker(0xd0 + (rst % 8))
              rst += 1
              java.util.Arrays.fill(preds, 0)
            }
            comps.zipWithIndex.foreach { case (c, ci) =>
              val dcH = if (c.huffId == 0) EncDcLuma else EncDcChroma
              var v = 0
              while (v < c.vSamp) {
                var h = 0
                while (h < c.hSamp) {
                  val dc = coefs(ci)((my * c.vSamp + v) * blocksW(ci) +
                    mx * c.hSamp + h)(0)
                  preds(ci) = emitDc(bw, dcH, dc, preds(ci), ah, al)
                  h += 1
                }
                v += 1
              }
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
        bw.flushWithOnes()
      }

      // ---- AC band scan (1..63) of one component over its
      // NON-interleaved grid — FIRST pass: run/size symbols on the
      // point-transformed magnitudes sign(q)·(|q| >> al), EOB-run
      // coded (G.1.2.2)
      def acFirstScan(ci: Int, al: Int): Unit = {
        val c = comps(ci)
        sosHeader(Seq(ci), 1, 63, 0, al)
        val acH = EncAcProg
        val bw2 = new BitWriter(out)
        val niW = (c.w + 7) / 8
        val niH = (c.h + 7) / 8
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          val rb = 31 - java.lang.Integer.numberOfLeadingZeros(eobrun)
          bw2.put(acH.codes(rb << 4), acH.sizes(rb << 4))
          if (rb > 0) bw2.put(eobrun - (1 << rb), rb)
          eobrun = 0
        }
        var blk = 0
        var rst = 0
        var by = 0
        while (by < niH) {
          var bx = 0
          while (bx < niW) {
            if (restartInterval > 0 && blk > 0 &&
                blk % restartInterval == 0) {
              flushEob() // an EOB run cannot cross a restart point
              bw2.flushWithOnes()
              marker(0xd0 + (rst % 8))
              rst += 1
            }
            val q = coefs(ci)(by * blocksW(ci) + bx)
            def tv(k: Int): Int = {
              val a = math.abs(q(k)) >> al
              if (q(k) < 0) -a else a
            }
            var last = 0 // last nonzero point-transformed index 1..63
            var k = 63
            while (k >= 1 && last == 0) { if (tv(k) != 0) last = k; k -= 1 }
            if (last == 0) {
              eobrun += 1
              if (eobrun == 255) flushEob() // extended-table EOBn cap
            } else {
              flushEob()
              var run = 0
              k = 1
              while (k <= last) {
                val v = tv(k)
                if (v == 0) run += 1
                else {
                  while (run >= 16) {
                    bw2.put(acH.codes(0xf0), acH.sizes(0xf0)); run -= 16
                  }
                  val sz = category(v)
                  require(sz <= 10, s"AC category $sz out of range")
                  val sym = (run << 4) | sz
                  bw2.put(acH.codes(sym), acH.sizes(sym))
                  bw2.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
                  run = 0
                }
                k += 1
              }
              if (last < 63) eobrun = 1 // band ends early: starts a run
            }
            blk += 1
            bx += 1
          }
          by += 1
        }
        flushEob()
        bw2.flushWithOnes()
      }

      // ---- AC REFINEMENT scan (Ah = al+1 → Al = al), T.81 G.1.2.3 /
      // figure G.7: history coefficients (|q| >> al > 1) each send
      // one correction bit, newly-nonzero ones (|q| >> al == 1) send
      // a size-1 run symbol plus sign, and all-history blocks fold
      // into EOB runs that carry their buffered correction bits.
      // Correction bits buffer until the next emitted symbol (or the
      // EOB run), which is exactly where the decoder's walk consumes
      // them; ZRL is emitted only while another new coefficient
      // follows (k <= eobIdx) — past the last new coefficient the
      // zeros fold into the EOB run (the figure G.7 annotation)
      def acRefineScan(ci: Int, al: Int): Unit = {
        val c = comps(ci)
        sosHeader(Seq(ci), 1, 63, al + 1, al)
        val acH = EncAcProg
        val bw2 = new BitWriter(out)
        val niW = (c.w + 7) / 8
        val niH = (c.h + 7) / 8
        var eobrun = 0
        val ebuf = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEob(): Unit = if (eobrun > 0) {
          val rb = 31 - java.lang.Integer.numberOfLeadingZeros(eobrun)
          bw2.put(acH.codes(rb << 4), acH.sizes(rb << 4))
          if (rb > 0) bw2.put(eobrun - (1 << rb), rb)
          eobrun = 0
          ebuf.foreach(b => bw2.put(b, 1))
          ebuf.clear()
        }
        var blk = 0
        var rst = 0
        var by = 0
        while (by < niH) {
          var bx = 0
          while (bx < niW) {
            if (restartInterval > 0 && blk > 0 &&
                blk % restartInterval == 0) {
              flushEob()
              bw2.flushWithOnes()
              marker(0xd0 + (rst % 8))
              rst += 1
            }
            val q = coefs(ci)(by * blocksW(ci) + bx)
            val absv = new Array[Int](64)
            var eobIdx = 0 // last newly-nonzero index in 1..63
            var k = 1
            while (k <= 63) {
              absv(k) = math.abs(q(k)) >> al
              if (absv(k) == 1) eobIdx = k
              k += 1
            }
            var run = 0
            val br = scala.collection.mutable.ArrayBuffer.empty[Int]
            k = 1
            while (k <= 63) {
              val t = absv(k)
              if (t == 0) run += 1
              else {
                while (run > 15 && k <= eobIdx) {
                  flushEob()
                  bw2.put(acH.codes(0xf0), acH.sizes(0xf0))
                  run -= 16
                  br.foreach(b => bw2.put(b, 1)); br.clear()
                }
                if (t > 1) br += (t & 1) // history: correction bit
                else {
                  flushEob()
                  val sym = (run << 4) | 1
                  bw2.put(acH.codes(sym), acH.sizes(sym))
                  bw2.put(if (q(k) < 0) 0 else 1, 1) // sign bit
                  br.foreach(b => bw2.put(b, 1)); br.clear()
                  run = 0
                }
              }
              k += 1
            }
            if (run > 0 || br.nonEmpty) {
              eobrun += 1
              ebuf ++= br
              if (eobrun == 255) flushEob()
            }
            blk += 1
            bx += 1
          }
          by += 1
        }
        flushEob()
        bw2.flushWithOnes()
      }

      // ---- single-component DC scan (Ns=1, T.81-legal): per-scan DC
      // prediction over the component's NON-interleaved grid — the
      // decoder-coverage twin of the interleaved dcScan, emitted by
      // the separateDcScans script so the Ns=1 DC decode path is
      // exercised by our own round-trip
      def dcScanSingle(ci: Int, ah: Int, al: Int): Unit = {
        val c = comps(ci)
        sosHeader(Seq(ci), 0, 0, ah, al)
        val bw = new BitWriter(out)
        val dcH = if (c.huffId == 0) EncDcLuma else EncDcChroma
        val niW = (c.w + 7) / 8
        val niH = (c.h + 7) / 8
        var pred = 0
        var blk = 0
        var rst = 0
        var by = 0
        while (by < niH) {
          var bx = 0
          while (bx < niW) {
            if (restartInterval > 0 && blk > 0 &&
                blk % restartInterval == 0) {
              bw.flushWithOnes()
              marker(0xd0 + (rst % 8))
              rst += 1
              pred = 0
            }
            val dc = coefs(ci)(by * blocksW(ci) + bx)(0)
            pred = emitDc(bw, dcH, dc, pred, ah, al)
            blk += 1
            bx += 1
          }
          by += 1
        }
        bw.flushWithOnes()
      }

      if (separateDcScans) comps.indices.foreach(dcScanSingle(_, 0, firstAl))
      else dcScan(0, firstAl)
      comps.indices.foreach(ci => acFirstScan(ci, firstAl))
      if (successive) {
        if (separateDcScans) comps.indices.foreach(dcScanSingle(_, 1, 0))
        else dcScan(1, 0)
        comps.indices.foreach(ci => acRefineScan(ci, 0))
      }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a row-major grayscale plane as a single-component JPEG —
    * baseline SOF0; progressive SOF2 when `progressive` (one DC scan
    * + one spectral-selection AC scan, EOB-run coded); and the
    * SUCCESSIVE-APPROXIMATION script when additionally
    * `successiveApprox` (first passes at Al=1, then DC and AC
    * refinement scans at Ah=1 — the libjpeg-style real-web
    * progressive shape). `quant` in natural order; [[QuantFlat]] ≈
    * quality 100. All modes quantize identical coefficients, so they
    * decode pixel-identical (the q409/q410 contracts). */
  def encodeJpegGray(lumas: Seq[Int], width: Int,
      quant: Array[Int] = QuantFlat, restartInterval: Int = 0,
      progressive: Boolean = false,
      successiveApprox: Boolean = false,
      exifOrientation: Int = 1): Array[Byte] = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(lumas.nonEmpty && lumas.length % width == 0,
      s"${lumas.length} pixels do not fill rows of $width")
    val height = lumas.length / width
    encodeBaseline(width, height,
      Seq(EncComp(lumas.toArray, width, height, 1, 1, 0, 0)),
      Seq(quant), restartInterval, progressive, successiveApprox,
      exifOrientation = exifOrientation)
  }

  /** Encode YCbCr planes as a 3-component baseline JPEG — 4:4:4 when
    * `subsample420` is false (chroma planes full size), 4:2:0 when
    * true (chroma planes ceil(w/2) × ceil(h/2), caller-subsampled).
    * Exercises the interleaved multi-component MCU path the grayscale
    * entry cannot. */
  def encodeJpegYcc(y: Seq[Int], cb: Seq[Int], cr: Seq[Int], width: Int,
      subsample420: Boolean, quantY: Array[Int] = QuantFlat,
      quantC: Array[Int] = QuantFlat, restartInterval: Int = 0,
      progressive: Boolean = false,
      successiveApprox: Boolean = false,
      separateDcScans: Boolean = false,
      exifOrientation: Int = 1): Array[Byte] =
    encodeJpegYccScheme(y, cb, cr, width,
      if (subsample420) "420" else "444", quantY, quantC,
      restartInterval, progressive, successiveApprox, separateDcScans,
      exifOrientation)

  /** Chroma-plane geometry of a named subsampling scheme: luma
    * sampling factors (hs, vs) and the chroma plane dims they imply
    * for a width×height image. */
  def chromaDims(scheme: String, width: Int, height: Int)
      : (Int, Int, Int, Int) = scheme match {
    case "444" => (width, height, 1, 1)
    case "422" => ((width + 1) / 2, height, 2, 1)
    case "420" => ((width + 1) / 2, (height + 1) / 2, 2, 2)
    case "411" => ((width + 3) / 4, height, 4, 1)
    case other => throw new IllegalArgumentException(
      s"unknown subsampling scheme '$other' (444/422/420/411)")
  }

  /** [[encodeJpegYcc]] generalized over the named subsampling schemes
    * — 4:2:2 (2×1 luma factors) and 4:1:1 (4×1, the DV-camera shape
    * that exercises the T.81 factor range beyond 2) beside the
    * 4:4:4/4:2:0 pair; all decode pixel-identical across the
    * baseline/progressive/SA scripts like every other geometry
    * (spec-pinned). */
  def encodeJpegYccScheme(y: Seq[Int], cb: Seq[Int], cr: Seq[Int],
      width: Int, scheme: String, quantY: Array[Int] = QuantFlat,
      quantC: Array[Int] = QuantFlat, restartInterval: Int = 0,
      progressive: Boolean = false,
      successiveApprox: Boolean = false,
      separateDcScans: Boolean = false,
      exifOrientation: Int = 1): Array[Byte] = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(y.nonEmpty && y.length % width == 0,
      s"${y.length} luma pixels do not fill rows of $width")
    val height = y.length / width
    val (cw, ch, hs, vs) = chromaDims(scheme, width, height)
    require(cb.length == cw * ch && cr.length == cw * ch,
      s"chroma planes must be ${cw}x$ch for scheme $scheme")
    encodeBaseline(width, height, Seq(
      EncComp(y.toArray, width, height, hs, vs, 0, 0),
      EncComp(cb.toArray, cw, ch, 1, 1, 1, 1),
      EncComp(cr.toArray, cw, ch, 1, 1, 1, 1)),
      Seq(quantY, quantC), restartInterval, progressive, successiveApprox,
      separateDcScans, exifOrientation)
  }

  // ------------------------------------------------------------ decoder

  /** `orientation` is the Exif tag the decode APPLIED (1 when the
    * stream carries none): `lumas`/geometry are always UPRIGHT. */
  case class JpegImage(width: Int, height: Int, nComponents: Int,
      lumas: Array[Int], orientation: Int = 1)

  /** Exif orientation made upright (TIFF 6.0 "Orientation" / JEITA
    * CP-3451 Exif 2.3 §4.6.4): the stored plane re-indexes through
    * one of the 8 flip/rotate cases so row 0 / column 0 end up at the
    * visual top / left. Orientations 5–8 swap the dimensions.
    * @return (upright plane, upright width, upright height) */
  def applyExifOrientation(plane: Array[Int], width: Int, height: Int,
      orientation: Int): (Array[Int], Int, Int) = {
    require(orientation >= 1 && orientation <= 8,
      s"Exif orientation $orientation out of [1, 8]")
    require(plane.length == width * height,
      s"plane length ${plane.length} is not ${width}x$height")
    if (orientation == 1) return (plane, width, height)
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (height, width) else (width, height)
    val out = new Array[Int](plane.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        // stored coordinates of upright pixel (x, y), per the TIFF
        // row0/col0 placement table
        val (sx, sy) = orientation match {
          case 2 => (width - 1 - x, y) // row0 top, col0 right
          case 3 => (width - 1 - x, height - 1 - y) // 180
          case 4 => (x, height - 1 - y) // row0 bottom, col0 left
          case 5 => (y, x) // transpose
          case 6 => (y, height - 1 - x) // rotate 90 CW to display
          case 7 => (width - 1 - y, height - 1 - x) // transverse
          case _ => (width - 1 - y, x) // 8: rotate 90 CCW to display
        }
        out(y * ow + x) = plane(sy * width + sx)
        x += 1
      }
      y += 1
    }
    (out, ow, oh)
  }

  /** The orientation whose [[applyExifOrientation]] UNDOES `o`'s —
    * 6 and 8 (the quarter turns) swap; every other case is its own
    * inverse. Lets a writer derive the stored plane of an upright
    * image it wants tagged with `o`. */
  def inverseExifOrientation(o: Int): Int = {
    require(o >= 1 && o <= 8, s"Exif orientation $o out of [1, 8]")
    o match { case 6 => 8; case 8 => 6; case other => other }
  }

  /** Parse the orientation out of one APP1 payload
    * (`bytes[from, end)`). Non-Exif APP1 segments (XMP etc. — no
    * "Exif\0\0" identifier) return None untouched; a segment that
    * CLAIMS to be Exif must carry a well-formed TIFF header and IFD0
    * (strict fail-loudly convention: a truncated header, bad
    * byte-order mark, bad magic, overrunning IFD, or an Orientation
    * entry with the wrong type/count/value is an error by name, not
    * a silent upright default). An Exif block whose IFD0 has no
    * Orientation entry yields Some(1). Only IFD0 is searched — that
    * is where CP-3451 puts the tag. */
  private def parseExifOrientation(bytes: Array[Byte], from: Int,
      end: Int): Option[Int] = {
    if (end - from < 6) return None
    val isExif = bytes(from) == 'E' && bytes(from + 1) == 'x' &&
      bytes(from + 2) == 'i' && bytes(from + 3) == 'f' &&
      bytes(from + 4) == 0 && bytes(from + 5) == 0
    if (!isExif) return None
    val tiff = from + 6 // TIFF header origin: all offsets are relative to it
    require(end - tiff >= 8, "Exif APP1: TIFF header truncated")
    def u8(o: Int): Int = bytes(o) & 0xff
    val little = (u8(tiff), u8(tiff + 1)) match {
      case (0x49, 0x49) => true // "II"
      case (0x4d, 0x4d) => false // "MM"
      case (a, b) => throw new IllegalArgumentException(
        f"Exif APP1: bad TIFF byte-order mark 0x$a%02x$b%02x " +
          "(need II or MM)")
    }
    def u16(o: Int): Int = {
      require(o + 2 <= end, "Exif APP1: read past segment end")
      if (little) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    }
    def u32(o: Int): Long = {
      require(o + 4 <= end, "Exif APP1: read past segment end")
      if (little)
        u8(o) | (u8(o + 1).toLong << 8) | (u8(o + 2).toLong << 16) |
          (u8(o + 3).toLong << 24)
      else
        (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) |
          (u8(o + 2).toLong << 8) | u8(o + 3)
    }
    require(u16(tiff + 2) == 42,
      s"Exif APP1: bad TIFF magic ${u16(tiff + 2)} (need 42)")
    val ifd0 = u32(tiff + 4)
    require(ifd0 >= 8 && tiff + ifd0 + 2 <= end,
      s"Exif APP1: IFD0 offset $ifd0 outside the segment")
    val ifdPos = tiff + ifd0.toInt
    val nEntries = u16(ifdPos)
    require(ifdPos + 2 + 12 * nEntries <= end,
      s"Exif APP1: IFD0 with $nEntries entries overruns the segment")
    var i = 0
    while (i < nEntries) {
      val e = ifdPos + 2 + 12 * i
      if (u16(e) == 0x0112) { // Orientation
        require(u16(e + 2) == 3 && u32(e + 4) == 1L,
          s"Exif APP1: Orientation entry must be one SHORT (type " +
            s"${u16(e + 2)}, count ${u32(e + 4)})")
        // SHORT count 1: value left-justified in the 4-byte field
        val v = u16(e + 8)
        require(v >= 1 && v <= 8,
          s"Exif APP1: Orientation value $v out of [1, 8]")
        return Some(v)
      }
      i += 1
    }
    Some(1)
  }

  private case class FrameComp(id: Int, hSamp: Int, vSamp: Int, quantId: Int)

  /** Mutable per-frame decode state: EVERY component's QUANTIZED
    * coefficient plane accumulated across scans — one scan fills them
    * for baseline, several for progressive. All components are stored
    * (not just luma) because successive-approximation REFINEMENT
    * scans are history-dependent: whether the next stream bit is a
    * correction bit depends on whether the coefficient is already
    * nonzero, so chroma cannot be decoded-and-discarded — and the
    * stored chroma is what [[decodeJpegRgb]] turns into color.
    *
    * `apLevel(ci)(k)` tracks the successive-approximation state of
    * coefficient band k: -1 = never scanned; otherwise the current
    * point-transform level Al. A first scan (Ah=0) requires -1 and
    * sets Al; a refinement scan requires Ah == current level and
    * Al == Ah-1 (one bit per scan, T.81 G.1.1.1.1); EOI requires 0
    * everywhere (fully refined). Baseline is the degenerate Al=0
    * single-step case. */
  private final class FrameState(val width: Int, val height: Int,
      val comps: Seq[FrameComp], val progressive: Boolean) {
    val hMax: Int = comps.map(_.hSamp).max
    val vMax: Int = comps.map(_.vSamp).max
    val mcusX: Int = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY: Int = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component block grids, INTERLEAVED (MCU-padded) geometry
    val bwC: Array[Int] = comps.map(c => mcusX * c.hSamp).toArray
    val bhC: Array[Int] = comps.map(c => mcusY * c.vSamp).toArray
    val coefs: Array[Array[Int]] =
      comps.indices.map(ci => new Array[Int](bwC(ci) * bhC(ci) * 64))
        .toArray
    val apLevel: Array[Array[Int]] =
      Array.fill(comps.size)(Array.fill(64)(-1))
    var sawScan: Boolean = false
    /** Dimensions of component ci's sample plane (A.1.1). */
    def compDims(ci: Int): (Int, Int) = {
      val c = comps(ci)
      ((width * c.hSamp + hMax - 1) / hMax,
        (height * c.vSamp + vMax - 1) / vMax)
    }
    /** Non-interleaved block grid of component ci (T.81 A.2.2: a
      * single-component scan iterates ceil(wc/8) × ceil(hc/8), which
      * for subsampled frames is SMALLER than the MCU-padded grid). */
    def niGrid(ci: Int): (Int, Int) = {
      val (wc, hc) = compDims(ci)
      ((wc + 7) / 8, (hc + 7) / 8)
    }
    /** coef offset of component ci's block (bx, by). */
    def blockOffset(ci: Int, bx: Int, by: Int): Int =
      (by * bwC(ci) + bx) * 64
    /** Enforce the approximation-sequence rules for one scan. */
    def enterScan(ci: Int, ss: Int, se: Int, ah: Int, al: Int): Unit = {
      if (ss > 0) require(apLevel(ci)(0) >= 0,
        s"AC scan before the DC scan of component $ci (G.1.1.1.1)")
      var k = ss
      while (k <= se) {
        if (ah == 0)
          require(apLevel(ci)(k) == -1,
            s"scan re-covers coefficient band $k of component $ci")
        else
          require(apLevel(ci)(k) == ah,
            s"refinement scan at Ah=$ah over band $k of component " +
              s"$ci, which sits at level ${apLevel(ci)(k)}")
        apLevel(ci)(k) = al
        k += 1
      }
    }
  }

  /** Strict decode of baseline (SOF0) AND progressive (SOF2 —
    * spectral selection AND successive approximation) JPEG. Returns
    * geometry plus the LUMA plane (the Y component for 3-component
    * images — the grayscale projection every perceptual-hash consumer
    * wants; [[decodeJpegRgb]] is the color sibling over the same
    * frame walk). All modes accumulate quantized coefficients and
    * share one final dequantize + IDCT, so progressive encodes of the
    * same coefficients decode PIXEL-IDENTICAL to their baseline
    * sibling (pinned as data by q409 for spectral selection and q410
    * for successive approximation). */
  def decodeJpeg(bytes: Array[Byte]): JpegImage = {
    val (st, quants, orient) = decodeFrame(bytes)
    // orientation applies AFTER reconstruction, BEFORE any consumer
    // (feature extraction, dHash): a metadata-rotated copy of a crawl
    // photo must produce the same upright pixels as its original
    val (lum, w, h) = applyExifOrientation(
      componentPlane(st, quants, 0), st.width, st.height, orient)
    JpegImage(w, h, st.comps.size, lum, orient)
  }

  /** `orientation` is the Exif tag the decode APPLIED (1 when the
    * stream carries none): planes/geometry are always UPRIGHT. */
  case class JpegRgb(width: Int, height: Int, nComponents: Int,
      r: Array[Int], g: Array[Int], b: Array[Int],
      orientation: Int = 1)

  /** Color decode: every component's coefficient plane is
    * reconstructed (the successive-approximation storage already
    * keeps them all), chroma planes are upsampled by replication
    * (nearest-neighbor — the resizePixels convention; deterministic,
    * no filter kernel to disagree about), and YCbCr converts to RGB
    * with the JFIF matrix R = Y + 1.402·Cr', G = Y − 0.344136·Cb' −
    * 0.714136·Cr', B = Y + 1.772·Cb' (Cb' = Cb−128), rounded then
    * clamped to [0, 255]. Single-component frames return the gray
    * plane on all three channels. */
  def decodeJpegRgb(bytes: Array[Byte]): JpegRgb = {
    val (st, quants, orient) = decodeFrame(bytes)
    val y = componentPlane(st, quants, 0)
    if (st.comps.size == 1) {
      val (up, w, h) = applyExifOrientation(y, st.width, st.height, orient)
      return JpegRgb(w, h, 1, up, up.clone(), up.clone(), orient)
    }
    val cb = componentPlane(st, quants, 1)
    val cr = componentPlane(st, quants, 2)
    val (cbW, _) = st.compDims(1)
    val (crW, _) = st.compDims(2)
    val n = st.width * st.height
    val ro = new Array[Int](n)
    val go = new Array[Int](n)
    val bo = new Array[Int](n)
    def clamp(v: Long): Int = math.max(0, math.min(255, v.toInt))
    var yy = 0
    while (yy < st.height) {
      val cbRow = (yy * st.comps(1).vSamp / st.vMax) * cbW
      val crRow = (yy * st.comps(2).vSamp / st.vMax) * crW
      var xx = 0
      while (xx < st.width) {
        val i = yy * st.width + xx
        val lum = y(i)
        val cbv = cb(cbRow + xx * st.comps(1).hSamp / st.hMax) - 128
        val crv = cr(crRow + xx * st.comps(2).hSamp / st.hMax) - 128
        ro(i) = clamp(Math.round(lum + 1.402 * crv))
        go(i) = clamp(Math.round(lum - 0.344136 * cbv - 0.714136 * crv))
        bo(i) = clamp(Math.round(lum + 1.772 * cbv))
        xx += 1
      }
      yy += 1
    }
    val (ur, w, h) = applyExifOrientation(ro, st.width, st.height, orient)
    val (ug, _, _) = applyExifOrientation(go, st.width, st.height, orient)
    val (ub, _, _) = applyExifOrientation(bo, st.width, st.height, orient)
    JpegRgb(w, h, st.comps.size, ur, ug, ub, orient)
  }

  /** The shared marker walk: SOI through EOI, every scan decoded into
    * the frame state, completeness checked. Third element: the Exif
    * orientation to apply (1 when no Exif APP1 carries one). */
  private def decodeFrame(bytes: Array[Byte])
      : (FrameState, java.util.HashMap[Int, Array[Int]], Int) = {
    require(bytes.length >= 4, s"truncated JPEG: ${bytes.length} bytes")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      f"bad magic 0x${bytes(0) & 0xff}%02x${bytes(1) & 0xff}%02x")
    var pos = 2
    def u8(o: Int): Int = {
      require(o < bytes.length, s"blob ends at $o (truncated JPEG)")
      bytes(o) & 0xff
    }
    def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    val quants = new java.util.HashMap[Int, Array[Int]]()
    val dcTabs = new java.util.HashMap[Int, DecHuff]()
    val acTabs = new java.util.HashMap[Int, DecHuff]()
    var st: FrameState = null
    var dri = 0
    var orient = -1 // -1 = no Exif orientation seen yet
    var done = false
    while (!done) {
      require(u8(pos) == 0xff, f"expected marker at $pos, got 0x${u8(pos)}%02x")
      var m = u8(pos + 1)
      pos += 2
      while (m == 0xff) { m = u8(pos); pos += 1 } // fill bytes (B.1.1.2)
      m match {
        case 0xdb => // DQT: one or more tables
          val len = u16(pos)
          val end = pos + len
          require(end <= bytes.length, s"DQT overruns blob (len $len)")
          var p = pos + 2
          while (p < end) {
            val pqTq = u8(p)
            require((pqTq >> 4) == 0,
              s"16-bit quant precision (Pq ${pqTq >> 4}) is not baseline")
            val id = pqTq & 15
            require(p + 65 <= end, "DQT table truncated")
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) {
              q(Zigzag(k)) = u8(p + 1 + k)
              require(q(Zigzag(k)) >= 1, s"zero quant entry at zigzag $k")
              k += 1
            }
            quants.put(id, q)
            p += 65
          }
          require(p == end, "DQT length disagrees with its tables")
          pos = end
        case 0xc4 => // DHT: one or more tables
          val len = u16(pos)
          val end = pos + len
          require(end <= bytes.length, s"DHT overruns blob (len $len)")
          var p = pos + 2
          while (p < end) {
            val tcTh = u8(p)
            val cls = tcTh >> 4
            val id = tcTh & 15
            require(cls <= 1, s"bad DHT class $cls")
            require(p + 17 <= end, "DHT header truncated")
            val bits = Array.tabulate(16)(i => u8(p + 1 + i))
            val n = bits.sum
            require(p + 17 + n <= end, "DHT values truncated")
            val vals = Array.tabulate(n)(i => u8(p + 17 + i))
            val t = new DecHuff(bits, vals)
            if (cls == 0) dcTabs.put(id, t) else acTabs.put(id, t)
            p += 17 + n
          }
          require(p == end, "DHT length disagrees with its tables")
          pos = end
        // SOF0 baseline / SOF1 extended sequential / SOF2 progressive.
        // SOF1 differs from SOF0 only in the LIMITS it lifts (12-bit
        // precision, 4 Huffman tables per class); at the 8-bit
        // precision enforced below its streams decode exactly like
        // baseline, and the DHT parser already accepts table ids
        // 0-15 — so the marker is accepted rather than rejected
        case 0xc0 | 0xc1 | 0xc2 =>
          require(st == null, "duplicate SOF")
          val progressive = m == 0xc2
          val len = u16(pos)
          require(u8(pos + 2) == 8,
            s"sample precision ${u8(pos + 2)} is not 8-bit")
          val height = u16(pos + 3)
          val width = u16(pos + 5)
          val nf = u8(pos + 7)
          require(width >= 1 && height >= 1, s"bad geometry ${width}x$height")
          require(nf == 1 || nf == 3, s"unsupported component count $nf")
          // cap bounds the coefficient storage: EVERY component's
          // quantized plane persists across scans (successive
          // approximation needs the history), ~4 B/pixel/component —
          // so the budget scales with component count: 192 MP
          // grayscale / 64 MP color share one ~768 MB ceiling
          // (documented in ARCHITECTURE.md beside the SA scope)
          require(width.toLong * height * nf <= 3L * (1L << 26),
            s"image above ${3 * 64 / nf} megapixels " +
              s"(${width}x$height, $nf components)")
          require(len == 8 + 3 * nf, s"SOF length $len for $nf components")
          val comps = (0 until nf).map { i =>
            val o = pos + 8 + 3 * i
            val hv = u8(o + 1)
            val fc = FrameComp(u8(o), hv >> 4, hv & 15, u8(o + 2))
            require(fc.hSamp >= 1 && fc.hSamp <= 4 &&
              fc.vSamp >= 1 && fc.vSamp <= 4,
              s"unsupported sampling ${fc.hSamp}x${fc.vSamp} (1..4, " +
                "the T.81 bound)")
            fc
          }
          require(comps.map(_.id).distinct.size == nf,
            "duplicate component ids in SOF")
          // B.2.3: an interleaved MCU carries at most 10 blocks (the
          // bound only binds multi-component frames — Ns=1 scans
          // ignore sampling factors entirely)
          require(nf == 1 || comps.map(c => c.hSamp * c.vSamp).sum <= 10,
            s"MCU of ${comps.map(c => c.hSamp * c.vSamp).sum} blocks " +
              "exceeds the T.81 bound of 10")
          // the luma plane below is component 0's: it must carry the
          // max factors or its plane would be subsampled vs the image
          require(comps.head.hSamp == comps.map(_.hSamp).max &&
            comps.head.vSamp == comps.map(_.vSamp).max,
            "first component must carry the max sampling factors")
          st = new FrameState(width, height, comps, progressive)
          pos += len
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker 0xff$m%02x — only Huffman " +
              "sequential (SOF0/SOF1, 8-bit) and Huffman progressive " +
              "(SOF2) are implemented; lossless/arithmetic/" +
              "hierarchical scans fail loudly by design")
        case 0xdd => // DRI
          require(u16(pos) == 4, s"bad DRI length ${u16(pos)}")
          dri = u16(pos + 2)
          pos += 4
        case a if (a >= 0xe0 && a <= 0xef) || a == 0xfe => // APPn / COM
          val len = u16(pos)
          require(len >= 2 && pos + len <= bytes.length,
            f"APP/COM segment overruns blob (len $len)")
          // APP1/Exif: the orientation tag changes what the decoded
          // pixels MEAN (a metadata-rotated crawl photo must dHash
          // like its upright original), so it is parsed rather than
          // skipped; the FIRST Exif block wins (CP-3451 allows one;
          // real readers take the first). All other APPn/COM skip.
          if (a == 0xe1 && orient == -1)
            parseExifOrientation(bytes, pos + 2, pos + len)
              .foreach(orient = _)
          pos += len
        case 0xda =>
          require(st != null, "SOS before SOF")
          pos = decodeScan(bytes, pos, st, dcTabs, acTabs, dri)
        case 0xd9 =>
          require(st != null && st.sawScan, "EOI before any scan")
          require(pos == bytes.length,
            s"${bytes.length - pos} trailing bytes after EOI")
          checkComplete(st, quants)
          done = true
        case other =>
          throw new IllegalArgumentException(
            f"unexpected marker 0xff$other%02x at ${pos - 1}")
      }
    }
    (st, quants, if (orient == -1) 1 else orient)
  }

  /** Parse one SOS header + its entropy segment into the frame state.
    * Baseline: full-spectrum sequential scans (all components or one).
    * Progressive: DC scans (all components, Se=0 — first pass at
    * point-transform Al, or one-bit refinement when Ah≠0) and
    * single-component AC band scans (T.81 requires Ns=1 for AC) —
    * spectral-selection first passes with EOB-run coding (G.1.2.2)
    * and successive-approximation refinement passes with correction
    * bits (G.1.2.3). Restart intervals apply in every scan kind.
    * Returns the position after the entropy data (byte-aligned, next
    * marker). */
  private def decodeScan(bytes: Array[Byte], sosPos: Int, st: FrameState,
      dcTabs: java.util.HashMap[Int, DecHuff],
      acTabs: java.util.HashMap[Int, DecHuff], dri: Int): Int = {
    def u8(o: Int): Int = {
      require(o < bytes.length, s"blob ends at $o (truncated JPEG)")
      bytes(o) & 0xff
    }
    val len = (u8(sosPos) << 8) | u8(sosPos + 1)
    val ns = u8(sosPos + 2)
    require(len == 6 + 2 * ns, s"SOS length $len for $ns components")
    require(ns >= 1 && ns <= st.comps.size, s"bad scan component count $ns")
    // scan components resolve against frame order; indices ascending
    var prev = -1
    val scanComps = (0 until ns).map { i =>
      val cid = u8(sosPos + 3 + 2 * i)
      val ci = st.comps.indexWhere(_.id == cid)
      require(ci >= 0, s"scan references unknown component id $cid")
      require(ci > prev, "scan components out of frame order")
      prev = ci
      val tdTa = u8(sosPos + 4 + 2 * i)
      (ci, tdTa >> 4, tdTa & 15)
    }
    val ss = u8(sosPos + 3 + 2 * ns)
    val se = u8(sosPos + 4 + 2 * ns)
    val ahAl = u8(sosPos + 5 + 2 * ns)
    val ah = ahAl >> 4
    val al = ahAl & 15
    if (!st.progressive) {
      require(ss == 0 && se == 63 && ahAl == 0,
        "baseline scans are full-spectrum sequential (Ss=0, Se=63, " +
          "Ah=Al=0)")
      require(ns == st.comps.size || ns == 1,
        s"baseline scans must cover all ${st.comps.size} components " +
          "or exactly one (T.81 multi-scan sequential)")
    } else {
      require(al <= 13, s"point transform Al=$al out of [0, 13]")
      require(ah == 0 || ah == al + 1,
        s"successive approximation refines one bit per scan " +
          s"(Ah=$ah must be 0 or Al+1=${al + 1})")
      if (ss == 0) {
        require(se == 0, s"progressive DC scan must have Se=0, got $se")
        // interleaved all-component DC scans (the common script) or
        // single-component ones (Ns=1, T.81-legal — per-scan DC
        // prediction, non-interleaved grid); arbitrary sub-SETS of
        // components in one scan stay rejected
        require(ns == st.comps.size || ns == 1,
          s"DC scans must cover all ${st.comps.size} components or " +
            "exactly one")
      } else {
        require(ns == 1, "AC band scans must be single-component (T.81)")
        require(se >= ss && se <= 63, s"bad spectral band [$ss, $se]")
      }
    }
    scanComps.foreach { case (ci, _, _) => st.enterScan(ci, ss, se, ah, al) }
    st.sawScan = true
    val refining = ah != 0
    val dcT = scanComps.map { case (_, td, _) =>
      if (ss == 0 && !refining) {
        // DC REFINEMENT scans carry raw bits, no Huffman table at all
        val t = dcTabs.get(td)
        require(t != null, s"missing DC Huffman table $td")
        t
      } else null
    }
    val acT = scanComps.map { case (_, _, ta) =>
      if (se > 0) {
        val t = acTabs.get(ta)
        require(t != null, s"missing AC Huffman table $ta")
        t
      } else null
    }
    val r = new BitReader(bytes, sosPos + len)
    val preds = Array.fill(ns)(0)
    if (ns > 1) {
      // interleaved MCU order: the baseline all-component scan or a
      // progressive DC scan — first pass (decode diffs at level Al)
      // or refinement (one raw bit per block at level Al)
      var mcu = 0
      var rst = 0
      var my = 0
      while (my < st.mcusY) {
        var mx = 0
        while (mx < st.mcusX) {
          if (dri > 0 && mcu > 0 && mcu % dri == 0) {
            r.expectRestart(rst)
            rst += 1
            java.util.Arrays.fill(preds, 0)
          }
          var si = 0
          while (si < ns) {
            val ci = scanComps(si)._1
            val c = st.comps(ci)
            var v = 0
            while (v < c.vSamp) {
              var h = 0
              while (h < c.hSamp) {
                val block =
                  st.blockOffset(ci, mx * c.hSamp + h, my * c.vSamp + v)
                if (refining) { // G.1.2.1: append one bit at level Al
                  if (r.nextBit() == 1) st.coefs(ci)(block) |= 1 << al
                } else {
                  val s = decodeSym(r, dcT(si))
                  require(s <= 11, s"DC category $s out of range")
                  preds(si) += extend(r.receive(s), s)
                  st.coefs(ci)(block) = preds(si) << al
                  if (se > 0)
                    decodeAcRange(r, acT(si), st, ci, block, 1, 63, 0)
                }
                h += 1
              }
              v += 1
            }
            si += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // NON-interleaved scan (Ns = 1, T.81 A.2.2: the block grid is
      // ceil(wc/8) × ceil(hc/8) — sampling factors do NOT pad it):
      // single-component baseline frames (including ones whose SOF
      // declares 2×2 factors, which jpegtran-style grayscale keeps),
      // per-component scans of a multi-scan sequential file,
      // progressive AC band scans with EOB-run coding (G.1.2.2), and
      // their refinement passes (G.1.2.3)
      val ci = scanComps.head._1
      val (niW, niH) = st.niGrid(ci)
      val coefArr = st.coefs(ci)
      var eobrun = 0
      var pred = 0
      var blk = 0
      var rst = 0
      var by = 0
      while (by < niH) {
        var bx = 0
        while (bx < niW) {
          if (dri > 0 && blk > 0 && blk % dri == 0) {
            require(eobrun == 0, "EOB run crosses a restart interval")
            r.expectRestart(rst)
            rst += 1
            pred = 0
          }
          val block = st.blockOffset(ci, bx, by)
          if (ss == 0) {
            if (refining) {
              if (r.nextBit() == 1) coefArr(block) |= 1 << al
            } else {
              val s = decodeSym(r, dcT.head)
              require(s <= 11, s"DC category $s out of range")
              pred += extend(r.receive(s), s)
              coefArr(block) = pred << al
            }
          }
          if (se > 0) {
            if (refining)
              eobrun = decodeAcRefine(r, acT.head, coefArr, block,
                ss, se, al, eobrun)
            else if (eobrun > 0) eobrun -= 1 // band stays zero here
            else eobrun = decodeAcRange(r, acT.head, st, ci, block,
              math.max(1, ss), se, al)
          }
          blk += 1
          bx += 1
        }
        by += 1
      }
      require(eobrun == 0,
        s"EOB run of $eobrun blocks overruns the scan")
    }
    r.align()
    r.pos
  }

  /** Decode AC coefficients of one block for the zigzag band
    * [ss, se] — a FIRST pass (Ah=0): full run/size symbols, values
    * scaled by the point transform (stored << al, G.1.2.2). Returns
    * the remaining EOB run (0 outside progressive AC scans — a
    * baseline EOB is exactly an EOB run of 1, consumed here). */
  private def decodeAcRange(r: BitReader, acTab: DecHuff, st: FrameState,
      ci: Int, block: Int, ss: Int, se: Int, al: Int): Int = {
    val coefArr = st.coefs(ci)
    var k = ss
    while (k <= se) {
      val rs = decodeSym(r, acTab)
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) { // ZRL: sixteen zeros, more coefficients follow
          require(k + 16 <= se, "ZRL overruns the spectral band")
          k += 16
        } else {
          // EOBn: this block's band ends; (1<<run)+receive(run)-1
          // FURTHER blocks' bands are all zero (baseline only ever
          // sees EOB0 -> returns 0)
          val eobrun = (1 << run) + r.receive(run) - 1
          require(st.progressive || eobrun == 0,
            f"EOB run symbol 0x$rs%02x in a baseline scan")
          return eobrun
        }
      } else {
        k += run
        require(k <= se, "AC run overruns the spectral band")
        require(size <= 10, s"AC category $size out of range")
        val v = extend(r.receive(size), size)
        coefArr(block + Zigzag(k)) = v << al
        k += 1
      }
    }
    0
  }

  /** Decode one block of an AC REFINEMENT scan (Ah = Al+1): newly
    * nonzero coefficients arrive as run/size symbols with size 1
    * (sign bit chooses ±2^Al), coefficients already nonzero from
    * earlier scans each consume one correction bit (1 = grow the
    * magnitude by 2^Al), and EOB runs cover whole blocks whose band
    * gains no new coefficient — but whose HISTORY coefficients still
    * consume correction bits, which is why refinement cannot skip
    * blocks the way first passes do (T.81 G.1.2.3). Takes and returns
    * the cross-block EOB run. */
  private def decodeAcRefine(r: BitReader, acTab: DecHuff,
      coefArr: Array[Int], block: Int, ss: Int, se: Int, al: Int,
      eobrunIn: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = eobrunIn
    var k = ss
    def correct(off: Int): Unit =
      if (r.nextBit() == 1 && (coefArr(off) & p1) == 0)
        coefArr(off) += (if (coefArr(off) >= 0) p1 else m1)
    if (eobrun == 0) {
      var done = false
      while (k <= se && !done) {
        val rs = decodeSym(r, acTab)
        var run = rs >> 4
        val size = rs & 15
        var newval = 0
        if (size != 0) {
          require(size == 1,
            s"refinement AC symbol carries size $size (must be 1: one " +
              "new bit per coefficient per scan)")
          newval = if (r.nextBit() == 1) p1 else m1
        } else if (run != 15) { // EOBn: rest of this block is history
          eobrun = (1 << run) + (if (run > 0) r.receive(run) else 0)
          done = true
        } // else ZRL: skip 16 zero-history coefficients
        if (!done) {
          // walk over `run` zero-history coefficients, correcting the
          // nonzero-history ones passed on the way
          var stopped = false
          while (k <= se && !stopped) {
            val off = block + Zigzag(k)
            if (coefArr(off) != 0) { correct(off); k += 1 }
            else {
              run -= 1
              if (run < 0) stopped = true else k += 1
            }
          }
          // the walk must land inside the band for BOTH symbol kinds:
          // a ZRL promises exactly 16 zero-history coefficients, so
          // overrunning the band is the same desync the first-pass
          // path rejects (strict-parser contract; libjpeg tolerates)
          require(stopped,
            if (size != 0)
              "newly-nonzero AC coefficient lands past the band"
            else "ZRL overruns the spectral band in a refinement scan")
          if (size != 0) coefArr(block + Zigzag(k)) = newval
          k += 1
        }
      }
    }
    if (eobrun > 0) {
      // EOB-run block (or block remainder): every nonzero-history
      // coefficient in the band still takes its correction bit
      while (k <= se) {
        val off = block + Zigzag(k)
        if (coefArr(off) != 0) correct(off)
        k += 1
      }
      eobrun -= 1
    }
    eobrun
  }

  /** Completeness gate at EOI: every coefficient band of every
    * component refined down to approximation level 0, every
    * referenced quant table present. */
  private def checkComplete(st: FrameState,
      quants: java.util.HashMap[Int, Array[Int]]): Unit =
    st.comps.zipWithIndex.foreach { case (c, ci) =>
      var k = 0
      while (k < 64) {
        val lvl = st.apLevel(ci)(k)
        require(lvl == 0,
          if (lvl == -1)
            s"coefficient band $k of component ${c.id} never scanned"
          else s"coefficient band $k of component ${c.id} left at " +
            s"approximation level $lvl (refinement scans missing)")
        k += 1
      }
      require(quants.get(c.quantId) != null,
        s"component ${c.id} references missing quant table ${c.quantId}")
    }

  /** Dequantize + IDCT component ci's accumulated coefficients into
    * its sample plane, cropped to the component's own dimensions
    * (A.1.1) — full image resolution for the max-factor component,
    * subsampled for chroma. */
  private def componentPlane(st: FrameState,
      quants: java.util.HashMap[Int, Array[Int]], ci: Int): Array[Int] = {
    val q = quants.get(st.comps(ci).quantId)
    val coefArr = st.coefs(ci)
    val bw = st.bwC(ci)
    val bh = st.bhC(ci)
    val pw = bw * 8
    val plane = new Array[Int](pw * bh * 8)
    val coef = new Array[Int](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val off = st.blockOffset(ci, bx, by)
        var k = 0
        while (k < 64) { coef(k) = coefArr(off + k) * q(k); k += 1 }
        val px = idct(coef)
        var rr = 0
        while (rr < 8) {
          var cc = 0
          while (cc < 8) {
            val pix = Math.round(px(rr * 8 + cc)).toInt + 128
            plane((by * 8 + rr) * pw + bx * 8 + cc) =
              math.max(0, math.min(255, pix))
            cc += 1
          }
          rr += 1
        }
        bx += 1
      }
      by += 1
    }
    val (wc, hc) = st.compDims(ci)
    val out = new Array[Int](wc * hc)
    var y = 0
    while (y < hc) {
      System.arraycopy(plane, y * pw, out, y * wc, wc)
      y += 1
    }
    out
  }

  /** Decoded luma plane accessor matching decodePngLumas/decodeGifLumas:
    * @return (width, height, lumas row-major). */
  def decodeJpegLumas(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = decodeJpeg(bytes)
    (img.width, img.height, img.lumas)
  }
}
