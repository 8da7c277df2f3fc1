package graft.expressions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative helpers behind the shingle/minhash hot path. Semantics are
  * pinned to the Column-composition forms (and therefore to the DuckDB
  * oracle SQL): distinct char n-grams in first-occurrence order;
  * md5-hex minima per salted permutation; band key = md5 of the
  * pipe-joined minima. */
/** The affine MinHash permutation family shared by the Scala hot path,
  * the Column-composition reference form, and the DuckDB oracle SQL:
  * permutation i maps TWO independent 31-bit shingle hashes (the first
  * and second 4-byte md5 prefixes) to
  * ((a(i)·h1) mod P + (b(i)·h2) mod P + c(i)) mod P.
  * Two independent hash inputs make the family pairwise independent —
  * a single-h variant was measured to correlate band collisions
  * (candidate pairs 680k -> 1.2M on the sf0.1 corpus). Every operand
  * stays below 2³¹, so each product fits a signed 64-bit integer and
  * the arithmetic reproduces bit-for-bit in any engine with md5 and
  * BIGINT math. P = 2³¹−1 (prime); coefficients derive from the
  * permutation index so every engine re-creates them from the formula. */
object MinHashScheme {
  val P: Long = 2147483647L

  /** splitmix64 finalizer — coefficients must be UNRELATED across
    * permutation indices: a first cut used (i+1)·const for a/b/c, which
    * makes permutation i exactly (i+1)× permutation 0 mod P — minima
    * collide in lockstep and candidate pairs tripled. The mixed
    * coefficients are computed driver-side and embedded as literals in
    * both engines' expressions, so the formula only needs to be
    * deterministic Scala. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  def a(i: Int): Long = Math.floorMod(mix(3L * i + 1), P - 1) + 1
  def b(i: Int): Long = Math.floorMod(mix(3L * i + 2), P - 1) + 1
  def c(i: Int): Long = Math.floorMod(mix(3L * i + 3), P)
}

object ShingleUtil {
  private val HexDigits = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct char n-grams of `s` in first-occurrence order; a string of
    * length <= n yields itself as the only shingle. Matches
    * `TextAnalysis.charShingles` over an already-normalized string —
    * positions are code-point-based (UTF8String.substring), like Spark's
    * length()/substr(). */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len <= n) return new GenericArrayData(Array[Any](s))
    // code-point byte offsets computed once: UTF8String.substring(i, j)
    // scans from byte 0 to find char i, which makes a sliding window
    // O(len²); one offset pass keeps each shingle slice O(n)
    val bytes = s.getBytes
    val offsets = new Array[Int](len + 1)
    var ci = 0
    var b = 0
    while (b < bytes.length) {
      offsets(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    offsets(len) = bytes.length
    // sorted set: downstream set ops (jaccard intersect) get sorted
    // inputs for merge-based counting; all consumers are order-agnostic
    val seen = new java.util.TreeSet[UTF8String]()
    var i = 0
    val last = len - n
    while (i <= last) {
      val from = offsets(i)
      seen.add(UTF8String.fromBytes(bytes, from, offsets(i + n) - from))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word n-grams of an already-normalized (lower/trim/
    * single-space) string, sorted; `numTokens <= n` yields the whole
    * string as the only shingle (mirroring charShingles' short-input
    * rule). The unit of the canonical LLM-corpus dedup recipe
    * (13-gram-style word windows). */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val tokens = if (str.isEmpty) Array.empty[String] else str.split(' ')
    if (tokens.length <= n) return new GenericArrayData(Array[Any](s))
    val seen = new java.util.TreeSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val last = tokens.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED distinct arrays (two-pointer merge,
    * no hash set, early exit). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Hash each (distinct) shingle to a 64-bit key — first 8 bytes of its
    * md5, big-endian signed — and return the keys sorted ascending.
    * Distinct strings map to distinct longs (64-bit md5-prefix collision
    * odds are ~n²/2⁶⁵ — negligible at any per-document shingle count), so
    * set intersections over the long keys equal set intersections over
    * the strings, at primitive-array merge cost with zero per-element
    * allocation. */
  def hashShingles(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      md.reset()
      i += 1
    }
    java.util.Arrays.sort(out)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Winnowing fingerprints of an already-normalized string: sorted
    * distinct window-minima of the 60-bit md5 k-gram hashes (see
    * WinnowingExpression). < k chars -> empty; fewer k-grams than one
    * window -> the single overall minimum — the exact edge rules of
    * TextAnalysis.winnowingSelect, equivalence-spec-pinned. */
  def winnowing(s: UTF8String, k: Int, w: Int): ArrayData = {
    val len = s.numChars()
    val m = len - k + 1
    if (m <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val bytes = s.getBytes
    val offsets = new Array[Int](len + 1)
    var ci = 0
    var b = 0
    while (b < bytes.length) {
      offsets(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    offsets(len) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      val d = md.digest()
      // first 15 hex digits = top 60 bits of the first 8 bytes
      val v = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      hashes(i) = v >>> 4
      md.reset()
      i += 1
    }
    val nWin = m - w + 1
    val mins: Array[Long] =
      if (nWin <= 0) {
        var mn = hashes(0); var t = 1
        while (t < m) { if (hashes(t) < mn) mn = hashes(t); t += 1 }
        Array(mn)
      } else {
        val out = new Array[Long](nWin)
        var j = 0
        while (j < nWin) {
          var mn = hashes(j); var t = 1
          while (t < w) {
            val x = hashes(j + t); if (x < mn) mn = x; t += 1
          }
          out(j) = mn
          j += 1
        }
        out
      }
    java.util.Arrays.sort(mins)
    var d = 1
    var p = 1
    while (p < mins.length) {
      if (mins(p) != mins(p - 1)) { mins(d) = mins(p); d += 1 }
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(mins, d))
  }

  /** Intersection size of two SORTED long arrays (two-pointer merge). */
  def sortedLongIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** LSH band keys in one pass with ONE md5 per shingle: the k "salted
    * permutations" are affine maps over a 31-bit md5-prefix hash —
    * m_i = min over shingles of (A_i·h31 + B_i) mod P, band key b =
    * the pipe-joined decimal minima of its rows. All operands stay
    * below 2³¹ so every product fits a 64-bit signed integer and the
    * arithmetic is reproducible bit-for-bit in any engine with md5 and
    * BIGINT math (the DuckDB oracle mirrors it literally). The earlier
    * scheme hashed every (shingle, salt) pair — k× the md5 cost, which
    * measured as the dominant q16 stage once verification was fixed. */
  /** The raw k minima of [[minhashBands]]'s chain — one md5 per
    * shingle, all k permutations updated in the same traversal. For
    * signature-agreement estimation (q331) where the minima, not the
    * band keys, are compared. */
  def minhashSignatureFast(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val as = Array.tabulate(k)(MinHashScheme.a)
    val bs = Array.tabulate(k)(MinHashScheme.b)
    val cs = Array.tabulate(k)(MinHashScheme.c)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      md.reset()
      val h1 = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x7fffffffL
      val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) & 0x7fffffffL
      var t = 0
      while (t < k) {
        val v = ((as(t) * h1) % MinHashScheme.P +
          (bs(t) * h2) % MinHashScheme.P + cs(t)) % MinHashScheme.P
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == Long.MaxValue) 0L else m))
  }

  def minhashBands(shingles: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val k = bands * rowsPerBand
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val as = Array.tabulate(k)(MinHashScheme.a)
    val bs = Array.tabulate(k)(MinHashScheme.b)
    val cs = Array.tabulate(k)(MinHashScheme.c)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      md.reset()
      // first and second 4-byte md5 prefixes as unsigned ints, 31-bit
      val h1 = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x7fffffffL
      val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) & 0x7fffffffL
      var s = 0
      while (s < k) {
        val v = ((as(s) * h1) % MinHashScheme.P +
          (bs(s) * h2) % MinHashScheme.P + cs(s)) % MinHashScheme.P
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder()
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('|')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd distinct-char-n-gram shingling (one pass, no per-element
  * Column lambda machinery). Input must already be normalized
  * (lower/trim/collapse-whitespace) — see TextAnalysis.charShingles. */
case class CharShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.charShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.charShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShinglesExpression =
    copy(child = newChild)
}

/** Codegen'd intersection size over two SORTED distinct string arrays
  * (CharShinglesExpression output is sorted). Two-pointer merge beats
  * array_intersect's hash-set build per row. */
case class SortedIntersectSizeExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ShingleUtil.sortedIntersectSize(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.ShingleUtil.sortedIntersectSize($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd MinHash-LSH band keys: the full salt-hash-min-band chain in
  * one traversal of the shingle array. */
/** Codegen'd raw MinHash signature (the k permutation minima in one
  * shingle traversal — see ShingleUtil.minhashSignatureFast). */
case class MinHashSignatureExpression(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.minhashSignatureFast(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.minhashSignatureFast($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpression =
    copy(child = newChild)
}

case class MinHashBandsExpression(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.minhashBands(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.minhashBands($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpression =
    copy(child = newChild)
}

/** Codegen'd distinct word n-grams over an already-normalized string
  * (see ShingleUtil.wordShingles). */
case class WordShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpression =
    copy(child = newChild)
}

/** Codegen'd 64-bit hashing of a (distinct) string-shingle array into a
  * sorted long array — the allocation-free input format for
  * SortedLongIntersectSizeExpression. */
case class HashedShinglesExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.hashShingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.hashShingles($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpression =
    copy(child = newChild)
}

/** Codegen'd intersection size over two SORTED long arrays: primitive
  * two-pointer merge, zero per-element allocation (the UTF8String form
  * allocates a wrapper per element access — measured dominant in the
  * MinHash verify stage at sf0.1). */
case class SortedLongIntersectSizeExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_long_intersect_size"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ShingleUtil.sortedLongIntersectSize(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.ShingleUtil.sortedLongIntersectSize($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSizeExpression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd winnowing fingerprint selection (Schleimer et al. 2003)
  * in ONE primitive pass: md5-hash every char k-gram (code-point
  * offsets computed once — the charShingles O(len²) guard), slide a
  * w-hash window keeping each minimum, sort + dedup the selection.
  * The Column-composition form (TextAnalysis.winnowingHashes +
  * winnowingSelect) is the spec reference; interpreted HOF
  * slice-per-window measured 7.6 s at sf0.1 vs ~2 s here, and the
  * composition also needs a checkpoint to stop CollapseProject
  * re-inlining the hash transform — this node has no such hazard.
  * Hash = first 15 md5 hex digits as a 60-bit integer, replayed in
  * DuckDB as ('0x' || substr(md5(substr(t,i,k)),1,15))::BIGINT. */
case class WinnowingExpression(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnowing needs k >= 2, w >= 1 (got $k, $w)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_winnowing"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.winnowing(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.winnowing($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingExpression =
    copy(child = newChild)
}
