package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein distance (Lowrance & Wagner 1975,
  * JACM 22(2)): minimum edits under insert/delete/substitute PLUS
  * adjacent transposition, where a transposed block may be edited
  * again later — unlike the restricted OSA variant ('CA'→'ABC' is 2
  * here, 3 under OSA). DuckDB's damerau_levenshtein implements this
  * same unrestricted form, which is what makes the q211 oracle a
  * cross-engine pin. Spark ships only plain levenshtein.
  *
  * O(m·n) time and space per pair with a last-occurrence map — fine
  * for the name/title-length strings fuzzy matching runs on; for
  * corpus-scale joins, bound candidate pairs first (FastSS q74 /
  * prefix-filter q94 discipline), never all-pairs a scalar distance.
  */
object EditDistanceUtil {

  def damerau(a: UTF8String, b: UTF8String): Int =
    damerauStr(a.toString, b.toString)

  def damerauStr(a: String, b: String): Int = {
    val m = a.length
    val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    // (m+2)x(n+2) with a sentinel row/col at index 0 (distance "inf")
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // da: last row index (1-based) whose a-char equals a given char
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= m) {
      var db = 0 // last column in this row where chars matched
      j = 1
      while (j <= n) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val l = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(m + 1)(n + 1)
  }

  /** Length of the longest common subsequence of two token ARRAYS —
    * the alignment core of ROUGE-L (order-sensitive where the clipped
    * bag metrics are not: "cat the sat" vs "the cat sat" shares all
    * unigrams but only a 2-token subsequence). Rolling two-row DP,
    * O(m·n) time / O(n) space per pair. The 2²⁴-cell bound keeps a
    * single pathological pair from pinning a task for minutes —
    * callers TRUNCATE to a documented window (the ROUGE-L discipline;
    * the metric itself is quadratic, not the plan). */
  def tokenLcs(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0
    require(m.toLong * n <= (1L << 24),
      s"tokenLcs pair too large (${m}x$n cells) — truncate inputs")
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      // isNullAt BEFORE getUTF8String: UnsafeArrayData returns an
      // EMPTY (non-null) string for a null slot, so a null-check on
      // the returned value is representation-dependent — null tokens
      // must never match under ANY physical layout
      val aNull = a.isNullAt(i - 1)
      val ai = if (aNull) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (!aNull && !b.isNullAt(j - 1) &&
              ai.equals(b.getUTF8String(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  /** HAMMING-TOLERANT longest common subsequence over 64-bit
    * fingerprint ARRAYS — [[tokenLcs]] with the match predicate
    * relaxed from equality to popcount(xor) ≤ maxHamming, the same
    * per-token tolerance the perceptual image family grants a single
    * global hash. This is what lets window/frame-hash sequence
    * alignment survive VALUE-perturbing transforms (a non-integer
    * resample, a lossy re-encode, light noise) that flip a few bits
    * of most tokens, where the exact-equality LCS is a total miss.
    * maxHamming = 0 degenerates to exact [[tokenLcs]] over longs.
    * Same rolling-DP shape and 2²⁴-cell bound; null tokens never
    * match under any tolerance. NOTE: Hamming-tolerant "match" is not
    * transitive, so this is an alignment SCORE, not an equivalence —
    * exactly like every other near-dup verdict in the family. */
  def hammingLcs(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      maxHamming: Int): Int = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0
    require(m.toLong * n <= (1L << 24),
      s"hammingLcs pair too large (${m}x$n cells) — truncate inputs")
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming ($maxHamming) out of [0, 64]")
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val aNull = a.isNullAt(i - 1)
      val ai = if (aNull) 0L else a.getLong(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (!aNull && !b.isNullAt(j - 1) &&
              java.lang.Long.bitCount(ai ^ b.getLong(j - 1)) <= maxHamming)
            prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }
}

/** Codegen'd scalar node for [[EditDistanceUtil.hammingLcs]]. */
case class HammingLcsExpression(left: Expression, right: Expression,
    maxHamming: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming_lcs"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditDistanceUtil.hammingLcs(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      maxHamming)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.EditDistanceUtil.hammingLcs($l, $r, $maxHamming)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingLcsExpression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd scalar node for [[EditDistanceUtil.tokenLcs]]. */
case class TokenLcsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_lcs"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditDistanceUtil.tokenLcs(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.EditDistanceUtil.tokenLcs($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcsExpression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd scalar node for [[EditDistanceUtil.damerau]]. */
case class DamerauLevenshteinExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditDistanceUtil.damerau(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.EditDistanceUtil.damerau($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshteinExpression =
    copy(left = newLeft, right = newRight)
}
