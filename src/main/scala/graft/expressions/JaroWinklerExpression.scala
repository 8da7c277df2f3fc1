package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler similarity (Jaro 1989; Winkler 1990) — the
  * record-linkage string comparators Fellegi–Sunter pipelines weight
  * name fields with. Spark ships neither; DuckDB ships both, which
  * makes a bit-exact oracle possible — so every semantic corner here
  * is pinned to DuckDB 1.0's observed arithmetic (probed bit-by-bit,
  * see q290):
  *   - match window = max(l1,l2)/2 − 1 (integer division, clamped to
  *     ≥ 0 — 'abc' vs 'bca' matches NOTHING);
  *   - transpositions = mismatched-matched-positions / 2 by INTEGER
  *     division (odd counts round down — probed via 3-cycles);
  *   - jaro = (m/l1 + m/l2 + (m−t)/m) / 3.0, left-associated exactly
  *     so (other associations differ in the last ulp);
  *   - either side empty ⇒ 0.0 (even "" vs "");
  *   - Winkler boost only when jaro > 0.7: jw = j + l·0.1·(1−j) with
  *     common prefix l capped at 4, left-associated exactly so.
  * Comparison is per UTF-16 unit; keep fixtures ASCII when the oracle
  * must agree (DuckDB compares bytes/codepoints).
  *
  * O(l1·window) per pair, map-only — for corpus-scale joins, bound
  * candidate pairs first (the q74/q94/q269 blocking discipline). */
object JaroWinklerUtil {

  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroStr(a.toString, b.toString)

  def jaroStr(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mismatch = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2 // integer halving, per the DuckDB probe
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val j = jaroStr(s1, s2)
    if (!(j > 0.7)) return j
    val cap = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Codegen'd scalar node for [[JaroWinklerUtil.jaro]]. */
case class JaroExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerUtil.jaro(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.JaroWinklerUtil.jaro($l, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroExpression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd scalar node for [[JaroWinklerUtil.jaroWinkler]]. */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerUtil.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.expressions.JaroWinklerUtil.jaroWinkler($l, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)
}
