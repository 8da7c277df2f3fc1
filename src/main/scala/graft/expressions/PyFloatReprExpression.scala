package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CPython `str(float)` renderer — the reference interpolates
  * `str(float(value))` into generated SQL (`etl/etl.py:264-271`), so
  * value-level rendering must reproduce CPython's formatting exactly:
  * shortest round-tripping digits, positional form for decimal exponent
  * in [-4, 16), scientific form (`1e-05`, `1.5e+16` — two-digit minimum
  * exponent, no trailing `.0` on an integral mantissa) outside it.
  *
  * Shortest digits are found by probing `%.pe` at increasing precision
  * until the parse round-trips — the fixpoint CPython's float_repr
  * reaches via its shortest-digits algorithm. (In the measure-zero case
  * of an exact decimal tie at the cut, Java's half-up rounding can fail
  * the round-trip one digit early and emit one more digit than CPython;
  * every emitted string still round-trips.) */
object PyFloatRepr {

  def repr(d: Double): UTF8String = UTF8String.fromString(render(d))

  /** Significant-digit count of a Double.toString rendering — the probe
    * seed. Java 17's toString is not always minimal, so the probe still
    * walks down one step at a time, but starts 1-2 steps from the
    * answer instead of up to 17 Formatter+parse rounds away. */
  private def sigDigits(s: String): Int = {
    val e = s.indexOf('E')
    val mant = if (e >= 0) s.substring(0, e) else s
    val digits = mant.filter(_.isDigit).dropWhile(_ == '0')
    val trimmed = digits.reverse.dropWhile(_ == '0').reverse
    math.max(1, trimmed.length)
  }

  def render(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (d == java.lang.Double.POSITIVE_INFINITY) return "inf"
    if (d == java.lang.Double.NEGATIVE_INFINITY) return "-inf"
    def fmt(p: Int): String =
      String.format(java.util.Locale.ROOT, "%." + p + "e", Double.box(d))
    def roundTrips(s: String): Boolean = java.lang.Double.parseDouble(s) == d
    // round-trip success is monotone in precision, so seed near the
    // expected shortest length and walk toward the boundary
    var p = math.min(16, math.max(0,
      sigDigits(java.lang.Double.toString(d)) - 1))
    var s = fmt(p)
    if (roundTrips(s)) {
      var done = false
      while (p > 0 && !done) {
        val shorter = fmt(p - 1)
        if (roundTrips(shorter)) { p -= 1; s = shorter } else done = true
      }
    } else {
      while (!roundTrips(s) && p < 17) {
        p += 1
        s = fmt(p)
      }
    }
    val ei = s.indexOf('e')
    val exp = Integer.parseInt(s.substring(ei + 1))
    var mant = s.substring(0, ei)
    val neg = mant.startsWith("-")
    if (neg) mant = mant.substring(1)
    var digits = mant.replace(".", "")
    var dl = digits.length
    while (dl > 1 && digits.charAt(dl - 1) == '0') dl -= 1
    digits = digits.substring(0, dl)
    val sign = if (neg) "-" else ""
    if (exp < -4 || exp >= 16) {
      val m =
        if (digits.length == 1) digits
        else digits.charAt(0) + "." + digits.substring(1)
      val ea = math.abs(exp)
      val es = (if (exp < 0) "-" else "+") + (if (ea < 10) "0" else "") + ea
      s"$sign${m}e$es"
    } else if (exp >= digits.length - 1) {
      sign + digits + "0" * (exp - digits.length + 1) + ".0"
    } else if (exp >= 0) {
      sign + digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
    } else {
      sign + "0." + "0" * (-exp - 1) + digits
    }
  }
}

/** Codegen'd Catalyst expression: double -> CPython str(float) text.
  * Used by TypeCascade.valueLevelRender — a static call keeps the
  * surrounding projection inside whole-stage codegen. */
case class PyFloatReprExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_py_float_repr"

  override protected def nullSafeEval(input: Any): Any =
    PyFloatRepr.repr(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PyFloatRepr.repr($c)")

  override protected def withNewChildInternal(newChild: Expression): PyFloatReprExpression =
    copy(child = newChild)
}
