package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Single-pass SimHash-32 helper shared by interpreted eval and generated
  * code. Semantics identical to the Column-composition form
  * (Dedup.simhash32's 32 filtered scans) but one pass over the tokens:
  * per token one md5, first 4 digest bytes as uint32, per-bit +-1 votes,
  * majority (>= half) sets the bit. Empty array -> 0. */
object SimHashUtil {
  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) >= n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd Catalyst expression for SimHash-32 over array<string>.
  *
  * Why an Expression and not the Column composition: the composed form
  * evaluates 32 `filter(tokens, ...)` lambdas (32 array traversals and
  * 32 md5 computations per token); this node does one traversal and one
  * md5 per token — ~30x less hashing in the hot path — and stays inside
  * whole-stage codegen via a static call, so the surrounding operators'
  * fusion is preserved. */
case class SimHash32Expression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHashUtil.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32Expression =
    copy(child = newChild)
}
