package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index shared by interpreted eval and generated code —
  * the locality-preserving alternative to [[MortonUtil]]'s z-order:
  * consecutive Hilbert indexes are ALWAYS 4-adjacent cells (unit
  * Manhattan step, spec-pinned by bijectivity + adjacency over the
  * full grid), where Morton takes long diagonal jumps at quadrant
  * boundaries. Tighter locality ⇒ tighter per-file min/max envelopes
  * on both dimensions ⇒ better row-group pruning for range predicates
  * (the reason Delta Lake's liquid clustering moved from Z to
  * Hilbert). Standard per-quadrant rotate-and-flip formulation
  * (Hilbert 1891; the iterative xy2d form). */
object HilbertUtil {

  /** Index of cell (x, y) on the order-`bits` Hilbert curve; inputs
    * are truncated to the low `bits` bits. */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: cell (x, y) of index d (for specs and range planning). */
  def position(d0: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = (t / 2L) & 1L
      val ry = (t ^ rx) & 1L
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s <<= 1
    }
    (x, y)
  }
}

/** Codegen'd Hilbert key over two integral cell coordinates — drop-in
  * beside [[MortonInterleave]] for Layout clustering. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits ($bits) must be in [1, 31]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert needs LONG coordinates, got " +
        s"${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertUtil.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.HilbertUtil.index($x, $y, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
