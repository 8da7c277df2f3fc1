package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) bit interleaving shared by interpreted eval and
  * generated code. The magic-mask spread is the classic O(log bits)
  * formulation — semantically identical to the per-bit sum
  * Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1), which is what the DuckDB
  * oracle computes term-by-term. */
object MortonUtil {
  /** Spread the low 32 bits of v to the even bit positions. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into one z-value. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = if (bits >= 64) -1L else (1L << bits) - 1L
    spread(x & mask) | (spread(y & mask) << 1)
  }
}

/** Codegen'd z-order key: interleaves two integral cell coordinates into
  * a single LONG sort key. Used by operators/Layout to cluster writes so
  * parquet row-group min/max stats stay tight on BOTH dimensions — the
  * data-layout primitive behind multi-column data skipping. */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 32, s"morton bits ($bits) must be in [1, 32]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder needs LONG coordinates, got " +
        s"${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    MortonUtil.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.MortonUtil.interleave($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}
