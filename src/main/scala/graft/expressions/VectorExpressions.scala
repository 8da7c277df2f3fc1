package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Imperative vector math behind the similarity hot paths. */
object VectorUtil {

  /** Cosine similarity over two array<double> values with deterministic
    * in-order summation — bit-identical to the Column-composition form
    * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` etc.) on clean inputs,
    * and to DuckDB's list_cosine_similarity (both fold left-to-right).
    * Zero-norm input -> 0.0. Null element or length mismatch -> null
    * (boxed), mirroring the null-poisoned fold of the composed form. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den > 0) dot / den else 0.0
  }
}

/** Codegen'd cosine similarity over two array<double> columns: one tight
  * loop, no per-element lambda machinery or intermediate zipped arrays —
  * the interpreted higher-order-function form costs ~30µs per 64-dim pair
  * (measured at sf0.1), this is ~100ns. Summation order matches the
  * composed form exactly, so oracle hashes are unchanged. */
case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_similarity"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtil.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftCos")
      s"""
      java.lang.Double $tmp = graft.expressions.VectorUtil.cosine($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpression =
    copy(left = newLeft, right = newRight)
}
