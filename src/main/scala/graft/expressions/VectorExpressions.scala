package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

  /** Exact integer dot product over two array<int> values (int8-
    * quantized embeddings) — 64-bit accumulation, so any dims ≤ 2⁴⁵
    * of int8×int8 terms are exact. Null element or length mismatch ->
    * null (boxed), mirroring the null-poisoned zip_with fold. */
  def intDot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    s
  }

  /** Nearest-centroid argmax by (cosine desc, id asc) in one pass over
    * the centroid matrix — the single-node form of the IVF coarse
    * quantizer. `ids` is array<long>, `mat` array<array<double>>, both
    * literals at the call site. Null cosines (dimension mismatch) are
    * skipped; no valid centroid -> null. Cosine arithmetic is
    * [[cosine]] itself, so the choice is bit-identical to composing k
    * CosineSimilarityExpressions and taking array_max. */
  def centroidArgmax(emb: ArrayData, ids: ArrayData,
      mat: ArrayData): java.lang.Long = {
    val k = ids.numElements()
    var bestId = 0L
    var bestCos = 0.0
    var found = false
    var i = 0
    while (i < k) {
      val c = cosine(emb, mat.getArray(i))
      if (c != null) {
        val cv = c.doubleValue()
        val id = ids.getLong(i)
        // Double.compare reproduces Spark's double ordering exactly —
        // including NaN > everything — so a NaN-poisoned embedding
        // still resolves deterministically to the smallest id among
        // the NaN scores, like the old max_by/array_max forms (a
        // plain `>` would stick on the first NaN seen)
        val cmp = java.lang.Double.compare(cv, bestCos)
        if (!found || cmp > 0 || (cmp == 0 && id < bestId)) {
          found = true
          bestCos = cv
          bestId = id
        }
      }
      i += 1
    }
    if (found) bestId else null
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

/** Codegen'd exact integer dot over two array<int> columns — the hot
  * verify kernel of int8-quantized similarity (hard-negative mining
  * scores millions of bucket pairs): one tight loop instead of the
  * interpreted zip_with+aggregate lambda machinery (same ~300×
  * per-pair gap as measured for the cosine form above). The sum is
  * exact integer arithmetic, so values are identical to the composed
  * form under any evaluation order. */
case class IntDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtil.intDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftIntDot")
      s"""
      java.lang.Long $tmp = graft.expressions.VectorUtil.intDot($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd nearest-centroid argmax: long centroid id of the best
  * (cosine desc, id asc) match of `first` (array<double>) against the
  * literal centroid `third` matrix with `second` ids. ONE expression
  * node regardless of k — composing k cosine expressions plus an
  * array_max makes the optimizer fold/analyze a k-wide tree per query
  * (measured ~1.6 s of planning at k=80 on q32). */
case class CentroidArgmaxExpression(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_centroid_argmax"

  override protected def nullSafeEval(emb: Any, ids: Any, mat: Any): Any =
    VectorUtil.centroidArgmax(emb.asInstanceOf[ArrayData],
      ids.asInstanceOf[ArrayData], mat.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, ids, mat) => {
      val tmp = ctx.freshName("graftArgmax")
      s"""
      java.lang.Long $tmp = graft.expressions.VectorUtil.centroidArgmax($emb, $ids, $mat);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CentroidArgmaxExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
