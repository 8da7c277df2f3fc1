package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token-repetition statistics over an already-normalized
  * (lower/trim/single-space) string — the Gopher-style repetition
  * quality rules (Rae et al. 2021, "Scaling Language Models", §A1.1;
  * reproduced by RefinedWeb/Dolma): documents dominated by one
  * repeated word or by duplicated n-grams are low-quality corpus
  * members and get filtered before training.
  *
  * Metrics (all exact ratios of small integers, so the IEEE double
  * division reproduces bit-for-bit in any engine — the DuckDB oracle
  * mirrors them with list functions):
  *   - top_word_fraction:  count(most frequent token) / count(tokens)
  *   - dup_2gram_fraction: 1 - distinct(2-grams)/total(2-grams)
  *   - dup_3gram_fraction: 1 - distinct(3-grams)/total(3-grams)
  * Fewer than 2 (resp. 3) tokens -> the n-gram fraction is 0.0; the
  * empty string -> all three are 0.0.
  *
  * Design: like the shingle hot path (ShingleExpressions.scala), the
  * imperative single pass lives in a static helper and the expression
  * codegens to one call — the whole quality pass stays map-only inside
  * WholeStageCodegen, no shuffle at any scale.
  */
object RepetitionUtil {

  private val Fields: Array[String] =
    Array("top_word_fraction", "dup_2gram_fraction", "dup_3gram_fraction")

  val Schema: StructType =
    StructType(Fields.map(StructField(_, DoubleType, nullable = false)))

  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    if (str.isEmpty)
      return InternalRow(0.0, 0.0, 0.0)
    val tokens = str.split(' ')
    val n = tokens.length

    // one map pass for the word mode; n-gram dedup over the same walk
    val wordCounts = new java.util.HashMap[String, Int](n * 2)
    var maxCount = 0
    var i = 0
    while (i < n) {
      val c = wordCounts.merge(tokens(i), 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val topWordFraction = maxCount.toDouble / n

    val dup2 = dupNgramFraction(tokens, 2)
    val dup3 = dupNgramFraction(tokens, 3)
    InternalRow(topWordFraction, dup2, dup3)
  }

  private def dupNgramFraction(tokens: Array[String], k: Int): Double = {
    val total = tokens.length - k + 1
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    var distinct = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    (total - distinct).toDouble / total
  }
}

/** Codegen'd single-pass repetition stats; input must already be
  * normalized (see TextAnalysis.normalizeText). Returns a struct of the
  * three Gopher-rule fractions. */
case class RepetitionStatsExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = RepetitionUtil.Schema
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RepetitionUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpression =
    copy(child = newChild)
}
