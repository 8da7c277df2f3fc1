package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass C4 structural-rule battery (Raffel et al. 2020 §2.2) —
  * the imperative hot path behind TextAnalysis.c4Quality. The Column
  * composition (split → transform → filter → two aggregates, all
  * higher-order functions Spark evaluates INTERPRETED per element)
  * measured 10–14 s on the sf0.1 gate row; this single walk stays
  * inside WholeStageCodegen like the shingle/winnowing/repetition hot
  * paths. Semantics replicate the composed form exactly — including
  * Spark `trim`'s space-only trimming, Pattern.split's leading-empty
  * artifact on tab-led lines, and Java regex `$` matching before a
  * trailing line terminator — pinned by the equivalence spec against
  * the retained composed reference.
  */
object C4Util {

  val Schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("kept_words", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")
  // find()-style, NOT anchored-match: `$` keeps Java's before-final-
  // line-terminator semantics (a '\r'-tailed line still matches,
  // exactly as the composed rlike did)
  private val EndPunct = java.util.regex.Pattern.compile("[.!?\"]$")
  private val Lorem = UTF8String.fromString("lorem ipsum")
  private val Brace = UTF8String.fromString("{")
  private val Js = UTF8String.fromString("javascript")

  /** Spark `trim` semantics: leading/trailing SPACE (0x20) only —
    * tabs and other whitespace survive, and the word splitter then
    * sees them (the composed form's exact behavior). */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  def battery(t0: UTF8String): InternalRow = {
    val t = t0.toString
    var nLines = 0L
    var nKept = 0L
    var keptWords = 0L
    var nSent = 0L
    val rawLines = t.split("\n", -1)
    var i = 0
    while (i < rawLines.length) {
      val l = trimSpaces(rawLines(i))
      if (l.nonEmpty) {
        nLines += 1L
        if (EndPunct.matcher(l).find()) {
          val words = Ws.split(l, -1).length
          if (words >= 5 &&
              !UTF8String.fromString(l).toLowerCase.contains(Js)) {
            nKept += 1L
            keptWords += words.toLong
            var k = 0
            while (k < l.length) {
              val c = l.charAt(k)
              if (c == '.' || c == '!' || c == '?') nSent += 1L
              k += 1
            }
          }
        }
      }
      i += 1
    }
    val hasLorem = t0.toLowerCase.contains(Lorem)
    val hasBrace = t0.contains(Brace)
    InternalRow(nLines, nKept, keptWords, nSent, hasLorem, hasBrace,
      nSent >= 3L && !hasLorem && !hasBrace)
  }
}

/** Codegen'd single-pass C4 battery; the caller coalesces NULL text to
  * "" (the composed form's convention). Returns the seven-field
  * verdict struct. */
case class C4QualityExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = C4Util.Schema
  override def prettyName: String = "graft_c4_quality"

  override protected def nullSafeEval(input: Any): Any =
    C4Util.battery(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.C4Util.battery($c)")

  override protected def withNewChildInternal(
      newChild: Expression): C4QualityExpression =
    copy(child = newChild)
}
