package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher quality rules (Rae et al. 2021 §A1.1) — the
  * imperative hot path behind TextAnalysis.gopherQuality, by the same
  * argument as the C4 battery: the Column composition walks the token
  * and line arrays through five interpreted higher-order filters; this
  * single pass stays inside WholeStageCodegen. Every ratio is ONE IEEE
  * division of exact longs (bit-identical to the composed form), and
  * the string semantics replicate Spark's exactly: `tokens`' space-only
  * trim + `\s+` split (leading-empty artifact on tab-led text),
  * `split(text, "\n")` on the RAW text including empty segments,
  * `length`'s code-point counting, and find()-semantics regexes.
  * Pinned by the equivalence spec against the retained composed form.
  */
object GopherUtil {

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val Symbols = java.util.regex.Pattern.compile("#|\\.{3}|…")
  private val Bullet = java.util.regex.Pattern.compile("^\\s*[-*•]")
  private val Ellipsis = java.util.regex.Pattern.compile("(\\.{3}|…)\\s*$")

  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextAnalysis.EnglishStopwords.foreach(s.add)
    s
  }

  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  def stats(t0: UTF8String): InternalRow = {
    val t = t0.toString
    val trimmed = trimSpaces(t)
    val words: Array[String] =
      if (trimmed.isEmpty) Array.empty else Ws.split(trimmed, -1)
    val nWords = words.length.toLong
    var sumLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      // Spark length() counts code points, not UTF-16 units
      sumLen += w.codePointCount(0, w.length).toLong
      var hasAlpha = false
      var k = 0
      while (k < w.length && !hasAlpha) {
        val c = w.charAt(k)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
          hasAlpha = true
        k += 1
      }
      if (hasAlpha) nAlpha += 1L
      if (Stopwords.contains(
          UTF8String.fromString(w).toLowerCase.toString)) nStop += 1L
      i += 1
    }
    // lines over the RAW text, empty segments included (the composed
    // form's size(split(text, "\n")))
    val lines = t.split("\n", -1)
    val nLines = lines.length.toLong
    var nBullet = 0L
    var nEllipsis = 0L
    i = 0
    while (i < lines.length) {
      if (Bullet.matcher(lines(i)).find()) nBullet += 1L
      if (Ellipsis.matcher(lines(i)).find()) nEllipsis += 1L
      i += 1
    }
    var nSymbols = 0L
    val m = Symbols.matcher(t)
    while (m.find()) nSymbols += 1L
    val meanWordLen =
      if (nWords > 0L) sumLen.toDouble / nWords.toDouble else 0.0
    val symbolRatio =
      if (nWords > 0L) nSymbols.toDouble / nWords.toDouble else 0.0
    val bulletFrac =
      if (nLines > 0L) nBullet.toDouble / nLines.toDouble else 0.0
    val ellipsisFrac =
      if (nLines > 0L) nEllipsis.toDouble / nLines.toDouble else 0.0
    val alphaFrac =
      if (nWords > 0L) nAlpha.toDouble / nWords.toDouble else 0.0
    val keep = nWords >= 50L && nWords <= 100000L &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && nStop >= 2L
    InternalRow(nWords, meanWordLen, symbolRatio, bulletFrac,
      ellipsisFrac, alphaFrac, nStop, keep)
  }
}

/** Codegen'd single-pass Gopher rules; NULL text is the caller's
  * concern (the composed `tokens` treated NULL as empty — wrap with
  * coalesce at the call site, as TextAnalysis.gopherQuality does). */
case class GopherQualityExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = GopherUtil.Schema
  override def prettyName: String = "graft_gopher_quality"

  override protected def nullSafeEval(input: Any): Any =
    GopherUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GopherUtil.stats($c)")

  override protected def withNewChildInternal(
      newChild: Expression): GopherQualityExpression =
    copy(child = newChild)
}
