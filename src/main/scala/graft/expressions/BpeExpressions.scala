package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE encode (Sennrich et al. 2016 inference) — the
  * imperative hot path behind BpeTrainer.encodeVocab, retiring the
  * repo's last Scala UDF by the same argument as the C4/Gopher
  * batteries: the UDF paid Row↔JVM conversion per word and an
  * interpreted call per merge; this expression stays inside
  * WholeStageCodegen and applies each merge with a substring prefilter.
  *
  * Semantics replicate `BpeTrainer.encodeWord` EXACTLY (fuzz-pinned in
  * BpeSpec): split into UTF-16 chars plus the `</w>` marker, then
  * apply every merge IN LIST ORDER, each as one left-to-right
  * non-overlapping pass. The prefilter is exact, not heuristic: every
  * symbol is a contiguous span of `word + "</w>"`, and adjacent
  * symbols occupy adjacent spans, so a pair (x, y) can only occur in
  * the symbol sequence if x+y occurs contiguously in that base string
  * — merges failing the `contains` probe are skipped without touching
  * the buffer (for typical vocab-word lengths most merges skip, which
  * is where the win over the per-merge Vector rebuild comes from).
  */
object BpeUtil {

  /** Precompiled merge list; a plain case class so expression
    * canonicalization compares by the merges themselves. */
  case class Encoder(merges: Vector[(String, String)]) extends Serializable {
    @transient private lazy val lefts: Array[String] = merges.map(_._1).toArray
    @transient private lazy val rights: Array[String] = merges.map(_._2).toArray
    @transient private lazy val joined: Array[String] =
      merges.map { case (a, b) => a + b }.toArray

    def encode(w0: UTF8String): ArrayData = {
      val w = w0.toString
      val syms = new java.util.ArrayList[String](w.length + 1)
      var i = 0
      while (i < w.length) {
        syms.add(String.valueOf(w.charAt(i)))
        i += 1
      }
      syms.add(graft.operators.BpeTrainer.EndOfWord)
      val base = w + graft.operators.BpeTrainer.EndOfWord
      var m = 0
      while (m < lefts.length) {
        if (base.contains(joined(m)))
          applyMerge(syms, lefts(m), rights(m), joined(m))
        m += 1
      }
      val out = new Array[AnyRef](syms.size)
      i = 0
      while (i < out.length) {
        out(i) = UTF8String.fromString(syms.get(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    /** One in-place left-to-right non-overlapping pass — exactly
      * BpeTrainer.mergeOnce's semantics on a reusable buffer. */
    private def applyMerge(syms: java.util.ArrayList[String],
        x: String, y: String, xy: String): Unit = {
      var read = 0
      var write = 0
      val n = syms.size
      while (read < n) {
        if (read + 1 < n && syms.get(read) == x && syms.get(read + 1) == y) {
          syms.set(write, xy)
          read += 2
        } else {
          syms.set(write, syms.get(read))
          read += 1
        }
        write += 1
      }
      var k = syms.size
      while (k > write) { k -= 1; syms.remove(k) }
    }
  }
}

/** `graft_bpe_encode`: word → BPE token array under a fixed merge
  * list. The encoder travels as a codegen reference object (vocab-dict
  * sized — the same shipping model as the Gopher stopword set); callers
  * run it over the DISTINCT-word table only, never the corpus token
  * stream (BpeTrainer.bpeTokenCounts reaches that by join). Not
  * SQL-registered: the merge dict is a constructor object, not a
  * column, so the DataFrame entry (BpeTrainer.encodeVocab) is the API. */
case class BpeEncodeExpression(child: Expression, encoder: BpeUtil.Encoder)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeUtil.Encoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpression =
    copy(child = newChild)
}
