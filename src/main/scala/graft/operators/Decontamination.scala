package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextAnalysis => TA}

/** Benchmark decontamination for LLM training corpora (north-star
  * extension): flag training documents that share at least one word
  * n-gram (canonically 13-gram — the GPT-3/PaLM recipe) with an
  * evaluation set, so eval prompts leaking into the corpus can be
  * dropped before training.
  *
  * Shape: an inverted-index join. Both sides explode to (id, n-gram)
  * rows via the codegen'd WordShinglesExpression; the equi-join on the
  * n-gram is the index probe. The eval set is tiny next to the corpus
  * (thousands of prompts vs billions of docs), so the exploded eval
  * side broadcasts by default and the whole pass is map-side against
  * the corpus scan — no corpus shuffle at any scale. With
  * `broadcastEval = false` it degrades to a shuffle equi-join on the
  * n-gram, which is the right plan when the eval set itself is large.
  */
object Decontamination {

  /** One row per contaminated corpus doc:
    * (doc_id, n_hits = distinct matched n-grams, min_eval_id).
    * Documents with fewer than `n` tokens contribute their whole
    * normalized text as a single "n-gram" (WordShinglesExpression's
    * short-input rule), so trivially short docs still participate. */
  def contaminatedDocs(
      corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalIdCol: String, evalTextCol: String,
      n: Int = 13, broadcastEval: Boolean = true): DataFrame = {
    val docGrams = corpus.select(col(idCol).as("doc_id"),
      explode(TA.wordShingles(col(textCol), n)).as("g"))
    val evalGrams0 = evalSet.select(col(evalIdCol).as("eval_id"),
      explode(TA.wordShingles(col(evalTextCol), n)).as("g"))
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    docGrams.join(evalGrams, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_hits"),
        min(col("eval_id")).as("min_eval_id"))
  }

  /** Drop contaminated docs from the corpus (left anti-join on the
    * flagged id set — the flagged side is aggregated and small). */
  def decontaminate(
      corpus: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, evalIdCol: String, evalTextCol: String,
      n: Int = 13): DataFrame = {
    val flagged = contaminatedDocs(corpus, idCol, textCol,
      evalSet, evalIdCol, evalTextCol, n)
      .select(col("doc_id").as("__contaminated_id"))
    corpus.join(broadcast(flagged),
      col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
