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

  /** SEMANTIC eval-set decontamination — the embedding-level
    * complement of [[contaminatedDocs]]: paraphrased or lightly-edited
    * eval leaks share no 13-gram, but their embeddings sit next to the
    * eval vector, so modern pipelines run this pass beside the lexical
    * one. A corpus vector is flagged iff some eval vector's EXACT
    * int8-quantized dot product (Similarity.quantizeInt8 — integer
    * arithmetic end to end, so the verdict can never wobble on float
    * order) reaches `minDot`.
    *
    * Scale shape: the eval side broadcasts (eval sets are thousands of
    * rows vs billions of corpus vectors) and both sides key into the
    * 16-way sign bucket of their first four quantized dims (the q305
    * rule), so each corpus vector dots only its bucket's eval slice —
    * a 16× map-side work cut with zero shuffle. Near-identical vectors
    * agree on the bucket bits; a leak whose perturbation flips a
    * first-four sign can miss — the standard LSH-style recall trade,
    * priced by the lexical pass running beside this one.
    *
    * `probeFlips` is the recall dial, widened on the BROADCAST side —
    * never by fanning out the corpus: each eval vector is replicated
    * into every bucket within Hamming distance `probeFlips` of its own
    * (classic multi-probe LSH, Lv et al. 2007). probeFlips = 1 makes a
    * one-sign-flip leak findable at 5× the broadcast rows — still eval-
    * sized, zero extra corpus work per surviving bucket mate. Each
    * (corpus, eval) pair can meet in at most ONE bucket (the corpus
    * side keys once), so no dedup pass is needed.
    *
    * @return one row per flagged corpus vector:
    *         (doc_id, n_hits, max_dot, min_eval_id) */
  def semanticContaminatedDocs(
      corpus: DataFrame, idCol: String, embCol: String,
      evalSet: DataFrame, evalIdCol: String, evalEmbCol: String,
      minDot: Long, probeFlips: Int = 0): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= 4,
      s"probeFlips ($probeFlips) out of [0, 4]")
    def prep(df: DataFrame, id: String, emb: String, outId: String,
        outQv: String) = df
      .select(col(id).as(outId),
        Similarity.quantizeInt8(col(emb)).getField("q").as(outQv))
      .withColumn("__bkt", (0 until 4).map(i =>
        when(element_at(col(outQv), i + 1) > 0, 1 << i).otherwise(0))
        .reduce((a, b) => a + b))
    val c = prep(corpus, idCol, embCol, "doc_id", "__cq")
    val e0 = prep(evalSet, evalIdCol, evalEmbCol, "eval_id", "__eq")
    // multi-probe expansion: XOR the home bucket with every mask of
    // popcount <= probeFlips (a static plan-time list — 1/5/11/15/16
    // replicas for 0..4 flips)
    val masks = (0 until 16)
      .filter(m => Integer.bitCount(m) <= probeFlips)
      .map(m => lit(m))
    val e =
      if (probeFlips == 0) e0
      else e0
        .withColumn("__m", explode(array(masks: _*)))
        .withColumn("__bkt", col("__bkt").bitwiseXOR(col("__m")))
        .drop("__m")
    c.join(broadcast(e), Seq("__bkt"))
      .select(col("doc_id"), col("eval_id"),
        aggregate(zip_with(col("__cq"), col("__eq"),
          (x, y) => x.cast("long") * y), lit(0L),
          (acc, x) => acc + x).as("dot"))
      .filter(col("dot") >= minDot)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("dot")).as("max_dot"),
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
