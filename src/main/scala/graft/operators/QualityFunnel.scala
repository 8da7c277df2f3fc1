package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{PiiRedaction, TextAnalysis => TA}

/** The end-to-end corpus quality funnel (north-star extension): charge
  * every document to the FIRST pipeline stage that drops it —
  * repetition rules (Gopher §A1.1), then PII, then eval-set
  * contamination, then LM perplexity — or 'kept'. The census output is
  * the report a corpus-engineering run publishes alongside the cleaned
  * corpus: how many documents (and tokens) each filter cost.
  *
  * Scale shape: the repetition + PII flags are map-only expressions
  * fused into the scan; contamination is the broadcast inverted-index
  * join (corpus text never shuffles); the LM pass is two bounded model
  * aggregates plus one scoring join; the census is a ~5-row aggregate.
  * First-drop attribution (rather than independent per-filter counts)
  * is what makes the numbers additive: stages sum to the corpus.
  */
object QualityFunnel {

  /** Per-document stage attribution: (idCol, n_tokens, stage).
    * `evalPrompts` is any (eval_id, eval_text) frame — see
    * Decontamination.contaminatedDocs. `lmTau` is the perplexity-proxy
    * cutoff; pick it in a measured gap of the score distribution so
    * engine float noise (~1e-12) can never flip a verdict. */
  def stageDocs(df: DataFrame, idCol: String, textCol: String,
      evalPrompts: DataFrame, lmTau: Double): DataFrame = {
    val r = TA.repetitionStats(col(textCol))
    val base = df.select(col(idCol),
      size(split(TA.normalizeText(col(textCol)), " ")).cast("long")
        .as("n_tokens"),
      (r.getField("top_word_fraction") <= 0.3 &&
        r.getField("dup_2gram_fraction") <= 0.2 &&
        r.getField("dup_3gram_fraction") <= 0.18).as("rep_keep"),
      (PiiRedaction.emailCount(col(textCol)) +
        PiiRedaction.phoneCount(col(textCol)) +
        PiiRedaction.ipv4Count(col(textCol)) > 0).as("has_pii"))
    // contaminatedDocs renames its id column to the literal "doc_id" —
    // rename back so any idCol works, not just "doc_id"
    val cont = Decontamination.contaminatedDocs(df, idCol, textCol,
        evalPrompts, "eval_id", "eval_text", n = 13)
      .select(col("doc_id").as(idCol), lit(true).as("contaminated"))
    val lm = LanguageModel.scoreDocs(df, idCol, textCol)
      .select(col("doc_id").as(idCol), col("score"))
    base.join(cont, Seq(idCol), "left")
      .join(lm, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        when(!col("rep_keep"), "repetition")
          .when(col("has_pii"), "pii")
          .when(col("contaminated"), "contaminated")
          .when(col("score") > lmTau, "lm_noise")
          .otherwise("kept").as("stage"))
  }

  /** Per-stage doc and token census over stageDocs' output. */
  def census(staged: DataFrame): DataFrame =
    staged.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("stage"))
}
