package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** CCNet-style n-gram language-model quality scoring (north-star
  * extension): train a bigram LM on the corpus itself, score every doc
  * by its mean negative log-probability (a perplexity proxy) — the
  * classic "filter web text by LM perplexity" pass (Wenzek et al. 2020,
  * CCNet; reused by most open-corpus pipelines).
  *
  * Scale shape: two hash-aggregates build the model (bigram counts,
  * history counts — both map-side-combined, keyed by uniform token
  * keys), one scalar vocab aggregate, then scoring is a join keyed by
  * the bigram (model table is ~vocab-bounded, usually broadcastable;
  * at web scale it degrades to a shuffle equi-join) and one per-doc
  * aggregate whose state is bounded by document length.
  *
  * Determinism: the per-doc log-prob sum runs over the SORTED log
  * values (collect → sort → in-order fold), so both engines add the
  * same floats in the same order — the only cross-engine noise is
  * libm's 1-ulp `ln`, far inside the oracle's 10-significant-digit
  * tolerance. Laplace (+1) smoothing keeps unseen bigrams finite.
  */
object LanguageModel {

  /** Ordered, NON-distinct token bigrams over an already-MATERIALIZED
    * token-array column (LM counts need multiplicity —
    * WordShinglesExpression dedups, so this is its own composition).
    * Fewer than 2 tokens -> empty.
    *
    * `tk` must be a bound column, not an inline `split(...)`
    * expression: Catalyst inlines an inline expression into every
    * lambda element access, which turns this into O(len²) regex+split
    * work per document — the same pitfall that motivated the codegen'd
    * shingle expressions (measured here as 21 s -> ~2 s at sf0.1). */
  private[graft] def bigramsFromTokens(tk: Column): Column =
    when(size(tk) < 2,
      array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(tk) - 1),
        i => struct(element_at(tk, i).as("w1"),
          element_at(tk, i + 1).as("w2"))))

  /** One row per scoreable doc (>= 1 bigram):
    * (doc_id, n_bigrams, score) where score = -mean ln P(w2|w1),
    * P = (c(w1,w2) + 1) / (c(w1·) + V). Lower = more predictable text;
    * filter high-score docs as noise, very-low-score docs as
    * boilerplate, per the CCNet recipe. */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array once per row (projection boundary)
    // before any lambda indexes into it — see bigramsFromTokens
    val toks = df.select(col(idCol).as("doc_id"),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
    // persisted: consumed by three subtrees (bigram counts, history
    // counts, scoring join) — without the cache the explode runs 3×
    // (the q15 shingle pattern). MEMORY_ONLY so an evicted block
    // recomputes instead of parking the corpus bigram stream on
    // executor disk; released below once the (per-doc-sized) result is
    // materialized — callers never see the cache
    val bg = toks.select(col("doc_id"),
        explode(bigramsFromTokens(col("__tk"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val bgCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
    val histCounts = bg.groupBy(col("w1")).agg(count(lit(1)).as("c_h"))
    // vocab size: a one-row aggregate broadcast-cross-joined in (NOT an
    // eager collect — keeps the scorer one lazy DAG and mirrors the
    // oracle's CROSS JOIN v literally)
    val vocabDf = toks.select(explode(col("__tk")).as("w"))
      .agg(countDistinct(col("w")).as("__v"))
    val lnp = log((col("c_bg") + lit(1.0)) / (col("c_h") + col("__v")))
    val scored = bg.join(bgCounts, Seq("w1", "w2"))
      .join(histCounts, Seq("w1"))
      .crossJoin(broadcast(vocabDf))
      .select(col("doc_id"), lnp.as("lnp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-aggregate(sort_array(collect_list(col("lnp"))), lit(0.0),
          (acc, x) => acc + x) / count(lit(1))).as("score"))
      .localCheckpoint(eager = true)
    bg.unpersist()
    scored
  }

  /** Cross-corpus Laplace bigram scoring — [[scoreDocs]] with the
    * model trained on a DIFFERENT corpus, which is what cross-entropy
    * data selection needs: unseen bigrams get the Laplace floor
    * (0+1)/(c_h+V) and unseen HISTORIES degrade to 1/V (left joins +
    * coalesce — self-scoring never exercises these paths, so they are
    * spec-pinned here). V is the MODEL corpus vocabulary. Same scale
    * shape as [[scoreDocs]]; the model tables are vocab-bounded.
    * @return per scoreable doc: (doc_id, n_bigrams, score) */
  def scoreDocsAgainst(scored: DataFrame, model: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val mToks = model.select(
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
    val mBg = mToks
      .select(explode(bigramsFromTokens(col("__tk"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val bgCounts = mBg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
    val histCounts = mBg.groupBy(col("w1")).agg(count(lit(1)).as("c_h"))
    val vocabDf = mToks.select(explode(col("__tk")).as("w"))
      .agg(countDistinct(col("w")).as("__v"))
    val sToks = scored.select(col(idCol).as("doc_id"),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
    val sBg = sToks.select(col("doc_id"),
        explode(bigramsFromTokens(col("__tk"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val lnp = log((coalesce(col("c_bg"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c_h"), lit(0L)) + col("__v")))
    val res = sBg.join(bgCounts, Seq("w1", "w2"), "left")
      .join(histCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocabDf))
      .select(col("doc_id"), lnp.as("lnp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-aggregate(sort_array(collect_list(col("lnp"))), lit(0.0),
          (acc, x) => acc + x) / count(lit(1))).as("score"))
      .localCheckpoint(eager = true)
    mBg.unpersist()
    res
  }

  /** Moore–Lewis cross-entropy difference selection (Moore & Lewis
    * 2011): score every candidate document under an IN-DOMAIN bigram
    * LM and a GENERAL one, and rank by the difference
    * H_in − H_general — negative means "reads more like the target
    * domain than like average text", which is the canonical
    * data-selection criterion for domain-adapting a training mix.
    * Both scorings are [[scoreDocsAgainst]]; the caller thresholds
    * (this emits the raw difference — verdicts belong to rows with
    * measured decision gaps, the q64 rule).
    * @return per scoreable doc: (doc_id, n_bigrams, ml_diff) */
  def mooreLewis(candidates: DataFrame, inDomain: DataFrame,
      general: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sIn = scoreDocsAgainst(candidates, inDomain, idCol, textCol)
      .withColumnRenamed("score", "__s_in")
    val sGen = scoreDocsAgainst(candidates, general, idCol, textCol)
      .select(col("doc_id"), col("score").as("__s_gen"))
    sIn.join(sGen, Seq("doc_id"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__s_in") - col("__s_gen")).as("ml_diff"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * interpolated formulation of Chen & Goodman 1999 with a fixed
    * discount D): the ACTUAL smoothing production LMs shipped before
    * neural scoring, and a materially better perplexity filter than
    * [[scoreDocs]]'s Laplace — KN's continuation probability ranks a
    * word by how many DISTINCT contexts it follows, so boilerplate
    * bigrams ("of the") stop masking genuinely unpredictable text.
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/|bigram types|
    *
    * Self-scoring (model trained on the scored corpus) means every
    * history is attested, so P > 0 without any unknown-word backoff.
    * Every model statistic is an exact integer (counts, distinct
    * continuation/context counts, type count); P is ONE pinned float
    * expression over them, and the per-doc sum folds SORTED ln values
    * (the q60 rule) — gate rows emit micro-units.
    *
    * Scale shape: the [[scoreDocs]] plan plus one more vocab-bounded
    * aggregate (distinct left-contexts per w₂) — same
    * map-side-combined counts, same bigram-keyed scoring join.
    * @return per scoreable doc: (doc_id, n_bigrams, score) with
    *         score = −mean ln P (perplexity = e^score) */
  def scoreDocsKneserNey(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount ($discount) out of (0, 1)")
    val toks = df.select(col(idCol).as("doc_id"),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
    val bg = toks.select(col("doc_id"),
        explode(bigramsFromTokens(col("__tk"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val bgCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // c(w1·) and N1+(w1·) from one aggregate over the TYPE table
    // (c_h must count tokens, so it aggregates bg; n1f counts types)
    val histCounts = bg.groupBy(col("w1"))
      .agg(count(lit(1)).as("c_h"), countDistinct(col("w2")).as("n1f"))
    val contCounts = bgCounts.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1b")) // distinct left contexts of w2
    val typesDf = bgCounts.agg(count(lit(1)).as("__t"))
    val d = lit(discount)
    val p = greatest(col("c_bg").cast("double") - d, lit(0.0)) /
      col("c_h") +
      d * col("n1f") / col("c_h") * (col("n1b") / col("__t"))
    val scored = bg.join(bgCounts, Seq("w1", "w2"))
      .join(histCounts, Seq("w1"))
      .join(contCounts, Seq("w2"))
      .crossJoin(broadcast(typesDf))
      .select(col("doc_id"), log(p).as("lnp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-aggregate(sort_array(collect_list(col("lnp"))), lit(0.0),
          (acc, x) => acc + x) / count(lit(1))).as("score"))
      .localCheckpoint(eager = true)
    bgCounts.unpersist()
    bg.unpersist()
    scored
  }
}
