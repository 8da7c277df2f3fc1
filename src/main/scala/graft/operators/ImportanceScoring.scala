package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): rank raw-corpus documents by how target-like their
  * n-gram distribution is, then keep the top slice. The log importance
  * weight of a doc under bag-of-bigrams generative models is
  *
  *   log w(x) = Σ_{bigram occurrences b ∈ x} [ln p_t(b) − ln p_r(b)]
  *
  * with Laplace-smoothed probabilities p(b) = (c(b)+1)/(N+V) estimated
  * from the target subset (p_t) and the full raw corpus (p_r), over the
  * raw corpus's bigram vocabulary V. (The paper hashes features into
  * buckets; with exact bigram keys the estimator is the same — hashing
  * is only a memory bound, and the count tables here are already
  * shuffle-distributed, so exact keys are the better engine fit.)
  *
  * Scale shape (mirrors LanguageModel.scoreDocs): one bigram stream,
  * persisted once; two map-side-combined count aggregates over uniform
  * bigram keys (target counts ⊆ raw counts); one fixed-width scalar
  * frame (N_t, N_r, V) broadcast-crossed; scoring is a join keyed by
  * the bigram and a per-doc aggregate with doc-length-bounded state.
  * Nothing materializes on the driver.
  *
  * Determinism: the per-doc sum folds SORTED ln-ratio values
  * (collect → sort → in-order fold), the q60/q120 bit-identical-fold
  * pattern, so the only cross-engine noise is libm's 1-ulp `ln` —
  * far inside the oracle's 10-significant-digit tolerance.
  */
object ImportanceScoring {

  /** Per-scoreable-doc (≥ 1 bigram) importance scores:
    * (doc_id, n_bigrams, logw). `isTarget` is a row predicate over
    * `df` selecting the target-distribution subset (e.g.
    * col("lang") === "en", or a high-quality source flag). Positive
    * logw ⇒ the doc looks more like the target corpus than the raw
    * average; select by threshold or top-k (`selectTopK`). */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    // token array materialized once per row before lambdas index into
    // it (the O(len²) inline-expression pitfall — see LanguageModel)
    val toks = df.select(col(idCol).as("doc_id"),
      isTarget.as("__t"),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
    val bg = toks.select(col("doc_id"), col("__t"),
        explode(LanguageModel.bigramsFromTokens(col("__tk"))).as("b"))
      .select(col("doc_id"), col("__t"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val rawCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_r"))
    val targetCounts = bg.filter(col("__t"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_t"))
    // N_r and N_t in ONE pass; V = raw bigram vocab = |rawCounts|
    val totals = bg.agg(count(lit(1)).as("__nr"),
      count(when(col("__t"), lit(1))).as("__nt"))
    val vocab = rawCounts.agg(count(lit(1)).as("__v"))
    val lnr = log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) /
        (col("__nt") + col("__v"))) -
      log((col("c_r") + lit(1.0)) / (col("__nr") + col("__v")))
    val scored = bg.join(rawCounts, Seq("w1", "w2"))
      .join(targetCounts, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), lnr.as("lnr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(sort_array(collect_list(col("lnr"))), lit(0.0),
          (acc, x) => acc + x).as("logw"))
      .localCheckpoint(eager = true)
    bg.unpersist()
    scored
  }

  /** The resampling half: keep the k most target-like docs. Total
    * order (logw DESC, doc_id ASC) — the id tiebreak makes the cut
    * deterministic; Spark plans orderBy+limit as a distributed
    * TakeOrdered (per-partition heaps + driver merge of k rows), never
    * a global sort. NOTE: a cross-ENGINE gate must select by a
    * threshold inside a measured score gap instead (float ranks are
    * bit-stable within one engine, not between engines). */
  def selectTopK(scores: DataFrame, k: Int): DataFrame =
    scores.orderBy(col("logw").desc, col("doc_id")).limit(k)
}
