package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus snapshot diff (north-star extension): classify every
  * document across two corpus snapshots as added / removed / changed /
  * unchanged by content fingerprint — the audit a pipeline publishes
  * between crawl refreshes ("what did this snapshot do to my training
  * set"), and the input to incremental downstream reprocessing (only
  * 'added' and 'changed' docs need re-scoring/re-dedup).
  *
  * Scale shape: both sides collapse to (id, 16-hex md5 fingerprint)
  * map-side — document TEXT never shuffles — then one full-outer
  * equi-join on the id (uniform keys, skew-free) and a map-only CASE.
  * The same fingerprint normalization as exact dedup
  * (TextAnalysis.fingerprint), so 'unchanged' here means exactly
  * "exact-dedup equivalent". */
object CorpusDiff {

  /** One row per id present in either snapshot:
    * (idCol, old_fp, new_fp, status). */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("old_fp"))
    val n = newDf.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged"))
  }

  /** Per-status census of a diff: (status, n_docs). */
  def summary(d: DataFrame): DataFrame =
    d.groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("status"))

  /** Jensen–Shannon divergence between two corpora's token
    * distributions (Lin 1991) — the drift metric a pipeline watches
    * between crawl snapshots or data-mix revisions: 0 for identical
    * distributions, ln 2 for disjoint support, symmetric and always
    * finite (unlike KL). Computed over the top-`k` tokens by combined
    * frequency plus ONE aggregate tail bucket — the only affordable
    * shape at 100 TB (the full vocabulary is corpus-sized, but the
    * head dominates the divergence and the tail folds into a single
    * exactly-counted residual; the reported value is exactly
    * JSD of the (k+1)-bucket coarsening, a standard lower bound of
    * the full-vocabulary JSD by the log-sum inequality).
    *
    * Determinism: all counts exact BIGINTs; each p/q is ONE division
    * of exact integers; the 2(k+1) p·ln(p/m) terms fold in SORTED
    * order (q60 rule) — gate rows emit jsd micro-rounded. Zero-count
    * sides contribute exact-0 terms (never 0·ln 0). Both corpora must
    * be non-empty (a NaN propagates loudly otherwise, by design).
    *
    * Scale: one token hash-aggregate per side (shuffle carries one
    * row per DISTINCT token, map-side combined), one full-outer
    * equi-join on token, a driver-bounded top-k heap
    * (TakeOrderedAndProject), and constant-size final arithmetic.
    * Document text never shuffles.
    *
    * @return one row: (n_tokens_a, n_tokens_b, vocab_a, vocab_b,
    *         n_buckets, jsd) — jsd in nats over the k+1 buckets */
  def jsDivergenceTopK(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(TextAnalysis.alnumTokens(col(textCol)))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(out))
    jsDivergenceFromCounts(
      counts(a, "ca").join(counts(b, "cb"), Seq("token"), "full_outer"),
      k)
  }

  /** Counts-level entry of [[jsDivergenceTopK]] — the incremental-
    * maintenance path: feed a MAINTAINED (token, ca, cb) count table
    * (nulls allowed on either side; e.g. IncrementalAgg.mergeDelta
    * output full-outer-joined against a reference census) and get the
    * same one-row JSD — so a streaming/batch-refresh pipeline prices
    * drift per refresh without re-tokenizing either corpus. */
  def jsDivergenceFromCounts(countsTable: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, s"k ($k) out of [1, 100000]")
    val joined = countsTable
      .select(col("token"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val tot = joined.agg(
      coalesce(sum(col("ca")), lit(0L)).as("na"),
      coalesce(sum(col("cb")), lit(0L)).as("nb"),
      coalesce(sum(when(col("ca") > 0L, 1L).otherwise(0L)), lit(0L))
        .as("vocab_a"),
      coalesce(sum(when(col("cb") > 0L, 1L).otherwise(0L)), lit(0L))
        .as("vocab_b"))
    val top = joined
      .orderBy((col("ca") + col("cb")).desc, col("token"))
      .limit(k)
    val topSums = top.agg(
      coalesce(sum(col("ca")), lit(0L)).as("tca"),
      coalesce(sum(col("cb")), lit(0L)).as("tcb"),
      count(lit(1)).as("nbk"))
    val tail = tot.crossJoin(broadcast(topSums))
      .select((col("na") - col("tca")).as("ca"),
        (col("nb") - col("tcb")).as("cb"))
    val buckets = top.select(col("ca"), col("cb")).unionAll(tail)
      .crossJoin(broadcast(tot.select(col("na"), col("nb"))))
      .withColumn("pa", col("ca").cast("double") / col("na").cast("double"))
      .withColumn("qb", col("cb").cast("double") / col("nb").cast("double"))
      .withColumn("m", (col("pa") + col("qb")) / lit(2.0))
    val jsd = buckets
      .select(explode(array(
        when(col("ca") > 0L, col("pa") * log(col("pa") / col("m")))
          .otherwise(lit(0.0)),
        when(col("cb") > 0L, col("qb") * log(col("qb") / col("m")))
          .otherwise(lit(0.0)))).as("t"))
      .agg((aggregate(sort_array(collect_list(col("t"))), lit(0.0),
        (acc, x) => acc + x) * lit(0.5)).as("jsd"))
    // eagerly materialize the one-row result, then release the joined
    // counts cache — callers invoking this per refresh (q392 runs it
    // 3×) must not accrete session-lifetime MEMORY_ONLY blocks
    val out = tot.crossJoin(broadcast(topSums)).crossJoin(broadcast(jsd))
      .select(col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"),
        col("vocab_a"), col("vocab_b"),
        (col("nbk") + 1L).as("n_buckets"), col("jsd"))
      .localCheckpoint(true)
    joined.unpersist()
    out
  }
}
