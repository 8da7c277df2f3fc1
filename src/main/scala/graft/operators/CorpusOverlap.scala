package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Pairwise n-gram overlap between corpus slices (sources, dumps,
  * snapshots): for every pair of groups, how much of the smaller
  * side's distinct word-n-gram set the other side contains —
  * containment = |A∩B| / min(|A|,|B|). The corpus-analytics view
  * behind source-level contamination triage and mixture design
  * ("which crawls are near-copies of each other?"), complementing
  * q56's doc-level decontamination and q67's snapshot diff.
  *
  * Scale shape: the gram stream is the only corpus-sized stage —
  * (group, gram) pairs dedup'd by one distinct (map-side combined,
  * uniform gram keys). The pair join is an inverted-index self-join
  * keyed by gram: per-gram fan-out is bounded by (#groups choose 2) —
  * a few hundred for realistic source counts — INDEPENDENT of corpus
  * size, so no gram can create a quadratic-in-docs bucket (the same
  * boundedness argument as the q46 grid join, with groups in place of
  * cells). The (s1,s2) count aggregate is map-side combined into at
  * most #groups² cells.
  */
object CorpusOverlap {

  /** One row per overlapping group pair (s1 < s2):
    * (s1, s2, n_shared, n_s1, n_s2, containment). Pairs sharing no
    * gram are absent — at corpus scale materializing the zero matrix
    * is the caller's (cheap, #groups²) join. */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    // token array materialized at a projection boundary before the
    // lambda indexes into it (the O(len²) inline-split pitfall — see
    // LanguageModel.bigramsFromTokens)
    val toks = df.select(col(groupCol).as("src"),
        split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
      .filter(size(col("__tk")) >= n)
    val grams = toks.select(col("src"), explode(transform(
        sequence(lit(1), size(col("__tk")) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(o => element_at(col("__tk"), i + o)): _*)))
        .as("g"))
      .distinct() // (group, gram) set semantics
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val sizes = grams.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val pairs = grams.select(col("src").as("s1"), col("g"))
      .join(grams.select(col("src").as("s2"), col("g")), Seq("g"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_shared"))
    val out = pairs
      .join(sizes.select(col("src").as("s1"), col("n").as("n_s1")), Seq("s1"))
      .join(sizes.select(col("src").as("s2"), col("n").as("n_s2")), Seq("s2"))
      .select(col("s1"), col("s2"), col("n_shared"),
        col("n_s1"), col("n_s2"),
        (col("n_shared").cast("double") /
          least(col("n_s1"), col("n_s2")).cast("double"))
          .as("containment"))
      .localCheckpoint(eager = true)
    grams.unpersist()
    out
  }
}
