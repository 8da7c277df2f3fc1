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
}
