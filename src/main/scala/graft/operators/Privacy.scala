package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-release audits (Sweeney 2002 k-anonymity; Machanavajjhala
  * et al. 2007 l-diversity) — the checks a pipeline runs before
  * publishing a derived table: quasi-identifier combinations that
  * isolate fewer than k rows re-identify people; QI groups whose
  * sensitive attribute is near-constant leak it even at size ≥ k.
  * These are AUDITS (exact integer censuses that gate a release),
  * not anonymizers — generalize/suppress upstream and re-run.
  *
  * Scale: one hash aggregate keyed by the QI tuple (one row per
  * DISTINCT combination shuffles, map-side combined), then a
  * constant-size census. l-diversity's distinct count uses the
  * two-level (QI, sensitive) aggregate — never a countDistinct
  * expand.
  */
object Privacy {

  /** k-anonymity census over the quasi-identifier columns: one row —
    * (n_rows, n_groups, k, n_risky_groups, n_risky_rows,
    * min_group_size, max_group_size). A release is k-anonymous iff
    * n_risky_groups = 0. NULL QI values form their own group (NULL is
    * a visible value to a linker, not an absence). */
  def kAnonymityCensus(df: DataFrame, qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k ($k) must be >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_risky_groups"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("n_risky_rows"),
        min(col("__n")).as("min_group_size"),
        max(col("__n")).as("max_group_size"))
      .select(col("n_rows"), col("n_groups"), lit(k).as("k"),
        col("n_risky_groups"), col("n_risky_rows"),
        col("min_group_size"), col("max_group_size"))
  }

  /** Distinct-l-diversity census: per QI group the number of DISTINCT
    * sensitive values; groups below `l` leak the attribute. One row —
    * (n_groups, l, n_low_diversity_groups, n_exposed_rows,
    * min_diversity). Exposed rows = rows in below-l groups. */
  def lDiversityCensus(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: Column, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l ($l) must be >= 2")
    val per = df
      .groupBy(qiCols.map(col) :+ sensitiveCol.as("__s"): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__d"), sum(col("__n")).as("__rows"))
    per.agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_low_diversity_groups"),
        coalesce(sum(when(col("__d") < l, col("__rows")).otherwise(0L)),
          lit(0L)).as("n_exposed_rows"),
        min(col("__d")).as("min_diversity"))
      .select(col("n_groups"), lit(l).as("l"),
        col("n_low_diversity_groups"), col("n_exposed_rows"),
        col("min_diversity"))
  }
}
