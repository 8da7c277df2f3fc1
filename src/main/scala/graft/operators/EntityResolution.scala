package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end entity resolution — the "same real-world thing, different
  * spellings" pipeline a training-data (or CRM/MDM) deployment runs:
  *
  *   1. MATCH: candidate pairs within `maxDist` edit distance via the
  *      FastSS deletion-neighborhood join ([[FuzzyJoin.selfJoin]] —
  *      candidates come from shared deletion variants, never an
  *      all-pairs compare);
  *   2. CLUSTER: transitive closure of the match graph via
  *      [[Dedup.connectedComponents]] (pointer jumping, with the
  *      large/small-star auto-switch at scale) — A≈B and B≈C put A and
  *      C in one entity even when A and C don't match directly;
  *   3. SURVIVE: every row labeled with its entity id (the cluster's
  *      minimum member id — deterministic); unmatched rows are their
  *      own singleton entities.
  *
  * The same composition shape as [[Dedup.dropNearDups]], at identity
  * granularity instead of document granularity. Each stage is the
  * audited plan of its operator; the whole pipeline is oracle-checked
  * end to end by q123 (levenshtein pair enumeration + recursive-CTE
  * closure on the DuckDB side).
  *
  * Output: the input columns plus `entity_id`. */
object EntityResolution {

  def resolve(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int = 1): DataFrame = {
    val pairs = FuzzyJoin.selfJoin(
      df.select(col(idCol), col(nameCol)), idCol, nameCol, maxDist)
    val labels = Dedup.connectedComponents(pairs)
      .select(col("node").as(idCol), col("cluster").as("__ent"))
    df.join(labels, Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("__ent"), col(idCol)))
      .drop("__ent")
  }
}
