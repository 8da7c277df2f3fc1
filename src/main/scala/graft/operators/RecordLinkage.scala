package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage scoring (Fellegi & Sunter 1969) —
  * north-star extension: given CANDIDATE pairs (from any blocker —
  * [[Dedup.sortedNeighborhood]], an equality block, an LSH bucket
  * join), score each pair by summing per-field agreement weights and
  * classify against an upper/lower threshold into link / possible /
  * non-link.
  *
  * All weights are caller-supplied INTEGER milli-units (the log2
  * m/u-probability ratios a real deployment estimates via EM, here
  * pre-scaled ×1000 and rounded by the caller): the score is a plain
  * BIGINT sum, so classification is bit-exact, partition-independent,
  * and restatable in the DuckDB oracle — a float log-odds sum would
  * be order-dependent. Map-only over the pair table: the expensive
  * part of linkage is candidate generation, which stays in the
  * blocker; scoring adds no shuffle.
  */
object RecordLinkage {

  /** One comparison field: `agree` evaluates over the pair frame's
    * columns; a pair scores `matchMilli` (> 0) when it agrees,
    * `unmatchMilli` (< 0) when it does not. NULL agreement (either
    * side missing) scores 0 — the Fellegi–Sunter "no decision"
    * convention for missing fields. */
  final case class LinkField(name: String, agree: Column,
      matchMilli: Long, unmatchMilli: Long)

  /** Score + classify candidate pairs. Appends per-field agreement
    * flags (`<name>_agree`), the total `score_milli`, and `verdict`
    * ('link' when score ≥ upperMilli, 'nonlink' when < lowerMilli,
    * 'possible' between — the review band a human would triage). */
  def score(pairs: DataFrame, fields: Seq[LinkField],
      upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(lowerMilli <= upperMilli,
      s"lowerMilli ($lowerMilli) must be <= upperMilli ($upperMilli)")
    val flagged = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"${f.name}_agree", f.agree)
    }
    val scored = flagged.withColumn("score_milli",
      fields.map { f =>
        when(col(s"${f.name}_agree").isNull, lit(0L))
          .when(col(s"${f.name}_agree"), lit(f.matchMilli))
          .otherwise(lit(f.unmatchMilli))
      }.reduce(_ + _))
    scored.withColumn("verdict",
      when(col("score_milli") >= upperMilli, lit("link"))
        .when(col("score_milli") < lowerMilli, lit("nonlink"))
        .otherwise(lit("possible")))
  }
}
