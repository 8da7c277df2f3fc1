package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical feature encoders for training-table preparation — the
  * two standard high-cardinality encodings that replace one-hot when
  * the category count is unbounded (user ids, domains, SKUs):
  *
  *  - frequency encoding: category → its share of the table;
  *  - target (mean) encoding with additive smoothing (Micci-Barreca,
  *    SIGKDD Explorations 2001): enc = (Σy + m·μ) / (n + m), shrinking
  *    rare categories toward the global mean μ so they don't memorize
  *    noise.
  *
  * Scale shape: one partial-aggregated groupBy on the category plus a
  * broadcast single-row global aggregate — no second pass over the
  * data; the encoder table is then a broadcast join back onto the
  * training table at feature-materialization time. Determinism: with
  * integer targets (cents, counts) every output is integer sums
  * composed through the same two divisions on both engines, so the
  * doubles are bit-identical and the encoders oracle-check exactly. */
object FeatureEncoding {

  /** (category, cnt, freq) — freq = cnt / N as one exact division. */
  def frequencyEncode(df: DataFrame, catCol: String): DataFrame = {
    val counts = df.groupBy(col(catCol)).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__n"))
    counts.crossJoin(broadcast(total))
      .select(col(catCol), col("cnt"),
        (col("cnt").cast("double") / col("__n")).as("freq"))
  }

  /** (category, cnt, sum_y, enc) — smoothed mean encoding of an
    * integer-valued target column. `smoothing` is the pseudo-count m
    * (how many global-mean observations a category must outweigh). */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Int = 8): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0 (got $smoothing)")
    val agg = df.filter(col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("cnt"), sum(col(targetCol)).as("sum_y"))
    val global = agg.agg(sum(col("sum_y")).as("__ts"),
      sum(col("cnt")).as("__tc"))
    val mu = col("__ts").cast("double") / col("__tc").cast("double")
    agg.crossJoin(broadcast(global))
      .select(col(catCol), col("cnt"), col("sum_y"),
        ((col("sum_y").cast("double") + lit(smoothing.toDouble) * mu)
          / (col("cnt") + lit(smoothing.toLong)).cast("double"))
          .as("enc"))
  }
}
