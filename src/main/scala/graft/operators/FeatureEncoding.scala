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

  /** Signed hashing trick (Weinberger et al. 2009): token → bucket by
    * an md5-derived hash, with a second md5 nibble choosing the ±1
    * sign that keeps the inner-product estimate unbiased. Output is
    * the sparse (id, bucket, value) triple table — integer values,
    * ~min(nBuckets, vocab) rows per document, no vocabulary pass and
    * no driver state, which is the whole point of the trick at 100 TB
    * (contrast a fitted vocabulary index that must broadcast).
    * @return (id, bucket, value, n_tokens) */
  def hashingTrick(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive (got $nBuckets)")
    val toks = docs.select(col(idCol),
        explode(graft.functions.TextAnalysis
          .alnumTokens(col(textCol))).as("token"))
      .withColumn("__d", md5(col("token")))
    toks
      .withColumn("bucket",
        conv(substring(col("__d"), 1, 8), 16, 10).cast("long")
          % nBuckets)
      .withColumn("__sign",
        when(conv(substring(col("__d"), 9, 1), 16, 10).cast("long")
          % 2 === 0, 1L).otherwise(-1L))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sign")).as("value"),
        count(lit(1)).as("n_tokens"))
  }
}
