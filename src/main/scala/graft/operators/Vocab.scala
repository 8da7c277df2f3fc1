package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Vocabulary construction and out-of-vocabulary profiling (north-star
  * extension): the tokenizer-prep step of a training-data pipeline —
  * build a frequency-ranked vocabulary over the corpus, then measure
  * per-document OOV rates against it (the standard proxy for "will the
  * tokenizer shatter this document into bytes").
  *
  * Scale shape: vocabulary = one partial+final hash-aggregate over
  * tokens (shuffle carries one row per DISTINCT token, never the token
  * stream) followed by a driver-bounded top-V (TakeOrderedAndProject —
  * V rows per partition, V rows collected). OOV scoring = a broadcast
  * left join of the V-row vocabulary against the exploded token stream
  * and one per-doc aggregate. Nothing in either pass shuffles document
  * text.
  */
object Vocab {

  /** Top-`vocabSize` tokens by frequency: (token, tf), deterministic
    * under ties via (tf desc, token asc). */
  def topVocab(df: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    df.select(explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
        .as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(vocabSize)
  }

  /** Per-document OOV profile against `vocab` (any frame with a
    * `token` column, e.g. topVocab's output): (idCol, n_tokens, n_oov,
    * oov_rate). The rate is an integer ratio — partition-order
    * independent, so it oracle-compares exactly. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
        .as("token"))
    toks.join(broadcast(vocab.select(col("token"), lit(1).as("__in"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }
}
