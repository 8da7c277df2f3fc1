package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** BPE merge training (Sennrich et al. 2016) over a corpus — the
  * tokenizer-training step of an LLM data pipeline.
  *
  * Scale shape, stated honestly: the only corpus-scale work is ONE
  * hash-aggregate that collapses the corpus to its distinct-word
  * frequency table (shuffle = one row per distinct word, never the
  * token stream; `minFreq` caps the long junk tail, standard
  * practice). The merge loop itself runs on the driver over that
  * vocab-bounded table — pair statistics are per-word and
  * frequency-weighted, so a 100 TB corpus and a 100 GB corpus with the
  * same vocabulary train in the same loop time. Distributing the loop
  * would shuffle the vocab numMerges times to save memory the vocab
  * doesn't need (10⁶ words ≈ tens of MB); this is the same judgment
  * call as k-means' driver-held centroids.
  *
  * Determinism: merge ties break on (count desc, left asc, right asc),
  * so the learned merge list is unique for a given corpus. Not
  * oracle-checked — numMerges chained dependent aggregates are not one
  * SQL query; the merge list and the encoder are pinned by spec on the
  * classic low/lower/newest/widest fixture.
  */
object BpeTrainer {

  /** End-of-word marker kept as its own symbol (the Sennrich
    * formulation), so learned merges distinguish word-final units. */
  val EndOfWord = "</w>"

  /** Corpus word-frequency table: (w, freq). The one corpus-scale pass. */
  def wordFreq(df: DataFrame, textCol: String, minFreq: Long = 1L): DataFrame =
    df.select(explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
        .as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)

  private def toSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndOfWord

  /** One left-to-right non-overlapping merge application. */
  private[graft] def mergeOnce(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn up to `numMerges` merges from a (word, freq) table (stops
    * early when no pair occurs twice). Pure and deterministic. */
  def trainFromFreq(freq: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var seqs = freq.toVector.sortBy(_._1).map { case (w, f) => (toSymbols(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      // single O(P) pass for the argmax — sorting the pair map every
      // round would cost O(P log P) × numMerges for one head
      val best =
        if (counts.isEmpty) None
        else Some(counts.minBy { case ((a, b), c) => (-c, a, b) })
          .filter(_._2 >= 2)
      best match {
        case None => done = true
        case Some((pair, _)) =>
          merges += pair
          seqs = seqs.map { case (syms, f) => (mergeOnce(syms, pair), f) }
      }
      round += 1
    }
    merges.result()
  }

  /** Train from a corpus: the distributed word-frequency pass + the
    * driver-side merge loop. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 1L): Seq[(String, String)] = {
    val wf = wordFreq(df, textCol, minFreq)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromFreq(wf, numMerges)
  }

  /** Encode one word with a learned merge list (applied in order). */
  def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toSymbols(w))(mergeOnce)

  /** Distributed encoding: (w, tokens, n_tokens) for every distinct
    * corpus word. Downstream joins this vocab table against the
    * exploded token stream (a vocab-sized build side) to get per-doc
    * BPE token counts without re-encoding per occurrence.
    *
    * The encoder is the codegen'd
    * [[graft.expressions.BpeEncodeExpression]] (retiring the repo's
    * last Scala UDF): one expression carrying the merge dict as a
    * reference object, semantics fuzz-pinned against [[encodeWord]]
    * in BpeSpec. Chaining numMerges higher-order Column transforms
    * would blow up the plan instead; and either way this runs over
    * the DISTINCT-word table only — never the corpus token stream,
    * which is reached by join. */
  def encodeVocab(spark: SparkSession, words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val enc = graft.expressions.BpeUtil.Encoder(merges.toVector)
    // withColumn (not select): extra caller columns ride along, so a
    // (w, freq) table encodes without a join back
    words
      .withColumn("tokens",
        C(graft.expressions.BpeEncodeExpression(E(col("w")), enc)))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Per-doc BPE token count: explode doc words, join the encoded
    * vocab (word-keyed equi-join; AQE broadcasts it when it fits). */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    // persisted: the exploded word stream feeds both the distinct-word
    // vocab build and the join probe side — uncached, the corpus regex
    // normalize + explode would run twice; released once the
    // (per-doc-sized) result is materialized
    val words = df.select(col(idCol),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val vocab = encodeVocab(spark, words.select(col("w")).distinct(), merges)
      .select(col("w"), col("n_tokens"))
    val result = words.join(vocab, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n_tokens")).as("n_bpe_tokens"),
        count(lit(1)).as("n_words"))
      .localCheckpoint(eager = true)
    words.unpersist()
    result
  }
}
