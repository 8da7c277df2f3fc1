package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Unigram language-model segmentation (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model's INFERENCE
  * half): given a piece vocabulary with log-probabilities, the best
  * segmentation of a word maximizes Σ ln p(piece) over all ways to
  * split it, found by Viterbi DP over character positions. This
  * completes the tokenization family beside BPE (merge-rule greedy)
  * and WordPiece (longest-match greedy): unigram is the
  * probabilistically-principled segmenter, and its best-path score
  * is the corpus statistic regularization sampling is built on.
  *
  * The vocabulary here is frequency-derived (top-V word-internal
  * substrings by corpus-weighted count, plus every single character
  * as the unreachability fallback — the standard seed vocabulary;
  * the full Kudo trainer prunes this by EM, whose float fixed-point
  * is not a cross-engine contract, so the SEED model is the
  * oracle-checkable surface and the operator takes any (piece, cnt)
  * table callers train elsewhere).
  *
  * Scale: piece counting is one explode + hash aggregate (one row
  * per DISTINCT piece shuffles); the vocabulary is model-sized
  * (V + alphabet rows) and collects to the driver like the IVF
  * centroid set; scoring is a map-only typed pass — O(len ·
  * maxPieceLen) per word, words deduped first so each DISTINCT word
  * pays the DP once.
  */
object UnigramLm {

  /** Best-segmentation log-probability of `word` under the piece
    * log-prob table — Viterbi over end positions: dp(i) = max over
    * piece lengths l of dp(i−l) + lnp(word[i−l..i)). Returns
    * -Infinity iff some prefix is unreachable (cannot happen when
    * every single character is in the vocabulary). */
  def viterbi(word: String, lnp: collection.Map[String, Double],
      maxPieceLen: Int): Double = {
    val L = word.length
    val dp = Array.fill(L + 1)(Double.NegativeInfinity)
    dp(0) = 0.0
    var i = 1
    while (i <= L) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        if (dp(i - l) != Double.NegativeInfinity) {
          lnp.get(word.substring(i - l, i)) match {
            case Some(p) =>
              val cand = dp(i - l) + p
              if (cand > dp(i)) dp(i) = cand
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    dp(L)
  }

  /** Best segmentation — the PIECES themselves (what a tokenizer
    * emits), via Viterbi with backpointers. Ties on the dp value
    * break toward the LONGEST last piece (deterministic within an
    * engine; gate rows pin the SCORE, which ties can never flip —
    * see q398). Unreachable words (a character outside the
    * vocabulary) return Nil; seed vocabularies with the single-char
    * fallback never produce one. */
  def segment(word: String, lnp: collection.Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val L = word.length
    val dp = Array.fill(L + 1)(Double.NegativeInfinity)
    val back = Array.fill(L + 1)(0)
    dp(0) = 0.0
    var i = 1
    while (i <= L) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        if (dp(i - l) != Double.NegativeInfinity) {
          lnp.get(word.substring(i - l, i)) match {
            case Some(p) =>
              val cand = dp(i - l) + p
              if (cand > dp(i) || (cand == dp(i) && l > back(i))) {
                dp(i) = cand
                back(i) = l
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (dp(L) == Double.NegativeInfinity) Nil
    else {
      var pos = L
      var acc: List[String] = Nil
      while (pos > 0) {
        val l = back(pos)
        acc = word.substring(pos - l, pos) :: acc
        pos -= l
      }
      acc
    }
  }

  /** Corpus-weighted counts of word-internal substrings (lengths
    * 1..maxPieceLen): one row per DISTINCT piece, counting every
    * occurrence in every word times the word's corpus frequency.
    * Input: (word, freq). */
  def pieceCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 8,
      s"maxPieceLen ($maxPieceLen) out of [1, 8]")
    val pieces = (1 to maxPieceLen).map { l =>
      words.select(col("freq"),
          explode(when(length(col("word")) >= l,
            transform(sequence(lit(1), length(col("word")) - (l - 1)),
              i => col("word").substr(i, lit(l))))
            .otherwise(array().cast("array<string>"))).as("piece"))
    }.reduce(_ unionAll _)
    pieces.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
  }

  /** Seed vocabulary: top-`vocabSize` pieces by (cnt desc, piece asc)
    * plus every single-character piece (the fallback that keeps all
    * words segmentable). */
  def seedVocab(counts: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 100000,
      s"vocabSize ($vocabSize) out of [1, 100000]")
    counts.orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      .unionAll(counts.filter(length(col("piece")) === 1))
      .distinct()
  }

  /** log(Σ exp) without overflow/underflow — the forward-backward
    * accumulator. Empty input -> -Infinity. */
  private def logSumExp(xs: Seq[Double]): Double = {
    val finite = xs.filter(_ != Double.NegativeInfinity)
    if (finite.isEmpty) Double.NegativeInfinity
    else {
      val m = finite.max
      m + math.log(finite.map(x => math.exp(x - m)).sum)
    }
  }

  /** Per-occurrence posterior terms of one word under the model — the
    * shared core of the E-step entries: each in-vocabulary piece
    * occurrence (start j, length l) yields f·exp(α(j)+lnp+β(j+l)−z).
    * Terms iterate in (j asc, l asc) order and are all strictly
    * positive; an unreachable word (z = −∞) yields nothing. */
  private def posteriorTerms(w: String, f: Long,
      lnp: collection.Map[String, Double],
      maxPieceLen: Int): Iterator[(String, Double)] = {
    val L = w.length
    val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
    val beta = Array.fill(L + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (i <- 1 to L)
      alpha(i) = logSumExp((1 to math.min(maxPieceLen, i)).flatMap {
        l => lnp.get(w.substring(i - l, i)).map(alpha(i - l) + _)
      })
    beta(L) = 0.0
    for (j <- (L - 1) to 0 by -1)
      beta(j) = logSumExp(
        (1 to math.min(maxPieceLen, L - j)).flatMap { l =>
          lnp.get(w.substring(j, j + l)).map(_ + beta(j + l))
        })
    val z = alpha(L)
    if (z == Double.NegativeInfinity) Iterator.empty
    else (for {
      j <- 0 until L
      l <- 1 to math.min(maxPieceLen, L - j)
      p <- lnp.get(w.substring(j, j + l))
    } yield (w.substring(j, j + l),
      f * math.exp(alpha(j) + p + beta(j + l) - z))).iterator
  }

  /** Expected piece counts under the CURRENT model — the E-step of the
    * Kudo 2018 unigram-LM trainer: per word, forward-backward over
    * segmentations (log-space, so long words can't underflow) gives
    * each piece occurrence's posterior α(start)+lnp+β(end)−α(L); the
    * corpus expectation weights by word frequency and aggregates per
    * piece with one hash aggregate. Map-only per word; the model
    * travels in the closure like the Viterbi scorer's.
    *
    * This native-sum form stays spec-only (its float fixed point is
    * partition-order-dependent); the oracle-gated E-step surface is
    * [[emExpectedCountsSorted]] (q405), which folds the SAME terms
    * deterministically. */
  def emExpectedCounts(words: DataFrame, lnp: Map[String, Double],
      maxPieceLen: Int): DataFrame = {
    import words.sparkSession.implicits._
    words.select(col("word"), col("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) => posteriorTerms(w, f, lnp, maxPieceLen) }
      .toDF("piece", "exp_count")
      .groupBy(col("piece"))
      .agg(sum(col("exp_count")).as("exp_count"))
  }

  /** [[emExpectedCounts]] with a DETERMINISTIC per-piece fold — the
    * oracle-checkable E-step (q405): instead of an order-dependent
    * float sum, each piece's posterior terms are collected, sorted,
    * and folded in ascending order, so the expected count is the same
    * double in any engine computing the same terms (the q60
    * sorted-fold discipline; terms are strictly positive, so the 0.0
    * fold seed is exact). Pass a BOUNDED (top-k) word table: each
    * piece's packed list holds one entry per occurrence across the
    * given words — the caller's k bounds it, the shape q366-style
    * rows rely on. */
  def emExpectedCountsSorted(words: DataFrame, lnp: Map[String, Double],
      maxPieceLen: Int): DataFrame = {
    import words.sparkSession.implicits._
    words.select(col("word"), col("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) => posteriorTerms(w, f, lnp, maxPieceLen) }
      .toDF("piece", "t")
      .groupBy(col("piece"))
      .agg(count(lit(1)).as("n_occ"),
        aggregate(sort_array(collect_list(col("t"))), lit(0.0),
          (acc, x) => acc + x).as("exp_count"))
  }

  /** One full EM iteration: E-step expected counts, M-step renormalize
    * into a new log-probability table (driver-collected — the model is
    * vocabulary-sized). Corpus log-likelihood Σ freq·ln Z is
    * non-decreasing across iterations (the EM guarantee, spec-pinned). */
  def emIteration(words: DataFrame, lnp: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val counts = emExpectedCounts(words, lnp, maxPieceLen)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val total = counts.map(_._2).sum
    counts.map { case (p, c) => p -> math.log(c / total) }.toMap
  }

  /** Total segmentation log-probability ln Z of one word — the
    * forward pass alone (the quantity EM ascends, per word). */
  def wordLogZ(w: String, lnp: collection.Map[String, Double],
      maxPieceLen: Int): Double = {
    val L = w.length
    val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (i <- 1 to L)
      alpha(i) = logSumExp((1 to math.min(maxPieceLen, i)).flatMap {
        l => lnp.get(w.substring(i - l, i)).map(alpha(i - l) + _)
      })
    alpha(L)
  }

  /** Corpus log-likelihood Σ freq·ln Z(word) under the model (Z = the
    * total probability of all segmentations — the quantity EM
    * ascends). Driver-side over a collected word table (spec use). */
  def corpusLogLikelihood(words: Seq[(String, Long)],
      lnp: Map[String, Double], maxPieceLen: Int): Double =
    words.map { case (w, f) => f * wordLogZ(w, lnp, maxPieceLen) }.sum

  /** One full EM iteration with DETERMINISTIC arithmetic order — the
    * oracle-checkable M-step over [[emExpectedCountsSorted]]'s
    * E-step (q412): per-piece expected counts fold term-sorted (the
    * q405 contract), the normalizer folds the counts in
    * piece-ascending order, and the new model is ln(c/total) per
    * piece — the same doubles in any engine that replays the same
    * folds. Pieces with no occurrence in `words` drop out of the
    * model (their expected count is exactly zero); every character
    * of every given word occurs, so all given words remain
    * segmentable. The word table must be BOUNDED (top-k) like
    * emExpectedCountsSorted's. */
  def emIterationSorted(words: DataFrame, lnp: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val counts = emExpectedCountsSorted(words, lnp, maxPieceLen)
      .select(col("piece"), col("exp_count"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(_._1)
    val total = counts.foldLeft(0.0)(_ + _._2)
    counts.map { case (p, c) => p -> math.log(c / total) }.toMap
  }

  /** One SentencePiece-style vocabulary PRUNE round — the other half
    * of the Kudo 2018 training alternation q412 left open (real
    * unigram-LM training alternates EM with pruning: drop the pieces
    * contributing least, re-normalize, re-EM): from the E-step's
    * expected counts under the current model, KEEP the top
    * `keepTopK` multi-character pieces by (expected count desc,
    * piece asc) plus EVERY single-character piece — the
    * segmentability floor; dropping a character could make words
    * unreachable, which is why SentencePiece protects them — then
    * M-step-renormalize over the survivors in deterministic
    * arithmetic order (per-piece term-sorted folds from
    * [[emExpectedCountsSorted]], normalizer folded piece-ascending,
    * ln(c/total) — the q412 fold discipline, so the pruned model is
    * the same doubles in any engine replaying the folds). Expected-
    * count ranking is the standard cheap surrogate for Kudo's exact
    * leave-one-out likelihood loss: a piece with negligible expected
    * mass cannot carry likelihood. Word table must be BOUNDED
    * (top-k) like emExpectedCountsSorted's. */
  def pruneIterationSorted(words: DataFrame, lnp: Map[String, Double],
      maxPieceLen: Int, keepTopK: Int): Map[String, Double] = {
    require(keepTopK >= 1 && keepTopK <= 100000,
      s"keepTopK ($keepTopK) out of [1, 100000]")
    val counts = emExpectedCountsSorted(words, lnp, maxPieceLen)
      .select(col("piece"), col("exp_count"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val multi = counts.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(keepTopK)
    val singles = counts.filter(_._1.length == 1)
    val survivors = (multi ++ singles).sortBy(_._1)
    val total = survivors.foldLeft(0.0)(_ + _._2)
    survivors.map { case (p, c) => p -> math.log(c / total) }.toMap
  }

  /** End-to-end scoring of the corpus' most frequent words: tokenize,
    * count pieces, build the seed vocabulary, and Viterbi-score the
    * top-`topWords` words. Output one row per scored word:
    * (word, freq, n_chars, best_lnp) — best_lnp is the only float
    * (gate rows micro-round it; each dp value is a fixed-order sum of
    * ln terms, identical cross-engine up to libm ulps). */
  def segmentScores(docs: DataFrame, textCol: Column,
      maxPieceLen: Int = 4, vocabSize: Int = 500,
      topWords: Int = 100): DataFrame = {
    require(topWords >= 1 && topWords <= 100000,
      s"topWords ($topWords) out of [1, 100000]")
    import docs.sparkSession.implicits._
    val words = docs
      .select(explode(TextAnalysis.alnumTokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val vocabRows = seedVocab(pieceCounts(words, maxPieceLen), vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = vocabRows.map(_._2).sum
    val lnp = vocabRows
      .map { case (p, c) => p -> math.log(c.toDouble / total.toDouble) }
      .toMap
    // materialize BEFORE unpersisting: the returned frame still reads
    // the cached word table for the top-words pass
    val out = words.orderBy(col("freq").desc, col("word"))
      .limit(topWords)
      .as[(String, Long)]
      .map { case (w, f) =>
        (w, f, w.length, viterbi(w, lnp, maxPieceLen))
      }
      .toDF("word", "freq", "n_chars", "best_lnp")
      .localCheckpoint(true)
    words.unpersist()
    out
  }
}
