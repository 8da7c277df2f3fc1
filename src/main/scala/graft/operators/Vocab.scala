package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Zipf power-law fit (Zipf 1949): OLS slope of ln f against ln r
    * over the top `nRanks` rank-frequency points — the corpus
    * diagnostic beside Heaps' law (vocab growth) and Good–Turing
    * (unseen mass): natural corpora slope ≈ −1; a much flatter slope
    * flags template/boilerplate floods, a steeper one vocabulary
    * collapse.
    *
    * Determinism: ranks tie-break by token; the top-N cut is a
    * TakeOrdered (no global window — the vocab table never sorts
    * whole); every log-sum folds a SORTED bounded list (q60 rule), so
    * slope/intercept are reproducible doubles whose only cross-engine
    * hazard is libm last-ulps — gate rows emit micro-units.
    * Scale: one token-count aggregate + a top-nRanks heap; the fit
    * runs on ≤ nRanks rows.
    *
    * @return one row: (n, slope, intercept) — slope of ln f on ln r */
  def zipfSlope(df: DataFrame, textCol: String, nRanks: Int): DataFrame = {
    require(nRanks >= 3 && nRanks <= 10000,
      s"nRanks ($nRanks) out of [3, 10000]")
    val top = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok0"))
      .select(lower(col("tok0")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(nRanks)
    // rank without a window: the ≤ nRanks survivors collect into one
    // sorted array ((-f, tok) ascending = (f desc, tok asc)) and
    // posexplode — bounded by contract
    val ranked = top
      .agg(sort_array(collect_list(struct((-col("f")).as("nf"),
        col("tok").as("tok")))).as("__a"))
      .select(posexplode(col("__a")))
      .select((col("pos") + 1).cast("double").as("r"),
        (-col("col.nf")).cast("double").as("f"))
      .select(log(col("r")).as("x"), log(col("f")).as("y"))
    val fold = (c: Column) =>
      aggregate(sort_array(c), lit(0.0), _ + _)
    ranked
      .agg(count(lit(1)).as("n"),
        fold(collect_list(col("x"))).as("sx"),
        fold(collect_list(col("y"))).as("sy"),
        fold(collect_list(col("x") * col("y"))).as("sxy"),
        fold(collect_list(col("x") * col("x"))).as("sxx"))
      .select(col("n"),
        // n < 2 ⇒ the OLS denominator is exactly 0 (one point fits no
        // line): emit NULL explicitly. Spark's Divide yields NULL on
        // 0/0 but DuckDB IEEE semantics yield NaN/Inf, so a degenerate
        // one-token corpus would diverge cross-engine without this
        // guard (require(nRanks) bounds the PARAMETER, not the actual
        // surviving rank count). Oracles using this operator mirror
        // the CASE.
        when(col("n") >= 2,
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("sx"), col("sy"))
      .select(col("n"),
        col("slope"),
        when(col("n") >= 2,
          (col("sy") - col("slope") * col("sx")) / col("n"))
          .as("intercept"))
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

  /** χ² feature selection per class (the classic Yang & Pedersen 1997
    * token–category test): doc-level presence contingency (a =
    * class∧token, b/c/d derived from df, class size, N — all exact
    * BIGINTs) and χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) as ONE double
    * expression both engines derive identically; top `topK` tokens
    * per class on a (χ² desc, token) total order. Scale: presence is
    * one distinct over exploded tokens; everything after is
    * vocab×class-sized. The per-class ranking window partitions by
    * class — parallel, never a global sort.
    * @return (class, token, a, df_t, n_c, n_docs, chi2, rank) */
  def chi2FeatureSelection(df: DataFrame, idCol: String,
      textCol: String, classCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1 (got $topK)")
    val pres = df.select(col(idCol).as("__id"),
        col(classCol).as("cls"),
        explode(TextAnalysis.alnumTokens(col(textCol))).as("token"))
      .distinct()
    val nDocs = df.select(col(idCol)).distinct().count()
    val byClass = df.groupBy(col(classCol).as("cls"))
      .agg(countDistinct(col(idCol)).as("n_c"))
    val dfT = pres.groupBy(col("token"))
      .agg(countDistinct(col("__id")).as("df_t"))
    val a = pres.groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("a"))
    def d(c: Column): Column = c.cast("double")
    val scored = a.join(byClass, Seq("cls")).join(dfT, Seq("token"))
      .withColumn("__b", col("df_t") - col("a"))
      .withColumn("__c", col("n_c") - col("a"))
      .withColumn("__d",
        lit(nDocs) - col("df_t") - col("n_c") + col("a"))
      .withColumn("chi2",
        // a margin of zero (token in every doc / class empty) makes
        // the test undefined — pin to 0 (non-informative), not 0/0
        when((col("a") + col("__b")) * (col("__c") + col("__d"))
          * (col("a") + col("__c")) * (col("__b") + col("__d")) === 0,
          lit(0.0))
          .otherwise(d(lit(nDocs)) *
            (d(col("a")) * d(col("__d")) - d(col("__b")) * d(col("__c")))
            * (d(col("a")) * d(col("__d")) - d(col("__b")) * d(col("__c")))
            / (d(col("a") + col("__b")) * d(col("__c") + col("__d"))
              * d(col("a") + col("__c")) * d(col("__b") + col("__d")))))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("chi2").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("cls"), col("token"), col("a"), col("df_t"),
        col("n_c"), lit(nDocs).as("n_docs"), col("chi2"), col("rank"))
  }

  /** Skip-gram co-occurrence with lift: token pairs within a forward
    * window of `win` positions (canonicalized unordered), their exact
    * counts, each side's unigram count, and lift = c_xy·N / (c_x·c_y)
    * — the PMI argument WITHOUT the log, so the only double is one
    * identically-derived ratio. All win lead() columns come from ONE
    * window pass (one sort-shuffle, not one per offset; linear in
    * tokens, never a positional self-join); the unigram table is
    * vocab-sized and shuffle-joined, and n_tokens = Σ unigram counts
    * (derived, no extra corpus scan or eager action). The token
    * stream is persisted across its two consumers (unigrams, pairs)
    * so the corpus is tokenized once. Top `topK` by (c_xy desc, w1,
    * w2) for bounded output.
    * @return (w1, w2, c_xy, c_x, c_y, n_tokens, lift) */
  def cooccurrence(df: DataFrame, idCol: String, textCol: String,
      win: Int, topK: Int): DataFrame = {
    require(win >= 1 && topK >= 1, s"win=$win topK=$topK must be >= 1")
    val toks = df.select(col(idCol).as("__id"),
        posexplode(TextAnalysis.alnumTokens(col(textCol)))
          .as(Seq("pos", "token")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("n_tokens"))
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    val led = toks.select(col("token") +: (1 to win).map(k =>
      lead(col("token"), k).over(w).as(s"__n$k")): _*)
    val pairs = led
      .select(col("token"), explode(array(
        (1 to win).map(k => col(s"__n$k")): _*)).as("__nxt"))
      .filter(col("__nxt").isNotNull)
      .select(least(col("token"), col("__nxt")).as("w1"),
        greatest(col("token"), col("__nxt")).as("w2"))
    pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .join(uni.select(col("token").as("w1"), col("c").as("c_x")),
        Seq("w1"))
      .join(uni.select(col("token").as("w2"), col("c").as("c_y")),
        Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"),
        col("c_y"), col("n_tokens"),
        (col("c_xy").cast("double") * col("n_tokens").cast("double") /
          (col("c_x").cast("double") * col("c_y").cast("double")))
          .as("lift"))
      .orderBy(col("c_xy").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Greedy longest-match WordPiece encoding (the BERT tokenizer's
    * apply step, Wu et al. 2016) with single-char fallback instead of
    * whole-word [UNK] — and NO UDF, unlike BpeTrainer.encode: each
    * round, every unfinished word expands ≤L candidate substrings at
    * its cursor (L = longest vocab piece), broadcast-joins the vocab,
    * and advances by the longest match via max_by (ties impossible —
    * equal-length candidates at one cursor are the same string).
    * Continuations use the ## convention. Rounds are bounded by
    * `maxWordLen` (words are truncated to it first; each round
    * advances ≥1 char), so the loop is ≤maxWordLen broadcast joins —
    * the per-round frame only SHRINKS as words finish.
    * @param words frame with DISTINCT words in `wordCol` (dedup the
    *   token stream first — encoding is per word type, not token)
    * @param vocab one `piece` column, broadcast-sized by contract
    * @return (word, pieces, n_pieces, n_unk) — pieces ','-joined */
  def wordpieceEncode(words: DataFrame, wordCol: String,
      vocab: DataFrame, maxWordLen: Int = 16): DataFrame = {
    require(maxWordLen >= 1 && maxWordLen <= 64,
      s"maxWordLen ($maxWordLen) out of [1, 64]")
    // bounded scalar: the vocab is broadcast-sized by contract
    val mpRow = vocab.agg(max(length(col("piece")) -
      when(col("piece").startsWith("##"), 2).otherwise(0))).head()
    require(!mpRow.isNullAt(0), "vocab must be non-empty")
    val maxPiece = mpRow.getInt(0)
    val v = broadcast(vocab.select(col("piece")))
    var state = words
      .select(substring(col(wordCol), 1, maxWordLen).as("__w"))
      .filter(length(col("__w")) > 0).distinct()
      .select(col("__w"), lit(1).as("__pos"),
        lit("").as("__pieces"), lit(0L).as("__unk"))
    var done = state.filter(lit(false))
    var round = 0
    while (round < maxWordLen) {
      val active = state.filter(col("__pos") <= length(col("__w")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      done = done.unionAll(
        state.filter(col("__pos") > length(col("__w"))))
      if (active.isEmpty) {
        // every remaining state row just moved to done — clear state so
        // the post-loop sweep can't re-add it
        state = active
        round = maxWordLen
      } else {
        val cand = active.select(col("__w"), col("__pos"),
            col("__pieces"), col("__unk"),
            explode(sequence(lit(1),
              least(lit(maxPiece),
                length(col("__w")) - col("__pos") + 1))).as("__l"))
          .withColumn("__sub",
            when(col("__pos") > 1,
              concat(lit("##"), expr("substring(__w, __pos, __l)")))
              .otherwise(expr("substring(__w, __pos, __l)")))
        state = cand
          .join(v, cand("__sub") === v("piece"), "left")
          .groupBy(col("__w"), col("__pos"), col("__pieces"),
            col("__unk"))
          .agg(max(when(col("piece").isNotNull, col("__l"))).as("__bl"),
            max_by(col("piece"),
              coalesce(when(col("piece").isNotNull, col("__l")),
                lit(-1))).as("__bp"))
          .select(col("__w"),
            (col("__pos") + coalesce(col("__bl"), lit(1))).as("__pos"),
            concat(col("__pieces"), lit(","),
              coalesce(col("__bp"), lit("[UNK]"))).as("__pieces"),
            (col("__unk") +
              when(col("__bp").isNull, 1L).otherwise(0L)).as("__unk"))
          .localCheckpoint(true) // cut the per-round lineage
        active.unpersist(blocking = false)
        round += 1
      }
    }
    done.unionAll(state.filter(col("__pos") > length(col("__w"))))
      .select(col("__w").as(wordCol),
        substring(col("__pieces"), 2, Int.MaxValue).as("pieces"),
        (size(split(col("__pieces"), ",")) - 1).as("n_pieces"),
        col("__unk").as("n_unk"))
  }

  /** Multinomial Naive Bayes trainer (the classic text-classification
    * baseline, McCallum & Nigam AAAI-98 workshop form): per-(class,
    * token) counts, per-class token totals, and the global vocabulary
    * size — everything an argmax_c P(c)·Π P(t|c) scorer needs. All
    * EXACT integers: the Laplace-smoothed P(t|c) = (cnt+1)/(total+V)
    * is emitted as its rational numerator/denominator pair, because
    * the log-space scoring step has no cross-engine bit contract
    * (q60's transcendental territory) — downstream takes the logs.
    * Two hash aggregates (token stream → (class, token); counts →
    * class totals) plus a 1-row vocab-size broadcast; the shuffle
    * carries one row per distinct (class, token), never the stream. */
  def naiveBayesCounts(docs: DataFrame, classCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(classCol).as("__cls"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .select(col("__cls"), lower(col("__tok")).as("__tok"))
    val counts = toks.groupBy(col("__cls"), col("__tok"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("__cls"))
      .agg(sum(col("cnt")).as("cls_total"))
    val vocab = counts.select(col("__tok")).distinct()
      .agg(count(lit(1)).as("vocab_size")) // 1-row scalar frame
    counts.join(totals, Seq("__cls")).crossJoin(broadcast(vocab))
      .select(col("__cls").as(classCol), col("__tok").as("token"),
        col("cnt"), col("cls_total"), col("vocab_size"),
        (col("cnt") + 1).as("p_num"),
        (col("cls_total") + col("vocab_size")).as("p_den"))
  }
}
