package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** EXACT set-similarity self-join via prefix filtering (the
  * Chaudhuri/Bayardo "AllPairs"/PPJoin family): all pairs with Jaccard
  * similarity >= tau over per-row token SETS — no sketching, no
  * probability of a missed pair, unlike the MinHash-LSH path
  * (Dedup.minhashNearDups), which trades exactness for fixed cost.
  * This is the other standard near-dup primitive: use LSH for recall at
  * corpus scale, prefix filtering when the contract is "every
  * qualifying pair, provably".
  *
  * Completeness argument (the prefix-filter lemma): order every token
  * by one GLOBAL order (ascending corpus frequency, ties by token — the
  * rare-token-first order that minimizes candidate fan-out); if
  * |A ∩ B| >= o, the (|A|-o+1)-prefix of A and the (|B|-o+1)-prefix of
  * B must share a token. J(A,B) >= tau implies
  * |A ∩ B| >= ceil(tau·max(|A|,|B|)) >= ceil(tau·|X|) for each side, so
  * per-row prefixes of length |X| - ceil(tau·|X|) + 1 are sufficient
  * (conservative and pair-independent). A seeded-random spec asserts
  * candidates ⊇ brute-force hits.
  *
  * Scale design (100 TB corpus): candidate generation is an equi-join
  * on PREFIX tokens only — and prefixes are dominated by rare tokens
  * (ascending-frequency order), so join buckets are small by
  * construction: the frequent tokens that would create quadratic
  * buckets appear at the END of each ordered set, where prefixes don't
  * reach. The size-compatibility filter (tau·|A| <= |B|) prunes before
  * dedup; verification touches candidate pairs only and runs the
  * codegen'd two-pointer sorted-merge intersect. The global token-order
  * ranks are never materialized as a sorted table — each doc sorts its
  * OWN tokens by (freq, token) locally after one broadcast-free
  * frequency join.
  */
object SetSimJoin {

  /** Normalized per-row token sets: (__id, __toks sorted-lexicographic,
    * __n). Shared by the join and by diagnostics (ScaleSmoke measures
    * prefix-bucket sizes on the REAL stage, not a reimplementation). */
  /** Codegen'd sorted-merge intersect size over the __ta/__tb pair
    * columns: the primitive long merge for hashed-token sets (zero
    * per-element allocation), the UTF8String merge for string sets —
    * chosen from the token element type. */
  private def sortedInterSize(sets: DataFrame): Column = {
    val elemIsLong = sets.schema("__toks").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    ColumnBridge.column(
      if (elemIsLong)
        graft.expressions.SortedLongIntersectSizeExpression(
          ColumnBridge.expression(col("__ta")),
          ColumnBridge.expression(col("__tb")))
      else
        graft.expressions.SortedIntersectSizeExpression(
          ColumnBridge.expression(col("__ta")),
          ColumnBridge.expression(col("__tb"))))
  }

  private[graft] def tokenSets(df: DataFrame, idCol: String,
      tokensCol: Column): DataFrame = df
    // No unconditional Scale.spread here (r12, measured): tokensCol
    // ranges from trivial whitespace tokens (q94 — the spread's
    // 32-task stage tax cost more than the tokenize saved) to heavy
    // n-gram shingles (q258 — where the spread wins 3 s). The caller
    // knows which; heavy-token callers spread their input df.
    .select(col(idCol).as("__id"), array_distinct(tokensCol).as("__toks"))
    .filter(size(col("__toks")) > 0)
    // lexicographically sorted form for the two-pointer verify
    .select(col("__id"), array_sort(col("__toks")).as("__toks"),
      size(col("__toks")).as("__n"))

  /** The prefix-probe stage: one (id, setSize, prefixToken) row per
    * prefix slot — the join keys candidate generation equi-joins on.
    * Bucket sizes of `__tok` here ARE the operator's worst-case join
    * fan-in, which is the quantity the skew stanza records. */
  private[graft] def prefixProbes(sets: DataFrame, tau: Double): DataFrame = {
    // one corpus-wide token-frequency aggregate (the global order key)
    val freq = sets.select(explode(col("__toks")).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__tf"))
    // per-doc tokens in ascending (freq, token) order, then the
    // prefix: |X| - ceil(tau*|X|) + 1 rarest tokens
    val prefixLen = (col("__n") - ceil(lit(tau) * col("__n")) + 1)
      .cast("int")
    sets
      .select(col("__id"), col("__n"), explode(col("__toks")).as("__tok"))
      .join(freq, Seq("__tok"))
      .groupBy(col("__id"), col("__n"))
      .agg(sort_array(collect_list(struct(col("__tf"), col("__tok"))))
        .as("__ord"))
      .select(col("__id"), col("__n"),
        slice(transform(col("__ord"), s => s.getField("__tok")),
          lit(1), prefixLen).as("__prefix"))
      .select(col("__id"), col("__n"), explode(col("__prefix")).as("__tok"))
  }

  /** All unordered pairs (id1 < id2) with Jaccard(tokens) >= tau.
    * `tokensCol` must evaluate to array<string>; duplicates inside a
    * row are collapsed (set semantics), empty sets never match.
    *
    * Output: (id1, id2, inter, size1, size2, jaccard). */
  def jaccardSelfJoin(df: DataFrame, idCol: String, tokensCol: Column,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau ($tau) must be in (0, 1]")
    val sets = tokenSets(df, idCol, tokensCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      val probes = prefixProbes(sets, tau)
      // candidates: shared prefix token, canonical order, size filter
      val cands = probes.as("a")
        .join(probes.as("b"), col("a.__tok") === col("b.__tok") &&
          col("a.__id") < col("b.__id") &&
          (lit(tau) * col("a.__n")) <= col("b.__n") &&
          (lit(tau) * col("b.__n")) <= col("a.__n"))
        .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
        .distinct()
      // verify on candidates only: codegen'd sorted-merge intersect
      val a = sets.select(col("__id").as("id1"), col("__toks").as("__ta"),
        col("__n").as("size1"))
      val b = sets.select(col("__id").as("id2"), col("__toks").as("__tb"),
        col("__n").as("size2"))
      val inter = sortedInterSize(sets)
      // eager checkpoint: the (small) pair table materializes here so
      // the sets cache can release in the finally (the Dedup pattern)
      cands.join(a, Seq("id1")).join(b, Seq("id2"))
        .withColumn("inter", inter.cast("long"))
        .select(col("id1"), col("id2"), col("inter"),
          col("size1").cast("long").as("size1"),
          col("size2").cast("long").as("size2"),
          (col("inter").cast("double") /
            (col("size1") + col("size2") - col("inter")).cast("long"))
            .as("jaccard"))
        .filter(col("jaccard") >= tau)
        .localCheckpoint(eager = true)
    } finally {
      sets.unpersist(blocking = false)
    }
  }

  /** DIRECTED set-containment self-join: all ordered pairs (A, B)
    * with |A ∩ B| / |A| ≥ tau — the asymmetric near-dup relation
    * Jaccard misses (a short document quoted inside a long one has
    * high containment but low Jaccard). Candidate generation uses the
    * same rarest-first prefix lemma as [[jaccardSelfJoin]] — if
    * inter ≥ ⌈tau·|A|⌉, A's (|A| − ⌈tau·|A|⌉ + 1)-prefix must hit B —
    * but probes A-prefixes against B's FULL posting list (no size
    * filter: B may be arbitrarily large). Fan-in per token is its
    * corpus df, so feed DISCRIMINATIVE tokens (word n-gram shingles),
    * never raw words — the same contract real near-dup pipelines use.
    * Verify is the codegen'd sorted-merge intersect on candidates.
    * Output: (id_a, id_b, inter, size_a, size_b, containment). */
  def containmentSelfJoin(df: DataFrame, idCol: String,
      tokensCol: Column, tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau ($tau) must be in (0, 1]")
    val sets = tokenSets(df, idCol, tokensCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      val probes = prefixProbes(sets, tau)
      val postings = sets.select(col("__id").as("__bid"),
        explode(col("__toks")).as("__tok"))
      val cands = probes.join(postings, Seq("__tok"))
        .filter(col("__id") =!= col("__bid"))
        .select(col("__id").as("id_a"), col("__bid").as("id_b"))
        .distinct()
      val a = sets.select(col("__id").as("id_a"),
        col("__toks").as("__ta"), col("__n").as("size_a"))
      val b = sets.select(col("__id").as("id_b"),
        col("__toks").as("__tb"), col("__n").as("size_b"))
      val inter = sortedInterSize(sets)
      cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
        .withColumn("inter", inter.cast("long"))
        .select(col("id_a"), col("id_b"), col("inter"),
          col("size_a").cast("long").as("size_a"),
          col("size_b").cast("long").as("size_b"),
          (col("inter").cast("double") /
            col("size_a").cast("double")).as("containment"))
        .filter(col("containment") >= tau)
        .localCheckpoint(eager = true)
    } finally {
      sets.unpersist(blocking = false)
    }
  }

  /** Rare-term-blocked TF-cosine pairs: terms are word `ngramN`-grams
    * (n ≥ 2 makes terms discriminative even in a small-vocab corpus —
    * n-gram shingles are near-unique except across true near-dups);
    * candidate pairs are docs sharing at least one RARE term (df ≤
    * maxDf — the classic entity-resolution blocking key; per term at
    * most C(maxDf,2) pairs, so the candidate set is linear in
    * rare-term mass, never all-pairs), then exact term-frequency
    * cosine over each pair — integer dot products and integer squared
    * norms, one final sqrt-of-product division. Scale: tf vectors
    * shuffle on term for the dot join; the norm table is |docs|-sized,
    * shuffle-joined.
    * @return (id_a, id_b, dot, n2_a, n2_b, cosine) */
  /** The (doc, term, tf) table tfCosinePairs blocks and scores over —
    * exposed so the scale stanza (R7Smoke) measures candidate bounds
    * on the REAL stage, not a reimplementation. */
  private[graft] def tfTerms(docs: DataFrame, idCol: String,
      textCol: String, ngramN: Int): DataFrame =
    // Scale.spread: n-gram tokenization + explode is the per-row-heavy
    // stage; a single-split source would otherwise run it on one core
    // (guide §2.5; r12)
    Scale.spread(docs).select(col(idCol).as("__id"),
        explode(graft.functions.TextAnalysis
          .wordNgrams(col(textCol), ngramN)).as("term"))
      .groupBy(col("__id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Blocking keys: terms with 2 ≤ df ≤ maxDf (df column retained for
    * the stanza's Σ C(df,2) candidate bound). */
  private[graft] def rareTerms(tf: DataFrame, maxDf: Int): DataFrame =
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)

  def tfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Int, ngramN: Int = 1): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (got $maxDf)")
    require(ngramN >= 1, s"ngramN must be >= 1 (got $ngramN)")
    // tf feeds four consumers (rare terms, candidates, norms, both
    // dot sides) — persist once or the n-gram tokenization reruns 4×
    val tf = tfTerms(docs, idCol, textCol, ngramN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val rare = rareTerms(tf, maxDf).select(col("term"))
    val cand = tf.join(rare, Seq("term"))
      .select(col("term"), col("__id"))
    val pairs = cand.select(col("term"), col("__id").as("id_a"))
      .join(cand.select(col("term"), col("__id").as("id_b")),
        Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val norms = tf.groupBy(col("__id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = pairs
      .join(tf.select(col("__id").as("id_a"), col("term"),
        col("tf").as("tf_a")), Seq("id_a"))
      .join(tf.select(col("__id").as("id_b"), col("term"),
        col("tf").as("tf_b")), Seq("id_b", "term"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    try {
      dots
        .join(norms.select(col("__id").as("id_a"),
          col("n2").as("n2_a")), Seq("id_a"))
        .join(norms.select(col("__id").as("id_b"),
          col("n2").as("n2_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("dot"), col("n2_a"),
          col("n2_b"),
          (col("dot").cast("double") /
            sqrt(col("n2_a").cast("double") *
              col("n2_b").cast("double")))
            .as("cosine"))
        .localCheckpoint(eager = true)
    } finally {
      tf.unpersist(blocking = false)
    }
  }
}
