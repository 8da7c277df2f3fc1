package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Deduplication operators for LLM training-data pipelines (north-star
  * extension, SURVEY.md §7): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Hashing is md5-based everywhere so the driver's DuckDB oracle computes
  * bit-identical values (Spark's murmur `hash()` is engine-specific; md5
  * is not).
  *
  * Scale design (100 TB):
  *  - exact dedup = one hash-aggregate on a 64-bit fingerprint (shuffle
  *    keyed by fingerprint — skew-free because fingerprints are uniform).
  *  - MinHash/LSH: signatures are map-only; candidate generation shuffles
  *    once on band key (explode bands -> self-join per bucket). Bucket
  *    sizes are bounded by band width; pathological buckets can be salted
  *    or capped. No all-pairs O(n²) stage ever runs on the full corpus —
  *    exact Jaccard runs only on LSH candidates.
  *  - SimHash: map-only sketch + 2-band exact-match candidate join
  *    (classic Hamming-ball trick), verification on candidates only.
  *  - embedding near-dup: brute force is quadratic and only for small
  *    inputs/verification; the scale path is LSH bucketing (Similarity
  *    module) before cosine.
  */
object Dedup {

  /** Default LSH bucket cap for the end-user near-dup entry points
    * (minhashNearDups / minhashNearDupsWords / simhashNearDups /
    * dropNearDups). A boilerplate-heavy real corpus routinely lands 10⁶
    * docs in one band bucket — 10¹² pairs in a single reducer — so the
    * safe-at-scale posture is a finite default: buckets above the cap
    * are dropped (members are "similar to everything"; not useful
    * near-dup signal) and the drop is logged. Pass
    * `maxBucketSize = Int.MaxValue` explicitly to disable. 10k docs is
    * ~5·10⁷ pairs per bucket worst-case — heavy but one-task-feasible;
    * the low-level `candidatePairs` keeps the uncapped default. */
  val DefaultMaxBucketSize: Int = 10000

  // ------------------------------------------------------------ exact

  /** Exact dedup on normalized text: keep the smallest-id row per
    * fingerprint. Returns the surviving rows (all original columns).
    * Implemented as a `min_by` aggregation — partial aggregation keeps
    * one candidate row per fingerprint per partition map-side, so the
    * exchange carries at most one row per (fingerprint, partition); the
    * window form would sort-shuffle every row of every duplicate
    * group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val packed = struct(df.columns.map(col).toIndexedSeq: _*)
    // ordering key wrapped so it is never NULL: min_by SKIPS null-keyed
    // rows, which would fabricate an all-NULL output row for a group
    // whose every id is NULL. struct(isNotNull, id) reproduces the
    // window form's NULLS FIRST + id asc exactly.
    val orderKey = struct(col(idCol).isNotNull, col(idCol))
    df.groupBy(fp.as("__fp"))
      .agg(min_by(packed, orderKey).as("__row"))
      // getField, not col("__row.c"): a column name containing dots
      // would otherwise parse as a nested-field path
      .select(df.columns.map(c => col("__row").getField(c).as(c))
        .toIndexedSeq: _*)
  }

  /** Duplicate groups: fingerprint -> group size + keeper id. */
  def dupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))
      .filter(col("n_copies") > 1)

  /** Corpus-wide exact LINE deduplication — C4's span-dedup step at
    * line granularity, the standard boilerplate scrub (nav bars,
    * cookie banners, footers repeat verbatim across millions of
    * pages): every distinct non-blank trimmed line keeps exactly its
    * FIRST occurrence in (id, line-number) order; all later copies are
    * deleted and each document is rebuilt from its surviving lines.
    *
    * Shape: explode → ONE aggregate keyed by the line text whose
    * value is `min(struct(id, lineNo, line))` — the winner carries its
    * own text, so there is NO join back — → one per-doc rebuild
    * aggregate. Two shuffles total. Skew is the defining hazard here
    * (one footer line can occur 10⁸ times at 100 TB): partial
    * aggregation collapses every hot line to one row per map
    * partition before the exchange, so the reducer sees at most
    * #partitions rows per line, never the raw multiplicity.
    *
    * Returns one row per input doc: (idCol, n_lines, n_kept, textCol)
    * with the rebuilt text ('' when every line was a later copy). */
  def dedupLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(col(idCol).as("__id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("__ln", "__line")))
      .withColumn("__line", trim(col("__line")))
      .filter(col("__line") =!= "")
    val winners = lines
      .groupBy(col("__line").as("__key"))
      .agg(min(struct(col("__id"), col("__ln"), col("__line")))
        .as("__w"))
      .select(col("__w").getField("__id").as("__id"),
        col("__w").getField("__ln").as("__ln"),
        col("__w").getField("__line").as("__line"))
    val rebuilt = winners.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__ln"), col("__line")))),
          s => s.getField("__line")), "\n").as("__text"))
    val totals = lines.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_lines"))
    df.select(col(idCol).as("__id"))
      .join(totals, Seq("__id"), "left")
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("__text"), lit("")).as(textCol))
  }

  /** Exact-substring duplication (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — their suffix-array
    * pass, re-expressed as the Spark-idiomatic inverted index): every
    * `windowTokens`-token sliding span of every doc, counted across
    * docs; spans appearing in >= minDocs docs are duplicated content.
    * Complements MinHash: catches a long verbatim quote inside two
    * otherwise-different documents, which document-level similarity
    * misses.
    *
    * One explode + one hash-aggregate. Each (doc, span) pair is
    * distinct by construction (WordShinglesExpression dedups within
    * doc), so n_docs = count(*) — no countDistinct expand. Partial
    * aggregation collapses each span to one row per partition map-side;
    * the exchange key is the span string (uniform md5-grade spread —
    * a span shared by millions of docs arrives pre-counted as one row
    * per partition, so even pathological boilerplate cannot skew a
    * reducer). Docs shorter than the window contribute their whole
    * normalized text as one span, so short exact-dups still surface. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50, minDocs: Int = 2): DataFrame = {
    require(windowTokens > 0 && minDocs >= 2, "windowTokens > 0, minDocs >= 2")
    df.select(col(idCol).as("__doc_id"),
        explode(TextAnalysis.wordShingles(col(textCol), windowTokens)).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), min(col("__doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** duplicatedSpans' scale path: aggregate 64-bit md5-prefix span
    * hashes (`span_h`) instead of span strings. A 50-token span is
    * ~300 bytes; its hash is 8 — the exchange (whose row count is the
    * DISTINCT span count, i.e. nearly the corpus n-gram count on a
    * mostly-unique corpus) shrinks ~40×, which is the difference
    * between a 2 PB and a 50 TB shuffle on a 100 TB corpus. Collisions
    * (~n²/2⁶⁵) can only merge two span groups, same trade the hashed
    * minhash verify already accepts. Join `span_h` back to
    * `wordShingles` output to recover the text of flagged spans —
    * that second pass touches only flagged docs. */
  def duplicatedSpanHashes(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50, minDocs: Int = 2): DataFrame = {
    require(windowTokens > 0 && minDocs >= 2, "windowTokens > 0, minDocs >= 2")
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val hashes = C(graft.expressions.HashedShinglesExpression(
      E(TextAnalysis.wordShingles(col(textCol), windowTokens))))
    df.select(col(idCol).as("__doc_id"), explode(hashes).as("span_h"))
      .groupBy(col("span_h"))
      .agg(count(lit(1)).as("n_docs"), min(col("__doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Exact-substring REMOVAL (the second half of Lee et al. 2021 —
    * [[duplicatedSpans]] detects, this rewrites): every occurrence of a
    * span shared by >= `minDocs` documents is cut from every doc except
    * the keeper (min doc id for that span), and each doc's surviving
    * tokens are re-joined into `clean_text`. Output one row per doc:
    * (idCol, n_tokens, n_removed, clean_text).
    *
    * Span semantics match duplicatedSpans, including the short-input
    * rule: a doc with <= windowTokens tokens contributes its whole
    * normalized text as its only span, so a short doc duplicated
    * elsewhere is cleared to '' unless it is the keeper. Overlapping
    * flagged spans union their covered token ranges.
    *
    * Scale shape: the token array is materialized once (MEMORY_ONLY —
    * the occurrence pass and the rebuild both read it; the result is
    * corpus-sized so the operator stays LAZY and cannot release the
    * cache itself: blocks are evictable and a deterministic recompute
    * reproduces them, so the cache is memory-bounded, never parked on
    * disk — clearCache() reclaims it eagerly in long-lived sessions);
    * occurrences explode to (doc, start, end, span) and the
    * flag pass is one distinct + hash-aggregate keyed by span;
    * coverage joins occurrences back on the span key; the rebuild is a
    * per-doc aggregate of covered ranges plus a map-only token filter.
    * Nothing is ever quadratic in the corpus; the shuffle rows are the
    * corpus n-gram count, the same bound as detection. For the ~40×
    * cheaper exchange at web scale, key the flag/coverage joins on the
    * 64-bit span hash ([[duplicatedSpanHashes]]) instead of the span
    * string — the string form is kept here for oracle parity. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50, minDocs: Int = 2): DataFrame = {
    require(windowTokens > 0 && minDocs >= 2, "windowTokens > 0, minDocs >= 2")
    val w = windowTokens
    val toks = df.select(col(idCol).as("__doc_id"),
        split(TextAnalysis.normalizeText(col(textCol)), " ").as("__tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = size(col("__tk"))
    val occ = toks.select(col("__doc_id"),
        explode(when(n <= w,
          array(struct(lit(1).as("s"), n.as("e"),
            array_join(col("__tk"), " ").as("span"))))
          .otherwise(transform(sequence(lit(1), n - w + 1),
            s => struct(s.as("s"), (s + w - 1).as("e"),
              array_join(slice(col("__tk"), s, lit(w)), " ").as("span")))))
          .as("__o"))
      .select(col("__doc_id"), col("__o.s").as("s"), col("__o.e").as("e"),
        col("__o.span").as("span"))
    val flagged = occ.select(col("__doc_id"), col("span")).distinct()
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), min(col("__doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span"), col("first_doc"))
    val cover = occ.join(flagged, Seq("span"))
      .filter(col("__doc_id") =!= col("first_doc"))
      .groupBy(col("__doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("__cov"))
    val idx = sequence(lit(1), n)
    val keptIdx = when(col("__cov").isNull, idx)
      .otherwise(filter(idx, i =>
        !exists(col("__cov"), c =>
          c.getField("s") <= i && i <= c.getField("e"))))
    toks.join(cover, Seq("__doc_id"), "left")
      .withColumn("__kept", keptIdx)
      .select(col("__doc_id").as(idCol),
        n.cast("long").as("n_tokens"),
        (n - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(transform(col("__kept"),
          i => element_at(col("__tk"), i)), " ").as("clean_text"))
  }

  // ---------------------------------------------------------- minhash

  import graft.expressions.MinHashScheme

  /** Affine minhash of one shingle under permutation i (see
    * MinHashScheme): ((a_i·h1) mod P + (b_i·h2) mod P + c_i) mod P over
    * the two 31-bit md5-prefix hashes. Every operand < 2³¹ so the
    * arithmetic is exact 64-bit in any engine. */
  private def affineMin(shingles: Column, i: Int): Column =
    array_min(transform(shingles, s => {
      val digest = md5(s)
      val h1 = conv(substring(digest, 1, 8), 16, 10).cast("long")
        .bitwiseAND(lit(0x7fffffffL))
      val h2 = conv(substring(digest, 9, 8), 16, 10).cast("long")
        .bitwiseAND(lit(0x7fffffffL))
      ((lit(MinHashScheme.a(i)) * h1) % lit(MinHashScheme.P) +
        (lit(MinHashScheme.b(i)) * h2) % lit(MinHashScheme.P) +
        lit(MinHashScheme.c(i))) % lit(MinHashScheme.P)
    }))

  /** MinHash signature over a shingle array: element i is the affine
    * permutation minimum (MinHashScheme). Returns array<long>.
    * Backed by the codegen'd one-traversal expression — the Column
    * composition (affineMin per permutation) recomputes the md5 per
    * permutation, k× the hash cost (measured 25.8 s → 4-ish on q331).
    * Empty shingle arrays yield all-zero signatures (the Column form
    * yielded nulls); feed non-empty shingles. */
  def minhashSignature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.MinHashSignatureExpression(
        org.apache.spark.sql.graftshim.ColumnBridge
          .expression(shingles), k))

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and join each band's minima. Two docs sharing ANY band key are
    * candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => sig.getItem(b * rowsPerBand + r).cast("string"))
      concat_ws("|", parts: _*)
    }: _*)

  /** Band keys computed directly from the shingle array, each shingle
    * hash evaluated per permutation. Going through an intermediate
    * signature column looks cleaner but is a performance trap:
    * CollapseProject inlines the whole k-hash signature expression into
    * every getItem reference, recomputing it k times (measured 16x
    * blowup at sf0.1). Reference form for the equivalence spec — the
    * hot path is the single-pass MinHashBandsExpression. */
  def lshBandKeysFromShingles(shingles: Column, bands: Int,
      rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val mins = (0 until rowsPerBand).map { r =>
        affineMin(shingles, b * rowsPerBand + r).cast("string")
      }
      concat_ws("|", mins: _*)
    }: _*)

  /** Candidate pairs from band keys: explode -> self-join per bucket.
    * Input needs (idCol, bandKeysCol); output (id1, id2) distinct with
    * id1 < id2. The shuffle is keyed by band key — bounded buckets, no
    * full cross product.
    *
    * `maxBucketSize` caps skew: buckets holding more than that many docs
    * are DROPPED before the self-join (standard MinHash-dedup practice —
    * a boilerplate bucket of 10⁶ docs is 10¹² pairs in one reducer; its
    * members are "similar to everything", not useful near-dup signal).
    * The oversized-bucket list is computed with one cheap partial
    * aggregation, broadcast to a left-anti join (no extra shuffle of the
    * exploded rows), and the drop count is logged. This low-level
    * primitive defaults to NO cap (callers see exactly what they ask
    * for); the end-user near-dup entry points default to
    * [[DefaultMaxBucketSize]].
    *
    * `numPartitions` optionally fixes the band-shuffle parallelism
    * (otherwise spark.sql.shuffle.partitions decides). */
  def candidatePairs(df: DataFrame, idCol: String, bandKeysCol: String,
      maxBucketSize: Int = Int.MaxValue,
      numPartitions: Option[Int] = None): DataFrame = {
    require(maxBucketSize > 0, "maxBucketSize must be positive")
    val raw = df.select(col(idCol), explode(col(bandKeysCol)).as("__band"))
    val capped =
      if (maxBucketSize == Int.MaxValue) raw
      else {
        // one aggregation pass: oversized keys are pathological-few by
        // definition, so collect them (the earlier count()-then-join
        // form recomputed the full aggregation twice). Fallback to an
        // anti-join only if the collect cap trips.
        val CollectCap = 10000
        val oversizedKeys = raw.groupBy(col("__band"))
          .agg(count(lit(1)).as("__bc"))
          .filter(col("__bc") > maxBucketSize)
          .select(col("__band")).limit(CollectCap + 1)
          .collect().map(_.get(0))
        if (oversizedKeys.nonEmpty) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"candidatePairs: dropping ${oversizedKeys.length} LSH " +
              s"bucket(s) larger than $maxBucketSize docs")
        }
        if (oversizedKeys.isEmpty) raw
        else if (oversizedKeys.length <= CollectCap)
          raw.filter(!col("__band").isin(oversizedKeys.toIndexedSeq: _*))
        else {
          val oversized = raw.groupBy(col("__band"))
            .agg(count(lit(1)).as("__bc"))
            .filter(col("__bc") > maxBucketSize)
          raw.join(broadcast(oversized.select(col("__band"))),
            Seq("__band"), "left_anti")
        }
      }
    val exploded = numPartitions
      .map(n => capped.repartition(n, col("__band")))
      .getOrElse(capped)
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.__band") === col("b.__band") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** Exact Jaccard similarity between two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Jaccard over PRE-SORTED distinct token arrays: one codegen'd
    * two-pointer merge (SortedIntersectSizeExpression) instead of two
    * per-pair hash-set builds — measured ~5× on the q15 pair verify.
    * Same value as [[jaccard]]: the counts are identical integers and
    * the division is the same single op. Inputs MUST be array_sort'd
    * and distinct (charShingles/wordShingles are distinct already). */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val inter = ColumnBridge.column(
      graft.expressions.SortedIntersectSizeExpression(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
      .cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle -> sign -> band ->
    * candidates -> exact-Jaccard verify at `threshold`.
    * Returns (id1, id2, jaccard).
    *
    * The shingle and score intermediates are eagerly cached (and the
    * upstream caches released once consumed) — the MLlib-style pattern
    * for multi-use intermediates. Without it the lazy DAG recomputes the
    * shingle+band chain on four join branches and evaluates the jaccard
    * expression twice (filter + project): measured 522s -> ~55s at
    * sf0.1.
    *
    * Verify-stage economics (the cost center at any scale):
    *  - shingle sets are hashed ONCE per doc to sorted long keys
    *    (HashedShinglesExpression), so each pair costs a primitive
    *    two-pointer merge with zero allocation — the UTF8String merge
    *    allocated a wrapper per element (measured ~25s of q16's 38s).
    *  - pairs are pre-filtered by set-size ratio BEFORE the merge:
    *    J(A,B) >= t implies min(|A|,|B|)/max(|A|,|B|) >= t, so the
    *    filter is result-preserving and pushes into the join stage.
    *  - |A union B| = |A| + |B| - |A intersect B| with set sizes cached:
    *    one merge per pair; the intersect SIZE is what gets persisted,
    *    so downstream jaccard arithmetic never re-touches arrays.
    *
    * `maxBucketSize` (see candidatePairs) drops pathological LSH buckets;
    * `storageLevel` tunes the intermediate caches (MEMORY_AND_DISK keeps
    * a 100 TB run from OOMing executors; pass MEMORY_ONLY to pin);
    * `numPartitions` fixes the band-shuffle parallelism. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 4, k: Int = 8, bands: Int = 4,
      threshold: Double = 0.6,
      maxBucketSize: Int = DefaultMaxBucketSize,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      numPartitions: Option[Int] = None): DataFrame =
    minhashNearDupsOnShingles(df, idCol,
      TextAnalysis.charShingles(col(textCol), shingleSize),
      k, bands, threshold, maxBucketSize, storageLevel, numPartitions)

  /** Word-shingle variant — the canonical LLM-corpus recipe (n-gram
    * word windows, e.g. 13-gram dedup). Same pipeline, different
    * shingle unit: word windows make near-dup detection robust to
    * whitespace/punctuation noise that char shingles absorb into the
    * set, and the shingle count scales with token count, not bytes. */
  def minhashNearDupsWords(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 13, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.6,
      maxBucketSize: Int = DefaultMaxBucketSize,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      numPartitions: Option[Int] = None): DataFrame =
    minhashNearDupsOnShingles(df, idCol,
      TextAnalysis.wordShingles(col(textCol), shingleWords),
      k, bands, threshold, maxBucketSize, storageLevel, numPartitions)

  private def minhashNearDupsOnShingles(df: DataFrame, idCol: String,
      shingles: Column, k: Int, bands: Int, threshold: Double,
      maxBucketSize: Int,
      storageLevel: org.apache.spark.storage.StorageLevel,
      numPartitions: Option[Int]): DataFrame = {
    require(bands > 0 && k > 0 && k % bands == 0,
      s"k ($k) must be a positive multiple of bands ($bands)")
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold ($threshold) must be in [0, 1]")
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val rowsPerBand = k / bands
    // persisted so the three downstream expressions evaluate over cached
    // shingle arrays — unpersisted, CollapseProject would inline (and
    // re-run) the shingling into every reference. Scale.spread first:
    // shingling is the per-row-heavy stage, and a single-split source
    // would otherwise run it on one core (guide §2.5; r12)
    val shingled = Scale.spread(df).select(col(idCol), shingles.as("__sh"))
      .persist(storageLevel)
    val prepared = shingled.select(col(idCol),
      C(graft.expressions.MinHashBandsExpression(E(col("__sh")), bands,
        rowsPerBand)).as("__bands"),
      C(graft.expressions.HashedShinglesExpression(E(col("__sh")))).as("__hs"),
      size(col("__sh")).as("__n"))
      .persist(storageLevel)
    val pairs = candidatePairs(prepared.select(col(idCol), col("__bands")),
      idCol, "__bands", maxBucketSize, numPartitions)
    val p = prepared
    val scored = pairs
      .join(p.select(col(idCol).as("id1"), col("__hs").as("__h1"),
        col("__n").as("__n1")), "id1")
      .join(p.select(col(idCol).as("id2"), col("__hs").as("__h2"),
        col("__n").as("__n2")), "id2")
      .filter(least(col("__n1"), col("__n2")).cast("double") /
        greatest(col("__n1"), col("__n2")) >= threshold)
      .select(col("id1"), col("id2"),
        C(graft.expressions.SortedLongIntersectSizeExpression(
          E(col("__h1")), E(col("__h2")))).cast("double").as("__i"),
        col("__n1"), col("__n2"))
    val j = col("__i") / (col("__n1") + col("__n2") - col("__i"))
    // eager localCheckpoint materializes the (small) surviving pair set
    // and truncates lineage, so BOTH upstream caches release here — the
    // round-1 shape persisted the full scored pair table and never
    // freed it, leaking cache for the session's lifetime. The merge
    // intersect is cheap enough now that its filter/project double
    // evaluation costs less than materializing every candidate pair.
    val result = scored.filter(j >= threshold)
      .select(col("id1"), col("id2"), j.as("jaccard"))
      .localCheckpoint(eager = true)
    shingled.unpersist()
    prepared.unpersist()
    result
  }

  /** LSH precision audit in ONE pass: candidate count and verified
    * count (exact Jaccard ≥ threshold) from the SAME shingle/minhash/
    * banding computation. Computing the two arms independently — a
    * candidatePairs call plus a minhashNearDupsWords call, the r11
    * q363 shape — tokenizes, minhashes, bands, and generates
    * candidates TWICE over the corpus; here the candidate pair set is
    * materialized once and feeds both counts (guide §1.2: don't
    * compute things you throw away). The emitted numbers are
    * definitionally identical to the two-arm form: same banding ⇒
    * same candidate set; the verify arm is the minhashNearDups
    * verify (size-ratio prefilter is result-preserving, exact sorted
    * intersect) restricted to those candidates.
    * @return one row: (n_candidates, n_verified, precision) */
  def minhashPrecisionAuditWords(df: DataFrame, idCol: String,
      textCol: String, shingleWords: Int, k: Int, bands: Int,
      threshold: Double,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(bands > 0 && k > 0 && k % bands == 0,
      s"k ($k) must be a positive multiple of bands ($bands)")
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Scale.spread: shingling is per-row-heavy; see
    // minhashNearDupsOnShingles (r12)
    val shingled = Scale.spread(df).select(col(idCol),
        TextAnalysis.wordShingles(col(textCol), shingleWords).as("__sh"))
      .persist(level)
    val prepared = shingled.select(col(idCol),
      C(graft.expressions.MinHashBandsExpression(E(col("__sh")), bands,
        k / bands)).as("__bands"),
      C(graft.expressions.HashedShinglesExpression(E(col("__sh")))).as("__hs"),
      size(col("__sh")).as("__n"))
      .persist(level)
    // the candidate set feeds BOTH counts: materialize it once
    val pairs = candidatePairs(prepared.select(col(idCol), col("__bands")),
        idCol, "__bands", maxBucketSize)
      .persist(level)
    val nCand = pairs.agg(count(lit(1)).as("n_candidates"))
    val p = prepared
    val scored = pairs
      .join(p.select(col(idCol).as("id1"), col("__hs").as("__h1"),
        col("__n").as("__n1")), "id1")
      .join(p.select(col(idCol).as("id2"), col("__hs").as("__h2"),
        col("__n").as("__n2")), "id2")
      .filter(least(col("__n1"), col("__n2")).cast("double") /
        greatest(col("__n1"), col("__n2")) >= threshold)
      .select(
        C(graft.expressions.SortedLongIntersectSizeExpression(
          E(col("__h1")), E(col("__h2")))).cast("double").as("__i"),
        col("__n1"), col("__n2"))
    val j = col("__i") / (col("__n1") + col("__n2") - col("__i"))
    val nVer = scored.filter(j >= threshold)
      .agg(count(lit(1)).as("n_verified"))
    val result = nCand.crossJoin(broadcast(nVer))
      .select(col("n_candidates"), col("n_verified"),
        (col("n_verified").cast("double") /
          col("n_candidates").cast("double")).as("precision"))
      .localCheckpoint(eager = true)
    pairs.unpersist()
    shingled.unpersist()
    prepared.unpersist()
    result
  }

  // ---------------------------------------------------------- simhash

  /** 32-bit SimHash over a token array: per bit, tokens vote +1/-1 by
    * their md5-derived bit; majority(>=0) sets the bit. Returns long.
    * Empty token array -> 0.
    *
    * Backed by the codegen'd SimHash32Expression (one pass, one md5 per
    * token) — the Column-composition equivalent costs 32 array scans.
    * Equivalence is pinned by ExpressionsSpec. */
  def simhash32(tokens: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.SimHash32Expression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(tokens)))

  /** Reference Column-composition form of simhash32 (kept for the
    * equivalence spec; 32 filtered scans — do not use in hot paths). */
  private[graft] def simhash32Composed(tokens: Column): Column = {
    val n = size(tokens)
    (0 until 32).map { b =>
      val hits = size(filter(tokens, t =>
        shiftright(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), b)
          .bitwiseAND(1) === 1))
      when(n > 0 && hits * 2 >= n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup: candidates share at least one 16-bit half exactly
    * (2-band Hamming trick), verified by bit_count(xor) <= maxHamming.
    * Returns (id1, id2, hamming). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8,
      maxBucketSize: Int = DefaultMaxBucketSize,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame =
    simhashNearDupsFromTokens(df, idCol, TextAnalysis.tokens(col(textCol)),
      maxHamming, maxBucketSize, storageLevel)

  /** Token-expression-parameterized core of [[simhashNearDups]]: the
    * text path feeds whitespace tokens, Multimodal.binaryNearDups feeds
    * byte shingles — same sketch, banding, and verification. */
  private[operators] def simhashNearDupsFromTokens(df: DataFrame,
      idCol: String, tokensCol: Column,
      maxHamming: Int,
      maxBucketSize: Int = DefaultMaxBucketSize,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // persisted: the sketch feeds the banding branch plus both
    // verification join branches — unpersisted, the scan+tokenize+md5
    // chain runs three times. Scale.spread first: the tokenize+md5
    // sketch is the per-row-heavy stage, and a single-split source
    // would otherwise run it on one core (guide §2.5; r12)
    val sketch = Scale.spread(df).select(col(idCol),
      simhash32(tokensCol).as("__sh"))
      .persist(storageLevel)
    val result = simhashNearDupsFromSketch(sketch, idCol, "__sh",
      maxHamming, maxBucketSize)
    sketch.unpersist()
    result
  }

  /** Band + verify over a PRECOMPUTED 32-bit sketch column — the
    * sketch-grain entry for callers that need the sketch for their own
    * downstream arithmetic too (q354's third-side Hamming audit
    * recomputed the full tokenize+md5 pass before this existed; r12).
    * `sketch` should be persisted by the caller: it feeds the banding
    * branch plus both verification join branches. Result rows are
    * eagerly checkpointed, so the caller may unpersist right after. */
  def simhashNearDupsFromSketch(sketch: DataFrame, idCol: String,
      sketchCol: String, maxHamming: Int,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 32,
      s"maxHamming ($maxHamming) must be in [0, 32]")
    val s = sketch.select(col(idCol), col(sketchCol).as("__sh"))
    val banded = s.withColumn("__bands", array(
      concat(lit("lo:"), (col("__sh").bitwiseAND(lit(0xffffL))).cast("string")),
      concat(lit("hi:"), shiftright(col("__sh"), 16).cast("string"))))
    val pairs = candidatePairs(banded, idCol, "__bands", maxBucketSize)
    // eager checkpoint of the (small) result releases the sketch cache
    // immediately instead of leaking it for the session lifetime
    pairs
      .join(s.withColumnRenamed(idCol, "id1").withColumnRenamed("__sh", "__s1"), "id1")
      .join(s.withColumnRenamed(idCol, "id2").withColumnRenamed("__sh", "__s2"), "id2")
      .withColumn("hamming", bit_count(col("__s1").bitwiseXOR(col("__s2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
      .localCheckpoint(eager = true)
  }

  // ------------------------------------------------- cluster assembly

  /** A localCheckpoint's blocks are RDD-level, not InMemoryRelation —
    * release a superseded iteration's frame by unpersisting the RDD
    * inside its LogicalRDD leaf. Shared by both CC loops and
    * Graph.bfsDistances; without it, N rounds retain N label/frontier
    * tables for the session's lifetime. */
  private[operators] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Connected components over a near-dup pair table — the final step of
    * every LLM dedup pipeline: pairs (id1, id2) become clusters, each
    * node labeled with the minimum id reachable from it, and the keeper
    * per cluster is the label itself. Output: (node, cluster).
    *
    * Algorithm: iterative min-label propagation with pointer jumping.
    * Each round is (a) one shuffle join pushing labels across the
    * symmetrized edge list + a min-aggregate, then (b) a path-halving
    * shortcut `cluster(v) := cluster(cluster(v))` — a self-join of the
    * (node-count-sized) label table that doubles the distance a label
    * travels per round, so convergence takes O(log diameter) rounds
    * instead of O(diameter) (measured on the sf0.1 near-dup graph:
    * 11 rounds -> 5). `localCheckpoint(eager = true)` cuts the lineage
    * so round N's plan does not replay rounds 1..N-1 — the standard
    * Spark iterative-algorithm shape. (The alternating large-star/
    * small-star algorithm [Kiveris et al., "Connected Components in
    * MapReduce and Beyond"] additionally shrinks the EDGE list as it
    * contracts — the upgrade path if edge-side skew ever dominates.)
    *
    * Convergence detection exploits monotonicity: labels only ever
    * DECREASE (each round takes a min), so the label-sum strictly
    * decreases iff any label changed — one overflow-free decimal
    * aggregate over the just-checkpointed labels, instead of a
    * changed-rows join. Non-numeric ids fall back to the join probe.
    * `maxIter` bounds the loop, logging a warning if hit.
    *
    * Variant auto-selection: pointer jumping re-joins the FULL
    * symmetrized edge list every round, so its per-round cost is fixed
    * at edge-count rows; the large/small-star variant
    * ([[connectedComponentsContracting]]) pays two aggregate+join pairs
    * per round but CONTRACTS the edge set as it goes. Above
    * `contractAbove` symmetrized edges the fixed edge-sized shuffle
    * dominates, so the call delegates to the contracting variant
    * automatically — the caller doesn't need to know the lore. The
    * default (2e9) is the point where even a 1000-executor cluster at
    * the loop's own ~250k-rows-per-task sizing has every core saturated
    * each round; below it the simpler loop's lower per-round constant
    * wins (both variants produce the identical min-id labeling, pinned
    * by spec). */
  /** Incremental cluster maintenance: fold NEW near-dup evidence into
    * an existing component assignment WITHOUT re-clustering the old
    * pair set — the companion of [[IncrementalDedup]]'s fingerprint
    * index for the near-dup path. The old clustering is re-encoded as
    * its star edges (node → cluster representative, one edge per
    * node: a lossless, linear-size summary of old connectivity), the
    * new pairs are unioned in, and one [[connectedComponents]] run
    * over that union yields exactly the clustering a full recompute
    * over (old pairs ∪ new pairs) would produce — because stars and
    * the original edges have identical transitive closure. Cost
    * scales with |nodes| + |new pairs| + rounds, never |old pairs|
    * (at 100 TB the old pair set is the thing you cannot afford to
    * rebuild; the star summary is one row per clustered doc).
    *
    * `newPairs` must contain every pair involving a NEW node (the
    * banded LSH probe of the incoming batch against old + new
    * sketches produces exactly that). Returns (node, cluster) with
    * cluster = min member id, the [[connectedComponents]] contract. */
  def mergeClusters(assignments: DataFrame, newPairs: DataFrame,
      nodeCol: String = "node", clusterCol: String = "cluster",
      id1Col: String = "id1", id2Col: String = "id2"): DataFrame = {
    val stars = assignments
      .select(col(nodeCol).cast("long").as("id1"),
        col(clusterCol).cast("long").as("id2"))
      .filter(col("id1") =!= col("id2"))
    connectedComponents(stars.unionByName(
      newPairs.select(col(id1Col).cast("long").as("id1"),
        col(id2Col).cast("long").as("id2"))))
  }

  /** Canonical-document selection: turn pairwise near-dup evidence
    * into a KEEP-THE-BEST drop decision — production dedup keeps the
    * highest-quality member of each duplicate cluster, not the
    * smallest id. Clusters come from [[connectedComponents]] over the
    * pair list; within a cluster the survivor is argmax by
    * (qualityCol, then smaller id as the deterministic tie-break),
    * computed with a max_by over a struct order key — partial
    * aggregation keeps one candidate per cluster per partition
    * map-side, so the exchange carries clusters, not members (the
    * exactDedup discipline). Unpaired docs are their own singleton
    * cluster and always survive.
    *
    * Returns the surviving rows (all original columns) plus
    * `cluster_id` and `n_members`. */
  def keepCanonicalPerCluster(df: DataFrame, idCol: String,
      pairs: DataFrame, qualityCol: Column): DataFrame = {
    val clusters = connectedComponents(pairs)
      .select(col("node").as(idCol), col("cluster").as("__cl"))
    val packed = struct(df.columns.map(col).toIndexedSeq: _*)
    val orderKey = struct(qualityCol.as("q"), (-col(idCol)).as("negid"))
    df.join(clusters, Seq(idCol), "left_outer")
      .withColumn("__cluster",
        coalesce(col("__cl"), col(idCol).cast("long")))
      .groupBy(col("__cluster"))
      .agg(max_by(packed, orderKey).as("__row"),
        count(lit(1)).as("n_members"))
      .select(df.columns.map(c => col("__row").getField(c).as(c))
        .toIndexedSeq ++ Seq(col("__cluster").as("cluster_id"),
          col("n_members")): _*)
  }

  def connectedComponents(pairs: DataFrame, id1Col: String = "id1",
      id2Col: String = "id2", maxIter: Int = 50,
      contractAbove: Long = 2000000000L): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    val spark = pairs.sparkSession
    val e0 = pairs.select(col(id1Col).as("src"), col(id2Col).as("dst"))
    // symmetrize so every node appears on the src side
    val edgesRaw = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Size the loop's shuffles to the graph, not the session default:
    // every round shuffles edge-count rows, and an iterative loop
    // multiplies fixed per-task overhead by (stages x rounds). ~250k
    // edge rows per task keeps tasks meaningful; a 100 TB edge list
    // keeps the session's full parallelism (the formula only clamps
    // DOWN). Scoped per-frame via explicit repartition(loopParts, ...)
    // — never by mutating session-global spark.sql.shuffle.partitions,
    // which a concurrent caller in a shared session would observe.
    val edgeCount = edgesRaw.count()
    if (edgeCount > contractAbove) {
      edgesRaw.unpersist()
      // forward the caller's round budget: the two loops count rounds
      // differently (pointer jumps vs star contractions), but ignoring
      // an explicit bound would let a delegated run exceed what the
      // caller budgeted by the contracting default (100)
      return connectedComponentsContracting(pairs, id1Col, id2Col, maxIter)
    }
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.max(1L,
      math.min(defaultParts.toLong, edgeCount / 250000L + 1)).toInt
    // Cache the edge list PARTITIONED BY THE PER-ROUND JOIN KEY: every
    // round's label join then reuses the cached hash(dst, loopParts)
    // layout with no exchange on the (large) edge side. The previous
    // shape cached the distinct()'s (src, dst) partitioning, which
    // satisfies no join distribution — both sides reshuffled every
    // round. One extra node-sized shuffle at init buys an edge-sized
    // shuffle saved per round.
    val edges = edgesRaw.repartition(loopParts, col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // init folds the first propagation round in: every node starts at
    // min(self, direct neighbors) straight off the edge aggregate. The
    // repartition pins the labels-by-node layout the loop maintains, so
    // round 1's joins already match partition counts on both sides.
    // This first action also materializes the `edges` cache (from
    // edgesRaw's cache) as a side effect — the r12 shape paid a
    // separate edges.count() job for that (r13, guide §1.2).
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("__m"))
      .select(col("src").as("node"),
        least(col("__m"), col("src")).as("cluster"))
      .repartition(loopParts, col("node"))
      .localCheckpoint(eager = true)
    edgesRaw.unpersist() // edges' cache is filled; the raw copy is dead
    val numericIds = labels.schema("cluster").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def labelSum(df: DataFrame): Any =
      df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().get(0)
    var prevSum: Any = null // first round always runs
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.select(col("node").as("dst"), col("cluster")), "dst")
        .select(col("src").as("node"), col("cluster"))
      // explicit loop-sized repartition replaces the session-default
      // exchange the union would otherwise force under groupBy
      val stepped = propagated.union(labels)
        .repartition(loopParts, col("node"))
        .groupBy(col("node")).agg(min(col("cluster")).as("cluster"))
      // pointer jumping: a label is itself a node id, so follow it one
      // hop through the PREVIOUS round's (already materialized) label
      // table — cluster(cluster(v)). Labels point ~2^i hops away after
      // round i, so the hop keeps doubling propagation distance while
      // consuming `stepped` only once (no extra checkpoint). Labels
      // only ever decrease, so the jump is always an improvement or a
      // no-op; coalesce covers labels absent from the jump table. */
      val next = stepped
        .join(labels.select(col("node").as("cluster"),
          col("cluster").as("__c2")), Seq("cluster"), "left")
        .select(col("node"),
          coalesce(col("__c2"), col("cluster")).as("cluster"))
        .localCheckpoint(eager = true)
      if (numericIds) {
        val s = labelSum(next)
        converged = s == prevSum
        prevSum = s
      } else {
        converged = next
          .join(labels.withColumnRenamed("cluster", "__old"), "node")
          .filter(col("cluster") =!= col("__old"))
          .isEmpty
      }
      // round k is materialized (eager checkpoint) and the convergence
      // probe above was the last reader of round k-1 — release its
      // blocks now so at most two label tables are ever resident
      releaseCheckpoint(labels)
      labels = next
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: not converged after $maxIter rounds " +
          "(labels are a sound over-segmentation, not final components)")
    labels
    } finally {
      // release the edge cache on BOTH paths: an OOM/cancel mid-loop
      // must not leave the (large) symmetrized edge list cached
      edges.unpersist()
      edgesRaw.unpersist()
    }
  }

  /** Connected components by alternating large-star/small-star
    * contraction [Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14] — the upgrade path over
    * [[connectedComponents]] when the EDGE list itself is the
    * bottleneck: each round rewires edges toward component minima, so
    * the edge set CONTRACTS as the loop advances (pointer jumping
    * re-joins the full edge list every round). Same output contract:
    * (node, cluster = min reachable id).
    *
    * Round = two aggregate+join pairs over the current edge set:
    *  - large-star: per node u over the symmetrized neighborhood,
    *    m = min(Γ(u) ∪ {u}); every neighbor w > u rewires to (w, m).
    *  - small-star: per node u over the canonical (dst < src) edges,
    *    m = min(Γ(u) ∪ {u}); every w ∈ Γ(u) ∪ {u}, w ≠ m rewires
    *    to (w, m).
    * Both emit canonical dst < src edges, so only large-star pays the
    * symmetrize union. Convergence = edge multiset unchanged (count
    * probe, then exceptAll emptiness only when counts tie); converged
    * edges form stars, so labels read directly off (src -> dst), with
    * centers and any filtered self-loop nodes coalescing to
    * themselves. */
  def connectedComponentsContracting(pairs: DataFrame,
      id1Col: String = "id1", id2Col: String = "id2",
      maxIter: Int = 100): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    val e0 = pairs.select(col(id1Col).as("src"), col(id2Col).as("dst"))
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    def canon(e: DataFrame): DataFrame =
      e.filter(col("src") =!= col("dst")).select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("__m"))
        .select(col("src"), least(col("src"), col("__m")).as("__m"))
      sym.filter(col("dst") > col("src"))
        .join(m, "src")
        .select(col("dst").as("src"), col("__m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("src")).agg(min(col("dst")).as("__m"))
      val viaNeighbors = e.join(m, "src")
        .select(col("dst").as("src"), col("__m").as("dst"))
      val viaSelf = m.select(col("src"), col("__m").as("dst"))
      viaNeighbors.union(viaSelf)
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    var edges = canon(e0).distinct().localCheckpoint(eager = true)
    var edgeCount = edges.count()
    var converged = edgeCount == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = true)
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.exceptAll(edges).isEmpty
      releaseCheckpoint(edges) // superseded round's blocks
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponentsContracting: not converged after $maxIter " +
          "rounds (labels are a sound over-segmentation, not final)")
    val parents = edges.groupBy(col("src")).agg(min(col("dst")).as("__p"))
      .select(col("src").as("node"), col("__p"))
    nodes.join(parents, Seq("node"), "left")
      .select(col("node"), coalesce(col("__p"), col("node")).as("cluster"))
  }

  /** End-to-end near-dup pruning — the "dedup my corpus" call a
    * pipeline user actually makes: word-shingle MinHash pairs ->
    * connected components -> keep ONE representative per cluster (the
    * minimum id) plus every unclustered row.
    *
    * Scale: the drop list holds only clustered non-representatives
    * (|near-dups|, typically a small fraction of the corpus), so the
    * final anti-join broadcasts in the common case; every stage is the
    * audited plan of its underlying operator. Exact duplicates are
    * near-dups at any threshold, so a separate exact pass is not
    * needed — but running exactDedup FIRST is cheaper when exact-dup
    * density is high (one hash-aggregate vs pair generation). */
  def dropNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 13, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.6,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val pairs = minhashNearDupsWords(df, idCol, textCol,
      shingleWords, k, bands, threshold, maxBucketSize)
    val losers = connectedComponents(pairs)
      .filter(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------- embeddings

  /** Cosine similarity between two double arrays (deterministic in-order
    * summation). Backed by the codegen'd CosineSimilarityExpression — the
    * higher-order-function composition costs ~30µs per 64-dim pair
    * (interpreted lambdas + intermediate arrays); the tight loop is ~100ns
    * with identical summation order. Equivalence pinned by
    * ExpressionsSpec. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.CosineSimilarityExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(b)))

  /** Reference Column-composition form of cosine (kept for the
    * equivalence spec; interpreted lambdas — do not use in hot paths). */
  private[graft] def cosineComposed(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), _ + _))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  /** LSH-bucketed embedding near-dup: random-hyperplane buckets bound
    * the pairwise work (the scale path the brute-force operator's doc
    * promises). Pairs are generated ONLY within a bucket; `planes`
    * controls bucket granularity (more planes = smaller buckets = fewer
    * pairs + lower recall; near-identical vectors agree on every sign
    * bit, so true near-dups at high thresholds stay bucketed together).
    * Same output shape as embeddingNearDups. */
  def embeddingNearDupsLsh(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, planes: Array[Array[Double]]): DataFrame = {
    val e = df.select(col(idCol),
      transform(col(embCol), x => x.cast("double")).as("__e"))
      .withColumn("__b", Similarity.lshBucket(col("__e"), planes))
    val a = e.select(col(idCol).as("id1"), col("__e").as("__e1"),
      col("__b").as("__b1"))
    val b = e.select(col(idCol).as("id2"), col("__e").as("__e2"),
      col("__b").as("__b2"))
    a.join(b, col("__b1") === col("__b2") && col("id1") < col("id2"))
      .withColumn("cos", cosine(col("__e1"), col("__e2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Brute-force embedding near-dup pairs at `threshold`. Quadratic —
    * verification-scale only; use embeddingNearDupsLsh at scale.
    * The codegen'd single-pass cosine makes per-pair norm recomputation
    * cheaper than the old carry-the-norms join plumbing. */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val e = df.select(col(idCol),
      transform(col(embCol), x => x.cast("double")).as("__e"))
    val a = e.select(col(idCol).as("id1"), col("__e").as("__e1"))
    val b = e.select(col(idCol).as("id2"), col("__e").as("__e2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", cosine(col("__e1"), col("__e2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering embeddings and comparing ONLY within a cluster. A
    * vector is a semantic dup iff some LOWER-id cluster-mate sits at
    * cosine >= `tau`; output one row per dup: (idCol, centroid_id,
    * dup_of = the smallest such mate, n_close = how many there are).
    * Keepers (cluster-local minima) don't appear — anti-join the output
    * to prune, or use [[dropSemanticDups]].
    *
    * Scale shape: assignment is the map-side argmax over a broadcast
    * centroid matrix (no shuffle — the q32 path); the pair join
    * shuffles on centroid_id, so pairwise work is Σ cluster², bounded
    * by k, never corpus². `maxClusterSize` drops pathological clusters
    * (logged) the same way the LSH bucket cap does — a cluster bigger
    * than the cap means k was chosen too small for the corpus, and
    * quadratic work inside it would dwarf everything else. */
  def semDeDup(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, tau: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    require(maxClusterSize > 0, "maxClusterSize must be positive")
    val e = df.select(col(idCol),
      transform(col(embCol), x => x.cast("double")).as("__e"))
    // persisted: the assignment feeds the cap sizing and both pair-join
    // sides — uncached, each subtree would recompute the argmax scan
    // AND re-ship the centroid-matrix literal with its codegen unit
    // (measured ~1 s warm / ~3.5 s cold win at sf0.1); released below
    // once the (small) result is materialized, the minhashNearDups
    // pattern — callers never see the cache
    val assigned = Similarity.assignToCentroids(
        e, idCol, "__e", centroids, outId = "__sd_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val capped =
      if (maxClusterSize == Int.MaxValue) assigned
      else {
        // one aggregation (fills the cache as a side effect); the
        // oversized set is bounded by the CENTROID count, so it fits
        // the driver by construction — a collect + map-only isin
        // filter, not an anti-join whose build side would re-run the
        // same aggregation (the candidatePairs lesson)
        val over = assigned.groupBy(col("centroid_id"))
          .agg(count(lit(1)).as("__csz"))
          .filter(col("__csz") > maxClusterSize)
          .select(col("centroid_id"))
          .collect().map(_.getLong(0))
        if (over.isEmpty) assigned
        else {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"semDeDup: dropping ${over.length} cluster(s) larger than " +
              s"$maxClusterSize vectors — raise k or maxClusterSize")
          assigned.filter(!col("centroid_id").isin(over: _*))
        }
      }
    val a = capped.select(col("centroid_id"),
      col("__sd_id").as("__a_id"), col("__v").as("__a_e"))
    val b = capped.select(col("centroid_id"),
      col("__sd_id").as("__b_id"), col("__v").as("__b_e"))
    val result = a.join(b, Seq("centroid_id"))
      .filter(col("__b_id") < col("__a_id"))
      .filter(cosine(col("__a_e"), col("__b_e")) >= tau)
      .groupBy(col("__a_id"), col("centroid_id"))
      .agg(min(col("__b_id")).as("dup_of"), count(lit(1)).as("n_close"))
      .select(col("__a_id").as(idCol), col("centroid_id"),
        col("dup_of"), col("n_close"))
      .localCheckpoint(eager = true)
    assigned.unpersist()
    result
  }

  /** SemDeDup end-to-end prune: drop every semantic dup, keep cluster
    * representatives (and vectors in dropped-oversized clusters — a
    * capped cluster is NOT silently deleted). Plain anti-join on the
    * loser set: at high tau on a duplicate-heavy corpus the losers are
    * corpus-proportional (Abbas et al. report 30-50% dropped), so the
    * join strategy is left to Spark/AQE — forcing broadcast here would
    * collect an unbounded set to the driver. */
  def dropSemanticDups(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, tau: Double,
      maxClusterSize: Int = 10000): DataFrame = {
    val losers = semDeDup(df, idCol, embCol, centroids, tau,
      maxClusterSize).select(col(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo
    * 1995's merge/purge blocking): order all rows by a sort key and
    * emit every pair within `window` positions — the classic
    * record-linkage blocker when no equality blocking key exists
    * (typos break equality; lexicographic neighbors survive them).
    *
    * Distributed shape: the global rank comes from repartitionByRange
    * on (key, id) + per-partition offsets (RowNumbers.global — range
    * partitions are disjoint and ordered, so partition offset +
    * local row_number IS the total-order rank; parallel, never a
    * single-partition window). Pairs come from a neighbor-BUCKET
    * equi-join: rows land in bucket (rank−1) div window, each row
    * probes its own and the next bucket (a 2× explode), and the
    * |r2−r1| < window filter trims the corners — every qualifying
    * pair appears exactly once (r2 > r1, and r2's bucket is uniquely
    * its own). Output is O(n·window) — linear, never quadratic; the
    * id tiebreak in the sort makes ranks (hence pairs) deterministic
    * under duplicate keys.
    * @return (id1, key1, rank1, id2, key2, rank2) with rank2 > rank1 */
  def sortedNeighborhood(df: DataFrame, idCol: String,
      sortKey: Column, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2 (got $window)")
    val keyed = df.select(col(idCol).as("__id"), sortKey.as("__k"))
    val parts = math.max(1,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranked = RowNumbers.global(
      keyed.repartitionByRange(parts, col("__k"), col("__id"))
        .sortWithinPartitions(col("__k"), col("__id")), "__r")
      .withColumn("__b", expr(s"(__r - 1) div $window"))
    val probe = ranked
      .withColumn("__pb", explode(array(col("__b"), col("__b") + 1)))
      .select(col("__id").as("id1"), col("__k").as("key1"),
        col("__r").as("rank1"), col("__pb"))
    val build = ranked.select(col("__id").as("id2"),
      col("__k").as("key2"), col("__r").as("rank2"),
      col("__b").as("__bb"))
    probe.join(build, col("__pb") === col("__bb"))
      .filter(col("rank2") > col("rank1") &&
        col("rank2") < col("rank1") + window)
      .select(col("id1"), col("key1"), col("rank1"),
        col("id2"), col("key2"), col("rank2"))
  }
}
