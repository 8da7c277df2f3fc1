package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextAnalysis => TA}
import graft.operators.Dedup

/** Dedup operator coverage (north-star extension): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine — each oracle-checked against
  * DuckDB on a corpus with deterministically synthesized duplicates
  * (the base `documents` table has no dups: 500 distinct texts).
  *
  * Corpus construction (both engines):
  *   base docs
  *   + exact copies of doc_id % 7 == 0 at id+10000
  *   + near-dup copies of doc_id % 5 == 0 at id+20000 (3 tokens appended)
  */
object QueriesDedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** documents + exact dups + near dups. */
  private[graft] def corpus(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val exact = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val near = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
    base.unionAll(exact).unionAll(near)
  }

  private[graft] val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 20000, text || ' zz yy xx' FROM documents
      |  WHERE doc_id % 5 = 0)""".stripMargin

  // --------------------------------------------------------------- q14
  /** Exact dedup: fingerprint groups with >1 copy + keeper id. */
  private def q14Exact(s: SparkSession, dir: String): DataFrame =
    Dedup.dupGroups(corpus(s, dir), "doc_id", "text")
      .orderBy(col("fp"))

  private val q14Sql =
    s"""WITH $corpusSql
       |SELECT substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fp,
       |  count(*) AS n_copies, min(doc_id) AS keeper
       |FROM corpus
       |GROUP BY 1 HAVING count(*) > 1 ORDER BY fp""".stripMargin

  // -------------------------------------------------------------- q419
  /** Index TAKEDOWN lifecycle (IncrementalDedup.deleteBatch /
    * PersistentIndex.deleteTag) — the right-to-be-forgotten
    * operation a real corpus pipeline owes its sources: deleting a
    * retracted batch must reach the DERIVED fingerprint index, not
    * just the corpus, or the index keeps silently rejecting re-
    * submissions of documents the pipeline no longer holds. Four
    * steps, each pinned as (step, n, id_sum): day0 accepts the
    * doc_id%4=0 documents; day1 accepts the %4=1 documents (cross-
    * batch dups rejected); the index is COMPACTED (folding day0's
    * rows into shared files — forcing the takedown's slow rewrite
    * arm, not just the cheap own-file delete) and day0 is taken
    * down (n = index rows removed); day2 re-submits day0's texts
    * (ids +50000) plus the fresh %4=2 documents — the removed texts
    * are accepted AGAIN (the index kept no memory of day0) while
    * texts day1 accepted stay rejected. The oracle restates the
    * whole state machine declaratively from the q14 fingerprint
    * chain: per-step min-id keepers, day1 = keepers minus day0
    * texts, takedown count = |day0 keepers|, day2 = keepers minus
    * day1-accepted texts ONLY. Any takedown bug — rows left behind,
    * too much removed, layout flattened — shifts a count or an
    * id_sum. */
  /** Best-effort recursive delete of a gate's scratch directory —
    * lifecycle gates that build a real on-disk index must not leave
    * an orphaned tree per invocation (Verify + min-of-N Bench = four
    * trees per full round otherwise). Results are localCheckpoint-
    * materialized before this runs, so the files are no longer
    * needed. */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (!Files.exists(root)) return
    val s = Files.walk(root)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    finally s.close()
  }

  private def q419IndexTakedown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.IncrementalDedup
    val d = docs(s, dir)
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft_takedown_idx")
    val idx = idxRoot.toString + "/idx"
    try {
    def accept(batch: org.apache.spark.sql.DataFrame, tag: String,
        step: String) =
      IncrementalDedup.acceptBatch(batch, "doc_id", "text", idx, tag)
        .agg(count(lit(1)).cast("long").as("n"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
        .select(lit(step).as("step"), col("n"), col("id_sum"))
        .localCheckpoint(true) // sequence the side effects eagerly
    val a1 = accept(d.filter(col("doc_id") % 4 === 0), "day0", "1_day0")
    val a2 = accept(d.filter(col("doc_id") % 4 === 1), "day1", "2_day1")
    IncrementalDedup.compactIndex(s, idx) // fold day0 into shared files
    val removed = IncrementalDedup.deleteBatch(s, idx, "day0")
    val a3 = Seq(("3_takedown", removed, 0L)).toDF("step", "n", "id_sum")
    val a4 = accept(
      d.filter(col("doc_id") % 4 === 0 || col("doc_id") % 4 === 2)
        .select((col("doc_id") + 50000L).as("doc_id"), col("text")),
      "day2", "4_day2")
    a1.unionAll(a2).unionAll(a3).unionAll(a4).orderBy(col("step"))
    // every step row is localCheckpoint-materialized above, so the
    // index tree is dead weight the moment the unions are built
    } finally deleteRecursively(idxRoot)
  }

  private val q419Sql =
    """WITH d AS (
      |  SELECT doc_id, substr(md5(regexp_replace(lower(trim(text)),
      |    '\s+', ' ', 'g')), 1, 16) AS fp
      |  FROM documents),
      |b1k AS (SELECT fp, min(doc_id) AS id FROM d
      |        WHERE doc_id % 4 = 0 GROUP BY fp),
      |b2k AS (SELECT fp, min(doc_id) AS id FROM d
      |        WHERE doc_id % 4 = 1 GROUP BY fp),
      |b2a AS (SELECT fp, id FROM b2k
      |        WHERE fp NOT IN (SELECT fp FROM b1k)),
      |b3k AS (SELECT fp, min(doc_id + 50000) AS id FROM d
      |        WHERE doc_id % 4 IN (0, 2) GROUP BY fp),
      |b3a AS (SELECT fp, id FROM b3k
      |        WHERE fp NOT IN (SELECT fp FROM b2a))
      |SELECT '1_day0' AS step, CAST(count(*) AS BIGINT) AS n,
      |  CAST(coalesce(sum(id), 0) AS BIGINT) AS id_sum FROM b1k
      |UNION ALL
      |SELECT '2_day1', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(id), 0) AS BIGINT) FROM b2a
      |UNION ALL
      |SELECT '3_takedown', CAST((SELECT count(*) FROM b1k) AS BIGINT),
      |  CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT '4_day2', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(id), 0) AS BIGINT) FROM b3a
      |ORDER BY step""".stripMargin

  // --------------------------------------------------------------- q15
  /** n-gram Jaccard on constructed pairs: each near-dup against its
    * original, plus adjacent-doc non-dup controls. */
  private def q15Ngram(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val pairsIds = docs(s, dir).select(col("doc_id"))
      .withColumn("id2",
        when(col("doc_id") % 5 === 0, col("doc_id") + 20000)
          .otherwise(col("doc_id") + 1))
      .withColumnRenamed("doc_id", "id1")
    // persisted: consumed by both join branches (id1 and id2); without
    // the cache the shingle pass runs twice over the corpus. Sorted
    // once here so the pair verify is the codegen'd merge intersect.
    // Scale.spread: the shingle+sort pass is per-row-heavy and the
    // fixture is single-split (guide §2.5; r12)
    val sh = graft.operators.Scale.spread(c).select(col("doc_id"),
      array_sort(TA.charShingles(col("text"), 4)).as("sh")).persist()
    pairsIds
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"),
        Dedup.jaccardSorted(col("sh1"), col("sh2")).as("jaccard"))
      .orderBy(col("id1"))
  }

  /** 4-char-shingle CTE over an arbitrary source relation (mirrors
    * TA.charShingles' normalize-then-slide semantics). */
  private[graft] def shinglesSqlFrom(src: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |    CASE WHEN length(t) <= 4 THEN [t]
       |         ELSE list_distinct(list_transform(range(1, length(t) - 2),
       |                i -> substr(t, i, 4))) END AS s
       |  FROM (SELECT doc_id,
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |        FROM $src))""".stripMargin

  private val shinglesSqlDef = shinglesSqlFrom("corpus")

  private val q15Sql =
    s"""WITH $corpusSql,
       |$shinglesSqlDef,
       |pairs AS (
       |  SELECT doc_id AS id1,
       |    CASE WHEN doc_id % 5 = 0 THEN doc_id + 20000
       |         ELSE doc_id + 1 END AS id2
       |  FROM documents)
       |SELECT p.id1, p.id2,
       |  CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
       |       THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |            / len(list_distinct(list_concat(a.s, b.s)))
       |       ELSE 0.0 END AS jaccard
       |FROM pairs p
       |JOIN sh a ON a.doc_id = p.id1
       |JOIN sh b ON b.doc_id = p.id2
       |ORDER BY p.id1""".stripMargin

  // -------------------------------------------------------------- q350
  /** Train/test split-leakage audit: the md5 80/20 split crossed with
    * the SimHash near-dup pair set — every near-dup pair straddling
    * the split is evaluation contamination (the test doc has a
    * near-copy in training). Reports the cross-split pair count, the
    * distinct contaminated test docs, and the test-side leakage rate
    * — the ML-hygiene audit a split owes its benchmark numbers, and a
    * composition of two individually-proven stages (deterministic
    * split × near-dup pairs). */
  private def q350SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val c = corpus(s, dir)
    val split = c.select(col("doc_id"),
        (Sampling.hashBucket(col("doc_id"), 100) < 80).as("is_train"))
      .localCheckpoint(true)
    val pairs = Dedup.simhashNearDups(c, "doc_id", "text",
        maxHamming = 8, maxBucketSize = Int.MaxValue)
      .select(col("id1"), col("id2"))
    val lab = pairs
      .join(split.select(col("doc_id").as("id1"),
        col("is_train").as("t1")), Seq("id1"))
      .join(split.select(col("doc_id").as("id2"),
        col("is_train").as("t2")), Seq("id2"))
      .localCheckpoint(true)
    val cross = lab.filter(col("t1") =!= col("t2"))
    val contaminated = cross
      .select(when(!col("t1"), col("id1")).otherwise(col("id2"))
        .as("tid"))
      .distinct()
    val nTest = split.filter(!col("is_train"))
      .agg(count(lit(1)).as("n_test"))
    lab.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("t1") =!= col("t2"), 1L).otherwise(0L))
          .as("n_cross"))
      .crossJoin(broadcast(nTest))
      .crossJoin(broadcast(
        contaminated.agg(count(lit(1)).as("n_contaminated"))))
      .select(col("n_pairs"), col("n_cross"), col("n_test"),
        col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_test").cast("double")).as("leakage_rate"))
  }

  private lazy val q350Sql =
    s"""WITH $simhashPairsCtes,
       |spl AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      ::BIGINT % 100 < 80 AS is_train
       |  FROM corpus),
       |lab AS (
       |  SELECT p.id1, p.id2, s1.is_train AS t1, s2.is_train AS t2
       |  FROM pairs p
       |  JOIN spl s1 ON s1.doc_id = p.id1
       |  JOIN spl s2 ON s2.doc_id = p.id2),
       |cont AS (
       |  SELECT count(DISTINCT CASE WHEN NOT t1 THEN id1 ELSE id2 END)
       |    AS n_contaminated
       |  FROM lab WHERE t1 != t2),
       |nt AS (SELECT count(*) AS n_test FROM spl WHERE NOT is_train)
       |SELECT (SELECT count(*) FROM lab) AS n_pairs,
       |  (SELECT CAST(sum(CASE WHEN t1 != t2 THEN 1 ELSE 0 END)
       |     AS BIGINT) FROM lab) AS n_cross,
       |  nt.n_test, cont.n_contaminated,
       |  CAST(cont.n_contaminated AS DOUBLE)
       |    / CAST(nt.n_test AS DOUBLE) AS leakage_rate
       |FROM nt CROSS JOIN cont""".stripMargin

  // -------------------------------------------------------------- q354
  /** Near-dup transitivity audit: for every wedge in the SimHash pair
    * graph (a~b, a~c), is the third side b~c also within the Hamming
    * threshold? Violations are exactly where cluster-level dedup
    * (connected components) over-merges relative to the pairwise
    * relation — the structural risk every CC-based dedup accepts,
    * here measured instead of assumed. Wedge endpoints are
    * deduplicated; the third-side Hamming is recomputed from the
    * sketches (bounded: wedges live inside near-dup clusters). */
  private def q354TransitivityAudit(s: SparkSession, dir: String)
      : DataFrame = {
    val c = corpus(s, dir)
    // ONE sketch pass (r12): the pair graph and the third-side
    // Hamming audit read the same 32-bit sketch — the former shape
    // ran the tokenize+md5 pass twice (once inside simhashNearDups,
    // once here). Scale.spread parallelizes the single-split fixture
    // scan (guide §2.5); persisted because the banding branch, both
    // pair-verify branches, and both third-side joins consume it.
    val sk = graft.operators.Scale.spread(c).select(col("doc_id"),
        Dedup.simhash32(TA.tokens(col("text"))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.simhashNearDupsFromSketch(sk, "doc_id", "sh",
        maxHamming = 8, maxBucketSize = Int.MaxValue)
      .select(col("id1"), col("id2"))
    val adj = pairs.unionAll(pairs.select(col("id2").as("id1"),
      col("id1").as("id2")))
    val wedges = adj.select(col("id1").as("ctr"), col("id2").as("x"))
      .join(adj.select(col("id1").as("ctr"), col("id2").as("y")),
        Seq("ctr"))
      .filter(col("x") < col("y"))
      .select(col("x"), col("y")).distinct()
    val third = wedges
      .join(sk.select(col("doc_id").as("x"), col("sh").as("shx")),
        Seq("x"))
      .join(sk.select(col("doc_id").as("y"), col("sh").as("shy")),
        Seq("y"))
      .select(bit_count(col("shx").bitwiseXOR(col("shy")))
        .cast("long").as("h3"))
    // eager 1-row materialization so the sketch cache releases NOW
    // instead of leaking for the session lifetime (the r5 discipline)
    val out = third.agg(count(lit(1)).as("n_wedges"),
        sum(when(col("h3") <= 8L, 1L).otherwise(0L)).as("n_closed"),
        sum(when(col("h3") > 8L, 1L).otherwise(0L)).as("n_violations"),
        max(col("h3")).as("max_third_hamming"))
      .select(col("n_wedges"), col("n_closed"), col("n_violations"),
        col("max_third_hamming"),
        (col("n_violations").cast("double") /
          col("n_wedges").cast("double")).as("violation_rate"))
      .localCheckpoint(true)
    sk.unpersist(blocking = false)
    out
  }

  private lazy val q354Sql =
    s"""WITH $simhashPairsCtes,
       |adj AS (
       |  SELECT id1, id2 FROM pairs
       |  UNION ALL SELECT id2, id1 FROM pairs),
       |wedges AS (
       |  SELECT DISTINCT a.id2 AS x, b.id2 AS y
       |  FROM adj a JOIN adj b ON b.id1 = a.id1 AND a.id2 < b.id2),
       |third AS (
       |  SELECT CAST(bit_count(xor(sx.sh, sy.sh)) AS BIGINT) AS h3
       |  FROM wedges w
       |  JOIN sketch sx ON sx.doc_id = w.x
       |  JOIN sketch sy ON sy.doc_id = w.y)
       |SELECT count(*) AS n_wedges,
       |  CAST(sum(CASE WHEN h3 <= 8 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_closed,
       |  CAST(sum(CASE WHEN h3 > 8 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violations,
       |  max(h3) AS max_third_hamming,
       |  CAST(sum(CASE WHEN h3 > 8 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS violation_rate
       |FROM third""".stripMargin

  // -------------------------------------------------------------- q355
  /** LSH bucket-cap sensitivity audit: the word-MinHash pipeline run
    * UNCAPPED and with maxBucketSize = 5, reporting the verified-pair
    * counts, the pairs LOST to the cap, and how many band buckets the
    * cap dropped — the production cap is a documented skew trade
    * (hot buckets are quadratic); this row prices it instead of
    * assuming it. Oracle replays both candidate sets with a per-band
    * size filter. */
  private def q355CapSensitivity(s: SparkSession, dir: String)
      : DataFrame = {
    val c = corpus(s, dir)
    def run(cap: Int): DataFrame =
      Dedup.minhashNearDupsWords(c, "doc_id", "text",
        shingleWords = 5, k = 16, bands = 4, threshold = 0.5,
        maxBucketSize = cap).select(col("id1"), col("id2"))
    val full = run(Int.MaxValue).localCheckpoint(true)
    val capped = run(5).localCheckpoint(true)
    val nFull = full.agg(count(lit(1)).as("n_pairs_uncapped"))
    val nCap = capped.agg(count(lit(1)).as("n_pairs_cap5"))
    nFull.crossJoin(broadcast(nCap))
      .select(col("n_pairs_uncapped"), col("n_pairs_cap5"),
        (col("n_pairs_uncapped") - col("n_pairs_cap5"))
          .as("pairs_lost"),
        (col("n_pairs_cap5").cast("double") /
          col("n_pairs_uncapped").cast("double")).as("pair_recall"))
  }

  private lazy val q355Sql =
    s"""WITH $corpusSql,
       |${wordShinglesSqlFrom("corpus")},
       |sig AS (
       |  SELECT doc_id, s, [
       |    $sigItemsSql] AS g
       |  FROM sh),
       |banded AS (
       |  SELECT doc_id, s, unnest([
       |    CAST(g[1] AS VARCHAR) || '|' || CAST(g[2] AS VARCHAR)
       |      || '|' || CAST(g[3] AS VARCHAR) || '|'
       |      || CAST(g[4] AS VARCHAR),
       |    CAST(g[5] AS VARCHAR) || '|' || CAST(g[6] AS VARCHAR)
       |      || '|' || CAST(g[7] AS VARCHAR) || '|'
       |      || CAST(g[8] AS VARCHAR),
       |    CAST(g[9] AS VARCHAR) || '|' || CAST(g[10] AS VARCHAR)
       |      || '|' || CAST(g[11] AS VARCHAR) || '|'
       |      || CAST(g[12] AS VARCHAR),
       |    CAST(g[13] AS VARCHAR) || '|' || CAST(g[14] AS VARCHAR)
       |      || '|' || CAST(g[15] AS VARCHAR) || '|'
       |      || CAST(g[16] AS VARCHAR)]) AS band
       |  FROM sig),
       |bsz AS (SELECT band, count(*) AS bc FROM banded GROUP BY 1),
       |candf AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.doc_id < b.doc_id),
       |candc AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM banded a
       |  JOIN bsz ON bsz.band = a.band AND bsz.bc <= 5
       |  JOIN banded b ON b.band = a.band AND a.doc_id < b.doc_id),
       |vf AS (
       |  SELECT count(*) AS n_pairs_uncapped FROM candf c
       |  JOIN sh a ON a.doc_id = c.id1
       |  JOIN sh b ON b.doc_id = c.id2
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
       |vc AS (
       |  SELECT count(*) AS n_pairs_cap5 FROM candc c
       |  JOIN sh a ON a.doc_id = c.id1
       |  JOIN sh b ON b.doc_id = c.id2
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
       |SELECT vf.n_pairs_uncapped, vc.n_pairs_cap5,
       |  vf.n_pairs_uncapped - vc.n_pairs_cap5 AS pairs_lost,
       |  CAST(vc.n_pairs_cap5 AS DOUBLE)
       |    / CAST(vf.n_pairs_uncapped AS DOUBLE) AS pair_recall
       |FROM vf CROSS JOIN vc""".stripMargin

  // -------------------------------------------------------------- q357
  /** Dedup savings census — the capacity number dedup is bought for:
    * per duplicate fingerprint group, the bytes the non-keeper copies
    * occupy (keeper = min id, its own length retained), summed into
    * docs-removed / bytes-saved / savings share of the corpus. Exact
    * integer byte accounting over the q14 group structure. */
  private def q357DedupSavings(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"),
        TA.fingerprint(col("text")).as("fp"))
    val groups = c.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"),
        min(struct(col("doc_id"), col("len"))).as("__k"))
      .select(col("n"), col("total_len"),
        col("__k.len").as("keeper_len"))
    val tot = c.agg(sum(col("len")).as("bytes_total"),
      count(lit(1)).as("n_docs"))
    groups.filter(col("n") > 1L)
      .agg(count(lit(1)).as("n_dup_groups"),
        sum(col("n") - 1L).as("n_docs_removed"),
        sum(col("total_len") - col("keeper_len")).as("bytes_saved"))
      .crossJoin(broadcast(tot))
      .select(col("n_dup_groups"), col("n_docs_removed"),
        col("bytes_saved"), col("n_docs"), col("bytes_total"),
        (col("bytes_saved").cast("double") /
          col("bytes_total").cast("double")).as("savings_share"))
  }

  private lazy val q357Sql =
    s"""WITH $corpusSql,
       |f AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
       |    substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
       |      'g')), 1, 16) AS fp
       |  FROM corpus),
       |k AS (
       |  SELECT fp, count(*) AS n, CAST(sum(len) AS BIGINT)
       |      AS total_len,
       |    arg_min(len, doc_id) AS keeper_len
       |  FROM f GROUP BY 1),
       |tot AS (SELECT CAST(sum(len) AS BIGINT) AS bytes_total,
       |        count(*) AS n_docs FROM f)
       |SELECT count(CASE WHEN n > 1 THEN 1 END) AS n_dup_groups,
       |  CAST(sum(CASE WHEN n > 1 THEN n - 1 END) AS BIGINT)
       |    AS n_docs_removed,
       |  CAST(sum(CASE WHEN n > 1 THEN total_len - keeper_len END)
       |    AS BIGINT) AS bytes_saved,
       |  tot.n_docs, tot.bytes_total,
       |  CAST(sum(CASE WHEN n > 1 THEN total_len - keeper_len END)
       |    AS DOUBLE) / CAST(tot.bytes_total AS DOUBLE) AS savings_share
       |FROM k CROSS JOIN tot
       |GROUP BY tot.n_docs, tot.bytes_total""".stripMargin

  // -------------------------------------------------------------- q363
  /** LSH precision audit — q296's complement: of the candidate pairs
    * the 4×4 banding surfaces, how many survive exact-Jaccard
    * verification at τ = 0.5? Precision prices the VERIFY stage
    * (every false candidate costs a sorted-merge intersect at scale),
    * the way recall priced the banding's misses. Candidates are
    * reconstructed with the same band expression the pipeline uses.
    */
  private def q363LshPrecision(s: SparkSession, dir: String)
      : DataFrame =
    // one-pass audit (r12): the former two-arm form (candidatePairs +
    // minhashNearDupsWords) shingled, minhashed, banded and generated
    // candidates TWICE over the corpus; the fused operator computes
    // the identical (n_candidates, n_verified, precision) row from
    // one shared pass — same banding (k=16, bands=4 ⇒ 4 rows/band),
    // same uncapped buckets, same exact-Jaccard verify at 0.5
    Dedup.minhashPrecisionAuditWords(corpus(s, dir), "doc_id", "text",
      shingleWords = 5, k = 16, bands = 4, threshold = 0.5,
      maxBucketSize = Int.MaxValue)

  private lazy val q363Sql =
    s"""WITH $corpusSql,
       |${wordShinglesSqlFrom("corpus")},
       |$minhashCandCtes,
       |nc AS (SELECT count(*) AS n_candidates FROM cand),
       |nv AS (
       |  SELECT count(*) AS n_verified FROM cand c
       |  JOIN sh a ON a.doc_id = c.id1
       |  JOIN sh b ON b.doc_id = c.id2
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
       |SELECT nc.n_candidates, nv.n_verified,
       |  CAST(nv.n_verified AS DOUBLE)
       |    / CAST(nc.n_candidates AS DOUBLE) AS precision
       |FROM nc CROSS JOIN nv""".stripMargin

  // -------------------------------------------------------------- q331
  /** MinHash estimator audit over the q15 planted pairs: the
    * signature-agreement estimate (#matching minima / 16) against the
    * exact Jaccard on the same shingle sets — the estimator-quality
    * self-check a MinHash deployment owes its tuning (band math
    * assumes E[est] = J; this row hands the gate the actual per-pair
    * residuals). Deterministic end to end: the same affine
    * permutation family both engines compute from md5. */
  private def q331MinhashEstimate(s: SparkSession, dir: String)
      : DataFrame = {
    val c = corpus(s, dir)
    val pairsIds = docs(s, dir).select(col("doc_id"))
      .withColumn("id2",
        when(col("doc_id") % 5 === 0, col("doc_id") + 20000)
          .otherwise(col("doc_id") + 1))
      .withColumnRenamed("doc_id", "id1")
    val sh = c.select(col("doc_id"),
        array_sort(TA.charShingles(col("text"), 4)).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 16))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    pairsIds
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1"),
        col("sig").as("sig1")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2"),
        col("sig").as("sig2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        aggregate(zip_with(col("sig1"), col("sig2"),
          (a, b) => when(a === b, 1L).otherwise(0L)), lit(0L),
          (acc, x) => acc + x).as("matches"),
        Dedup.jaccardSorted(col("sh1"), col("sh2")).as("jaccard"))
      .select(col("id1"), col("id2"), col("matches"),
        (col("matches").cast("double") / 16.0).as("est"),
        col("jaccard"),
        abs(col("matches").cast("double") / 16.0 - col("jaccard"))
          .as("abs_err"))
      .orderBy(col("id1"))
  }

  private lazy val q331Sql =
    s"""WITH $corpusSql,
       |$shinglesSqlDef,
       |sig AS (
       |  SELECT doc_id, s, [
       |    $sigItemsSql] AS g
       |  FROM sh),
       |pairs AS (
       |  SELECT doc_id AS id1,
       |    CASE WHEN doc_id % 5 = 0 THEN doc_id + 20000
       |         ELSE doc_id + 1 END AS id2
       |  FROM documents)
       |SELECT p.id1, p.id2,
       |  CAST(len(list_filter(range(1, 17), i -> a.g[i] = b.g[i]))
       |    AS BIGINT) AS matches,
       |  CAST(len(list_filter(range(1, 17), i -> a.g[i] = b.g[i]))
       |    AS DOUBLE) / 16.0 AS est,
       |  CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
       |       THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |            / len(list_distinct(list_concat(a.s, b.s)))
       |       ELSE 0.0 END AS jaccard,
       |  abs(CAST(len(list_filter(range(1, 17), i -> a.g[i] = b.g[i]))
       |      AS DOUBLE) / 16.0
       |    - CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
       |        THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |             / len(list_distinct(list_concat(a.s, b.s)))
       |        ELSE 0.0 END) AS abs_err
       |FROM pairs p
       |JOIN sig a ON a.doc_id = p.id1
       |JOIN sig b ON b.doc_id = p.id2
       |ORDER BY p.id1""".stripMargin

  // -------------------------------------------------------------- q319
  /** Rarity-weighted Jaccard over the q15 planted pairs: token weight
    * w = N // df (integer floor division — shared boilerplate words
    * weigh ~1, near-unique content words weigh ~N), similarity =
    * Σw(A∩B) / Σw(A∪B). The weighted form separates template reuse
    * from genuine content overlap — the signal plain Jaccard blurs on
    * boilerplate-heavy corpora — and with INTEGER weights both sums
    * are exact BIGINTs (the standard IDF=log weighting would be libm
    * territory). Scale: one df aggregate keyed by token, pair token
    * tables full-outer-joined on (pair, token) — never doc×doc. */
  private def q319WeightedJaccard(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val toks = c.select(col("doc_id"),
        explode(array_distinct(TA.tokens(col("text")))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nDocs = c.count()
    // N // df: exact for these magnitudes (double division correctly
    // rounded, fraction can't bridge to the next integer)
    val w = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"), floor(lit(nDocs) / col("df")).cast("long")
        .as("w"))
    val pairsIds = docs(s, dir).select(col("doc_id"))
      .withColumn("id2",
        when(col("doc_id") % 5 === 0, col("doc_id") + 20000)
          .otherwise(col("doc_id") + 1))
      .withColumnRenamed("doc_id", "id1")
    val at = pairsIds
      .join(toks.withColumnRenamed("doc_id", "id1"), Seq("id1"))
      .select(col("id1"), col("id2"), col("tok"), lit(1).as("ina"))
    val bt = pairsIds
      .join(toks.withColumnRenamed("doc_id", "id2"), Seq("id2"))
      .select(col("id1"), col("id2"), col("tok"), lit(1).as("inb"))
    at.join(bt, Seq("id1", "id2", "tok"), "full_outer")
      .join(w, Seq("tok"))
      .groupBy(col("id1"), col("id2"))
      .agg(sum(when(col("ina") === 1 && col("inb") === 1, col("w"))
          .otherwise(0L)).as("inter_w"),
        sum(col("w")).as("union_w"))
      .select(col("id1"), col("id2"), col("inter_w"), col("union_w"),
        (col("inter_w").cast("double") / col("union_w").cast("double"))
          .as("wjaccard"))
      .orderBy(col("id1"))
  }

  private lazy val q319Sql =
    s"""WITH $corpusSql,
       |tk AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    string_split_regex(trim(text), '\\s+'))) AS tok
       |  FROM corpus WHERE trim(text) != ''),
       |nd AS (SELECT count(*) AS nd FROM corpus),
       |w AS (
       |  SELECT tok, nd // df AS w
       |  FROM (SELECT tok, count(*) AS df FROM tk GROUP BY 1)
       |  CROSS JOIN nd),
       |pairs AS (
       |  SELECT doc_id AS id1,
       |    CASE WHEN doc_id % 5 = 0 THEN doc_id + 20000
       |         ELSE doc_id + 1 END AS id2
       |  FROM documents),
       |a AS (SELECT p.id1, p.id2, tk.tok, 1 AS ina
       |      FROM pairs p JOIN tk ON tk.doc_id = p.id1),
       |b AS (SELECT p.id1, p.id2, tk.tok, 1 AS inb
       |      FROM pairs p JOIN tk ON tk.doc_id = p.id2),
       |u AS (
       |  SELECT coalesce(a.id1, b.id1) AS id1,
       |    coalesce(a.id2, b.id2) AS id2,
       |    coalesce(a.tok, b.tok) AS tok,
       |    coalesce(ina, 0) AS ina, coalesce(inb, 0) AS inb
       |  FROM a FULL JOIN b
       |    ON a.id1 = b.id1 AND a.id2 = b.id2 AND a.tok = b.tok)
       |SELECT u.id1, u.id2,
       |  CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN w.w ELSE 0 END)
       |    AS BIGINT) AS inter_w,
       |  CAST(sum(w.w) AS BIGINT) AS union_w,
       |  CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN w.w ELSE 0 END)
       |      AS DOUBLE)
       |    / CAST(sum(w.w) AS DOUBLE) AS wjaccard
       |FROM u JOIN w ON w.tok = u.tok
       |GROUP BY 1, 2 ORDER BY id1""".stripMargin

  // -------------------------------------------------------------- q296
  /** LSH recall evaluation — the self-audit every probabilistic dedup
    * deployment owes its users: ground truth from the EXACT
    * set-similarity join (SetSimJoin.jaccardSelfJoin, prefix-filtered)
    * vs the q37 word-MinHash-LSH pipeline's verified pairs, over the
    * same 5-word shingle sets at τ = 0.5. n_extra pins the subset
    * property (verification can only MISS, never invent); recall is
    * the single float division. Both sides are existing oracle-proven
    * operators — this row checks them against EACH OTHER and hands
    * the gate the counts. */
  private def q296LshRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SetSimJoin
    // deterministic 1-in-4 doc sample: the audit's exact ground truth
    // is quadratic-ish in corpus size (prefix self-join), so recall is
    // measured on a hash-stable sub-corpus — pair work drops 16×, the
    // estimate stays unbiased, and at 100 TB a sampled stratum is the
    // ONLY affordable shape for a ground-truth audit (never the corpus)
    val c = corpus(s, dir)
      .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 4) === 0)
    // audit space: 5-word shingles (the q37 pipeline) — sets are ~6×
    // smaller than char-4-grams, so the exact ground truth's prefix
    // join stays affordable; the ground truth verifies over 64-bit
    // hashed shingles (primitive long merges — distinct strings map to
    // distinct longs at md5-prefix collision odds ~n²/2⁶⁵, so the pair
    // set equals the string-set join the oracle computes).
    val hashedShingles = {
      import org.apache.spark.sql.graftshim.ColumnBridge
      ColumnBridge.column(graft.expressions.HashedShinglesExpression(
        ColumnBridge.expression(TA.wordShingles(col("text"), 5))))
    }
    val exact = SetSimJoin.jaccardSelfJoin(c, "doc_id", hashedShingles,
        tau = 0.5)
      .select(col("id1"), col("id2"))
      .localCheckpoint(true)
    // checkpoint: three downstream aggregates read this frame — without
    // it the whole MinHash pipeline re-executes per aggregate (the
    // r6 bench caught exactly that: 59.6 s with 33 s of GC)
    // AUDIT-ONLY: maxBucketSize is DISABLED here — capping a hot LSH
    // bucket drops candidate pairs, which would bias the measured
    // recall downward and defeat the audit's whole purpose. This is
    // safe ONLY because the audit runs on the 1-in-4 stratum above
    // (bounded pair work by construction). Production dedup pipelines
    // must NEVER copy this call shape: every non-audit invocation in
    // the repo keeps the default cap, which is what bounds a
    // pathological bucket (all-identical boilerplate) at corpus scale.
    val lsh = Dedup.minhashNearDupsWords(c, "doc_id", "text",
        shingleWords = 5, k = 16, bands = 4, threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .select(col("id1"), col("id2"))
      .localCheckpoint(true)
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nLsh = lsh.agg(count(lit(1)).as("n_lsh"))
    val nHits = lsh.join(exact, Seq("id1", "id2"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    nExact.crossJoin(broadcast(nLsh)).crossJoin(broadcast(nHits))
      .select(col("n_exact"), col("n_lsh"), col("n_hits"),
        (col("n_lsh") - col("n_hits")).as("n_extra"),
        (col("n_hits").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }

  // lazy: interpolates minhashCandCtes, declared further down the file
  private lazy val q296Sql = {
    s"""WITH $corpusSql,
       |corpus_s AS (
       |  SELECT * FROM corpus
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |    ::BIGINT % 4 = 0),
       |${wordShinglesSqlFrom("corpus_s")},
       |$minhashCandCtes,
       |exact AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |    AND len(a.s) >= CAST(ceil(0.5 * len(b.s)) AS BIGINT)
       |    AND len(b.s) >= CAST(ceil(0.5 * len(a.s)) AS BIGINT)
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
       |lsh AS (
       |  SELECT c.id1, c.id2 FROM cand c
       |  JOIN sh a ON a.doc_id = c.id1
       |  JOIN sh b ON b.doc_id = c.id2
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
       |hits AS (SELECT * FROM lsh INTERSECT SELECT * FROM exact),
       |extra AS (SELECT * FROM lsh EXCEPT SELECT * FROM exact)
       |SELECT (SELECT count(*) FROM exact) AS n_exact,
       |  (SELECT count(*) FROM lsh) AS n_lsh,
       |  (SELECT count(*) FROM hits) AS n_hits,
       |  (SELECT count(*) FROM extra) AS n_extra,
       |  CAST((SELECT count(*) FROM hits) AS DOUBLE)
       |    / CAST((SELECT count(*) FROM exact) AS DOUBLE) AS recall""".stripMargin
  }

  // --------------------------------------------------------------- q16
  /** MinHash+LSH near-dup pipeline: shingle -> 16-hash signature -> 4
    * bands of 4 -> bucket-join candidates -> exact-Jaccard >= 0.5.
    * 4-row bands keep P(candidate) = 4*sim^4: ~0.5% for ~0.26-similar
    * word-salad controls vs ~97% for >=0.85 near-dups — bench showed
    * 2-row bands admit ~20% of ALL pairs on this shared-vocab corpus. */
  private def q16Minhash(s: SparkSession, dir: String): DataFrame =
    // explicitly UNCAPPED: the DuckDB oracle enumerates band buckets
    // with no size cap, so the oracle-checked form must not drop any
    // (the finite DefaultMaxBucketSize stays for end-user calls)
    Dedup.minhashNearDups(corpus(s, dir), "doc_id", "text",
      shingleSize = 4, k = 16, bands = 4, threshold = 0.5,
      maxBucketSize = Int.MaxValue)
      .orderBy(col("id1"), col("id2"))

  /** MinHash sig/banded/cand CTEs over an `sh(doc_id, s)` shingle
    * relation — same affine permutation family as
    * MinHashBandsExpression: one md5 per shingle,
    * ((a_i*h1)%P + (b_i*h2)%P + c_i) % P minima over the two 4-byte
    * md5 prefixes, pipe-joined band keys — all operands < 2^31 so
    * BIGINT math matches Spark's long math. k=16, 4 bands of 4. */
  /** The 16 affine-permutation minima as a SQL list literal over an
    * `s` shingle-list column — shared by the cand CTEs and the q331
    * estimator audit. */
  private[graft] val sigItemsSql: String = {
    import graft.expressions.MinHashScheme
    val h1 = "(('0x' || substr(md5(x), 1, 8))::BIGINT & 2147483647)"
    val h2 = "(('0x' || substr(md5(x), 9, 8))::BIGINT & 2147483647)"
    (0 until 16).map(i =>
      s"list_min(list_transform(s, x -> ((${MinHashScheme.a(i)} * $h1) " +
        s"% ${MinHashScheme.P} + (${MinHashScheme.b(i)} * $h2) " +
        s"% ${MinHashScheme.P} + ${MinHashScheme.c(i)}) % ${MinHashScheme.P}))")
      .mkString(",\n       |    ")
  }

  private[graft] val minhashCandCtes: String = {
    val sigItems = sigItemsSql
    val bandItems = (0 until 4).map { b =>
      (0 until 4).map(r => s"CAST(g[${4 * b + r + 1}] AS VARCHAR)")
        .mkString(" || '|' || ")
    }.mkString(", ")
    s"""sig AS (
       |  SELECT doc_id, s, [
       |    $sigItems] AS g
       |  FROM sh),
       |banded AS (
       |  SELECT doc_id, s, unnest([$bandItems]) AS band
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.doc_id < b.doc_id)""".stripMargin
  }

  private val q16Sql = {
    s"""WITH $corpusSql,
       |$shinglesSqlDef,
       |$minhashCandCtes
       |SELECT c.id1, c.id2,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |FROM cand c
       |JOIN sh a ON a.doc_id = c.id1
       |JOIN sh b ON b.doc_id = c.id2
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
       |ORDER BY id1, id2""".stripMargin
  }

  // --------------------------------------------------------------- q37
  /** Word-shingle MinHash near-dup — the canonical LLM-corpus dedup
    * recipe (n-gram word windows; 5 words here, the corpus' texts run
    * ~50 tokens). Same affine LSH machinery as q16 over a different
    * shingle unit. */
  private def q37MinhashWords(s: SparkSession, dir: String): DataFrame =
    // uncapped for oracle parity, as in q16
    Dedup.minhashNearDupsWords(corpus(s, dir), "doc_id", "text",
      shingleWords = 5, k = 16, bands = 4, threshold = 0.5,
      maxBucketSize = Int.MaxValue)
      .orderBy(col("id1"), col("id2"))

  private[graft] def wordShinglesSqlFrom(src: String): String =
    s"""sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) <= 5 THEN [t]
       |         ELSE list_distinct(list_transform(range(1, len(tk) - 3),
       |                i -> array_to_string(tk[i:i+4], ' '))) END AS s
       |  FROM (SELECT doc_id, t, string_split(t, ' ') AS tk
       |        FROM (SELECT doc_id,
       |                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |              FROM $src)))""".stripMargin

  private val wordShinglesSqlDef = wordShinglesSqlFrom("corpus")

  private val q37Sql = {
    import graft.expressions.MinHashScheme
    val h1 = "(('0x' || substr(md5(x), 1, 8))::BIGINT & 2147483647)"
    val h2 = "(('0x' || substr(md5(x), 9, 8))::BIGINT & 2147483647)"
    val sigItems = (0 until 16).map(i =>
      s"list_min(list_transform(s, x -> ((${MinHashScheme.a(i)} * $h1) " +
        s"% ${MinHashScheme.P} + (${MinHashScheme.b(i)} * $h2) " +
        s"% ${MinHashScheme.P} + ${MinHashScheme.c(i)}) % ${MinHashScheme.P}))")
      .mkString(",\n       |    ")
    val bandItems = (0 until 4).map { b =>
      (0 until 4).map(r => s"CAST(g[${4 * b + r + 1}] AS VARCHAR)")
        .mkString(" || '|' || ")
    }.mkString(", ")
    s"""WITH $corpusSql,
       |$wordShinglesSqlDef,
       |sig AS (
       |  SELECT doc_id, s, [
       |    $sigItems] AS g
       |  FROM sh),
       |banded AS (
       |  SELECT doc_id, s, unnest([$bandItems]) AS band
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.doc_id < b.doc_id)
       |SELECT c.id1, c.id2,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
       |FROM cand c
       |JOIN sh a ON a.doc_id = c.id1
       |JOIN sh b ON b.doc_id = c.id2
       |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
       |ORDER BY id1, id2""".stripMargin
  }

  // --------------------------------------------------------------- q17
  /** SimHash near-dup: 32-bit sketch, 2-half banding, Hamming <= 8. */
  private def q17Simhash(s: SparkSession, dir: String): DataFrame =
    // uncapped for oracle parity, as in q16
    Dedup.simhashNearDups(corpus(s, dir), "doc_id", "text", maxHamming = 8,
      maxBucketSize = Int.MaxValue)
      .orderBy(col("id1"), col("id2"))

  /** The full q17 pipeline as reusable CTEs ending in a verified
    * `pairs (id1, id2, hamming)` table — q17 selects from it directly;
    * q40's connected-components oracle builds its recursive closure on
    * top of it. */
  private[graft] val simhashPairsCtes: String = {
    val bitTerms = (0 until 32).map { b =>
      s"""CASE WHEN len(tk) > 0 AND 2 * len(list_filter(tk,
         |      t -> ((('0x' || substr(md5(t), 1, 8))::BIGINT >> $b) & 1) = 1))
         |      >= len(tk) THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END""".stripMargin
    }.mkString("\n       |    + ")
    s"""$corpusSql,
       |toks AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL OR trim(text) = '' THEN []
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
       |  FROM corpus),
       |sketch AS (
       |  SELECT doc_id,
       |    $bitTerms AS sh
       |  FROM toks),
       |banded AS (
       |  SELECT doc_id, sh,
       |    unnest(['lo:' || CAST(sh & 65535 AS VARCHAR),
       |            'hi:' || CAST(sh >> 16 AS VARCHAR)]) AS band
       |  FROM sketch),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT c.id1, c.id2, bit_count(xor(x.sh, y.sh)) AS hamming
       |  FROM cand c
       |  JOIN sketch x ON x.doc_id = c.id1
       |  JOIN sketch y ON y.doc_id = c.id2
       |  WHERE bit_count(xor(x.sh, y.sh)) <= 8)""".stripMargin
  }

  private val q17Sql =
    s"""WITH $simhashPairsCtes
       |SELECT id1, id2, hamming FROM pairs ORDER BY id1, id2""".stripMargin

  // --------------------------------------------------------------- q18
  /** Embedding-cosine near-dup: perturbed copies of vec_id % 10 == 0
    * (first element +0.05) must pair with their originals at cos>=0.99.
    * Brute-force is the verification-scale operator, so the demo corpus
    * is the vec_id % 5 subset (the LSH path in Similarity is the scale
    * route — pairing the full corpus quadratically is exactly what the
    * operator's scaladoc says not to do). */
  private def q18Embedding(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        concat(array(element_at(col("e"), 1) + lit(0.05)),
          slice(col("e"), 2, 10000)).as("e"))
    Dedup.embeddingNearDups(base.unionAll(copies), "vec_id", "e",
        threshold = 0.99)
      .orderBy(col("id1"), col("id2"))
  }

  private val q18Sql =
    """WITH base AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings WHERE vec_id % 5 = 0),
      |corpus AS (
      |  SELECT vec_id, e FROM base
      |  UNION ALL
      |  SELECT vec_id + 10000, list_concat([e[1] + 0.05], e[2:]) FROM base
      |  WHERE vec_id % 10 = 0)
      |SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  list_cosine_similarity(a.e, b.e) AS cos
      |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.e, b.e) >= 0.99
      |ORDER BY id1, id2""".stripMargin

  // --------------------------------------------------------------- q57
  /** Exact-substring duplication (Lee et al. 2021 as an inverted
    * index): 20-token sliding spans shared by >= 2 docs of the dup
    * corpus — catches verbatim quotes document-level similarity
    * misses. */
  private def q57Spans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(corpus(s, dir), "doc_id", "text",
      windowTokens = 20, minDocs = 2)
      .orderBy(col("span"))

  private val q57Sql =
    s"""WITH $corpusSql,
       |sh AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(tk) <= 20 THEN [t]
       |    ELSE list_distinct(list_transform(range(1, len(tk) - 18),
       |           i -> array_to_string(tk[i:i+19], ' '))) END) AS span
       |  FROM (SELECT doc_id, t, string_split(t, ' ') AS tk
       |        FROM (SELECT doc_id,
       |                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |              FROM corpus)))
       |SELECT span, count(*) AS n_docs, min(doc_id) AS first_doc
       |FROM sh GROUP BY 1 HAVING count(*) >= 2 ORDER BY span""".stripMargin

  // -------------------------------------------------------------- export

  // --------------------------------------------------------------- q65
  /** SemDeDup (Abbas et al. 2023): cluster embeddings onto fixed
    * centroids (the q32 fixture — every 25th vector), then flag
    * within-cluster cosine dups at 0.99. The planted perturbed copies
    * (q18's fixture, here over the FULL corpus — cluster scoping is
    * exactly what makes that affordable) must land in their original's
    * cluster and be flagged against it. */
  private def q65SemDedup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        concat(array(element_at(col("e"), 1) + lit(0.05)),
          slice(col("e"), 2, 10000)).as("e"))
    val centroids = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
    Dedup.semDeDup(base.unionAll(copies), "vec_id", "e", centroids,
        tau = 0.99)
      .orderBy(col("vec_id"))
  }

  private val q65Sql =
    """WITH base AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |corpus AS (
      |  SELECT vec_id, e FROM base
      |  UNION ALL
      |  SELECT vec_id + 10000, list_concat([e[1] + 0.05], e[2:]) FROM base
      |  WHERE vec_id % 10 = 0),
      |cent AS (
      |  SELECT vec_id AS centroid_id, e AS cv FROM base WHERE vec_id % 25 = 0),
      |assigned AS (
      |  SELECT vec_id, e, centroid_id FROM (
      |    SELECT v.vec_id, v.e, c.centroid_id,
      |      row_number() OVER (PARTITION BY v.vec_id
      |        ORDER BY list_cosine_similarity(v.e, c.cv) DESC, c.centroid_id)
      |        AS crn
      |    FROM corpus v CROSS JOIN cent c)
      |  WHERE crn = 1),
      |p AS (
      |  SELECT a.vec_id, a.centroid_id, b.vec_id AS b_id
      |  FROM assigned a JOIN assigned b
      |    ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
      |  WHERE list_cosine_similarity(a.e, b.e) >= 0.99)
      |SELECT vec_id, centroid_id, min(b_id) AS dup_of, count(*) AS n_close
      |FROM p GROUP BY 1, 2 ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------- q66
  /** Exact-substring removal (Lee et al. 2021, the rewrite half of
    * q57): cut every 20-token span shared by >= 2 docs from all but
    * its keeper doc. The exact copies (+10000) are cleared to '', the
    * near copies (+20000) keep only their unique tail, base docs
    * (keepers) come through untouched. */
  private def q66SpanRemoval(s: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedSpans(corpus(s, dir), "doc_id", "text",
        windowTokens = 20, minDocs = 2)
      .orderBy(col("doc_id"))

  private val q66Sql =
    s"""WITH $corpusSql,
       |norm0 AS (
       |  SELECT doc_id, t, string_split(t, ' ') AS tk
       |  FROM (SELECT doc_id,
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |        FROM corpus)),
       |occ AS (
       |  SELECT doc_id, u.s AS s, u.e AS e, u.span AS span FROM (
       |    SELECT doc_id, unnest(
       |      CASE WHEN len(tk) <= 20
       |        THEN [struct_pack(s := CAST(1 AS BIGINT),
       |                e := CAST(len(tk) AS BIGINT), span := t)]
       |      ELSE list_transform(range(1, len(tk) - 18),
       |        i -> struct_pack(s := i, e := i + 19,
       |               span := array_to_string(tk[i:i+19], ' ')))
       |      END) AS u
       |    FROM norm0)),
       |fl AS (
       |  SELECT span, min(doc_id) AS first_doc
       |  FROM (SELECT DISTINCT doc_id, span FROM occ)
       |  GROUP BY 1 HAVING count(*) >= 2),
       |cov AS (
       |  SELECT o.doc_id, list(struct_pack(s := o.s, e := o.e)) AS cv
       |  FROM occ o JOIN fl ON o.span = fl.span AND o.doc_id != fl.first_doc
       |  GROUP BY 1),
       |kept AS (
       |  SELECT n.doc_id, n.tk,
       |    CASE WHEN c.cv IS NULL THEN range(1, len(n.tk) + 1)
       |    ELSE list_filter(range(1, len(n.tk) + 1),
       |      i -> len(list_filter(c.cv, x -> x.s <= i AND i <= x.e)) = 0)
       |    END AS ki
       |  FROM norm0 n LEFT JOIN cov c USING (doc_id))
       |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       |  CAST(len(tk) - len(ki) AS BIGINT) AS n_removed,
       |  coalesce(array_to_string(list_transform(ki, i -> tk[i]), ' '), '')
       |    AS clean_text
       |FROM kept ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q94
  /** EXACT Jaccard >= 0.6 set-similarity self-join via prefix filtering
    * (SetSimJoin.jaccardSelfJoin) over word sets of every 4th document
    * — the provably-complete complement of q16's MinHash-LSH: candidate
    * pairs come from an equi-join on each set's rare-token prefix
    * (ascending global frequency), so buckets stay small by
    * construction and no qualifying pair can be missed (the
    * prefix-filter lemma; spec-asserted against brute force). The
    * oracle brute-forces all pairs with list_intersect. */
  private def q94SetSim(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") % 4 === 0)
    graft.operators.SetSimJoin.jaccardSelfJoin(
        d, "doc_id", TA.tokens(lower(col("text"))), tau = 0.6)
      .orderBy(col("id1"), col("id2"))
  }

  private val q94Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_sort(list_distinct(
      |      regexp_split_to_array(lower(trim(text)), '\s+'))) AS toks
      |  FROM documents
      |  WHERE doc_id % 4 = 0 AND text IS NOT NULL AND trim(text) != ''),
      |p AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
      |    CAST(len(a.toks) AS BIGINT) AS size1,
      |    CAST(len(b.toks) AS BIGINT) AS size2
      |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
      |SELECT id1, id2, inter, size1, size2,
      |  CAST(inter AS DOUBLE) / (size1 + size2 - inter) AS jaccard
      |FROM p
      |WHERE CAST(inter AS DOUBLE) / (size1 + size2 - inter) >= 0.6
      |ORDER BY id1, id2""".stripMargin

  // -------------------------------------------------------------- q185
  /** Corpus-wide line dedup (Dedup.dedupLines) over a corpus with
    * REAL cross-document boilerplate: every doc gains its source's
    * two header lines ("subscribe to srcN ...", "all rights reserved
    * ...") — 25 docs share each pair — and an 8-token-chunk body.
    * First occurrence in (doc_id, line_no) order wins corpus-wide, so
    * exactly one doc per source keeps its headers; rebuilt text
    * round-trips through md5 (same bytes ⇒ same digest in DuckDB).
    * The oracle restates the synthesis and the first-wins rule with a
    * row_number window. */
  private def q185LineDedup(s: SparkSession, dir: String): DataFrame = {
    val tk = TA.tokens(col("text"))
    val nb = (size(tk) / lit(8)).cast("int")
    val body = when(nb >= 1, transform(sequence(lit(1), nb),
      j => concat_ws(" ", slice(tk, (j - 1) * lit(8) + 1, lit(8)))))
      .otherwise(array().cast("array<string>"))
    val headers = array(
      concat(lit("subscribe to "), col("source"),
        lit(" newsletter today.")),
      concat(lit("all rights reserved by "), col("source"), lit(".")))
    val lined = docs(s, dir)
      .select(col("doc_id"),
        array_join(concat(headers, body), "\n").as("text"))
    Dedup.dedupLines(lined, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  private val q185Sql =
    """WITH t0 AS (
      |  SELECT doc_id, source,
      |    CASE WHEN text IS NULL OR trim(text) = ''
      |      THEN CAST([] AS VARCHAR[])
      |      ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |built AS (
      |  SELECT doc_id,
      |    ['subscribe to ' || source || ' newsletter today.',
      |     'all rights reserved by ' || source || '.']
      |    || list_transform(range(1, len(tk) // 8 + 1),
      |         j -> array_to_string(tk[(j-1)*8+1 : j*8], ' ')) AS lines
      |  FROM t0),
      |flat AS (
      |  SELECT doc_id, s.ln AS ln, s.line AS line FROM (
      |    SELECT doc_id, unnest(list_transform(lines,
      |      (x, i) -> struct_pack(ln := i, line := x))) AS s
      |    FROM built) u
      |  WHERE trim(s.line) <> ''),
      |kept AS (
      |  SELECT doc_id, ln, line FROM (
      |    SELECT doc_id, ln, line,
      |      row_number() OVER (PARTITION BY line
      |        ORDER BY doc_id, ln) AS rn
      |    FROM flat) w WHERE rn = 1),
      |reb AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(line, chr(10) ORDER BY ln) AS text
      |  FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_lines FROM flat
      |        GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS n_lines,
      |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
      |  md5(coalesce(reb.text, '')) AS text_md5
      |FROM documents d LEFT JOIN tot USING (doc_id)
      |LEFT JOIN reb USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q269
  /** Sorted-neighborhood blocking (Dedup.sortedNeighborhood, Hernández
    * & Stolfo merge/purge): customers ordered by name, every pair
    * within 5 positions, censused by (capped) edit distance — the
    * blocker that survives typos where equality blocking can't. The
    * oracle replays the same total order with a global row_number and
    * a rank-range self-join; the engine's rank comes from range
    * partitions + offsets, never a single-partition window. */
  private def q269SortedNeighborhood(s: SparkSession,
      dir: String): DataFrame = {
    val pairs = Dedup.sortedNeighborhood(
      Tables.load(s, dir, "customer"), "c_custkey", col("c_name"), 5)
    pairs
      .groupBy(least(levenshtein(col("key1"), col("key2")), lit(5))
        .cast("long").as("dist"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("id1")).as("sum_id1"), sum(col("id2")).as("sum_id2"))
      .orderBy(col("dist"))
  }

  private val q269Sql =
    """WITH r AS (
      |  SELECT c_custkey AS id, c_name AS k,
      |    row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      |  FROM customer),
      |p AS (
      |  SELECT a.id AS id1, a.k AS k1, b.id AS id2, b.k AS k2
      |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn < a.rn + 5)
      |SELECT CAST(least(levenshtein(k1, k2), 5) AS BIGINT) AS dist,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(id1) AS BIGINT) AS sum_id1,
      |  CAST(sum(id2) AS BIGINT) AS sum_id2
      |FROM p GROUP BY 1 ORDER BY dist""".stripMargin

  // -------------------------------------------------------------- q270
  /** Fellegi–Sunter record linkage (RecordLinkage.score) over
    * sorted-neighborhood candidates: four comparison fields with
    * INTEGER milli-weights (name edit-distance ≤ 2, segment, nation,
    * balance sign), score = plain BIGINT sum, link / possible /
    * nonlink at ≥5000 / <0 — the probabilistic-linkage decision rule
    * with the float log-odds replaced by pre-scaled integers so the
    * verdict census is bit-exact. Scoring is map-only; all cost sits
    * in the blocker (O(n·window) pairs). */
  private def q270RecordLinkage(s: SparkSession,
      dir: String): DataFrame = {
    import graft.operators.RecordLinkage
    import graft.operators.RecordLinkage.LinkField
    val cust = Tables.load(s, dir, "customer")
    val pairs = Dedup.sortedNeighborhood(cust, "c_custkey",
      col("c_name"), 10)
    def attrs(side: String) = cust.select(
      col("c_custkey").as(s"id$side"),
      col("c_mktsegment").as(s"seg$side"),
      col("c_nationkey").as(s"nat$side"),
      col("c_acctbal").as(s"bal$side"))
    val joined = pairs.join(attrs("1"), Seq("id1"))
      .join(attrs("2"), Seq("id2"))
    val scored = RecordLinkage.score(joined, Seq(
      LinkField("name",
        levenshtein(col("key1"), col("key2")) <= 2, 4000L, -1000L),
      LinkField("segment", col("seg1") === col("seg2"), 1500L, -800L),
      LinkField("nation", col("nat1") === col("nat2"), 1200L, -500L),
      LinkField("balsign",
        (col("bal1") >= 0) === (col("bal2") >= 0), 300L, -300L)),
      upperMilli = 5000L, lowerMilli = 0L)
    scored.groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("score_milli")).as("sum_score"),
        sum(when(col("name_agree"), 1L).otherwise(0L))
          .as("n_name_agree"),
        sum(when(col("segment_agree"), 1L).otherwise(0L))
          .as("n_seg_agree"),
        sum(when(col("nation_agree"), 1L).otherwise(0L))
          .as("n_nat_agree"))
      .orderBy(col("verdict"))
  }

  private val q270Sql =
    """WITH r AS (
      |  SELECT c_custkey AS id, c_name AS k, c_mktsegment AS seg,
      |    c_nationkey AS nat, c_acctbal AS bal,
      |    row_number() OVER (ORDER BY c_name, c_custkey) AS rn
      |  FROM customer),
      |p AS (
      |  SELECT a.id AS id1, b.id AS id2,
      |    (levenshtein(a.k, b.k) <= 2) AS name_agree,
      |    (a.seg = b.seg) AS seg_agree, (a.nat = b.nat) AS nat_agree,
      |    ((a.bal >= 0) = (b.bal >= 0)) AS bs_agree
      |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn < a.rn + 10),
      |sc AS (
      |  SELECT *,
      |    CASE WHEN name_agree THEN 4000 ELSE -1000 END
      |    + CASE WHEN seg_agree THEN 1500 ELSE -800 END
      |    + CASE WHEN nat_agree THEN 1200 ELSE -500 END
      |    + CASE WHEN bs_agree THEN 300 ELSE -300 END AS score
      |  FROM p)
      |SELECT CASE WHEN score >= 5000 THEN 'link'
      |    WHEN score < 0 THEN 'nonlink'
      |    ELSE 'possible' END AS verdict,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(score) AS BIGINT) AS sum_score,
      |  CAST(sum(CASE WHEN name_agree THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_name_agree,
      |  CAST(sum(CASE WHEN seg_agree THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_seg_agree,
      |  CAST(sum(CASE WHEN nat_agree THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_nat_agree
      |FROM sc GROUP BY 1 ORDER BY verdict""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q296_lsh_recall" -> (q296LshRecall _),
    "q319_weighted_jaccard" -> (q319WeightedJaccard _),
    "q331_minhash_estimate" -> (q331MinhashEstimate _),
    "q350_split_leakage" -> (q350SplitLeakage _),
    "q354_transitivity_audit" -> (q354TransitivityAudit _),
    "q355_cap_sensitivity" -> (q355CapSensitivity _),
    "q357_dedup_savings" -> (q357DedupSavings _),
    "q363_lsh_precision" -> (q363LshPrecision _),
    "q269_sorted_neighborhood" -> (q269SortedNeighborhood _),
    "q270_record_linkage" -> (q270RecordLinkage _),
    "q185_line_dedup" -> (q185LineDedup _),
    "q94_setsim_join" -> (q94SetSim _),
    "q66_span_removal" -> (q66SpanRemoval _),
    "q65_semdedup" -> (q65SemDedup _),
    "q57_dup_spans" -> (q57Spans _),
    "q14_dedup_exact" -> (q14Exact _),
    "q419_index_takedown" -> (q419IndexTakedown _),
    "q15_dedup_ngram_jaccard" -> (q15Ngram _),
    "q16_dedup_minhash_lsh" -> (q16Minhash _),
    "q37_dedup_minhash_words" -> (q37MinhashWords _),
    "q17_dedup_simhash" -> (q17Simhash _),
    "q18_dedup_embedding" -> (q18Embedding _),
  )

  val oracles: Map[String, String] = Map(
    "q296_lsh_recall" -> q296Sql,
    "q319_weighted_jaccard" -> q319Sql,
    "q331_minhash_estimate" -> q331Sql,
    "q350_split_leakage" -> q350Sql,
    "q354_transitivity_audit" -> q354Sql,
    "q355_cap_sensitivity" -> q355Sql,
    "q357_dedup_savings" -> q357Sql,
    "q363_lsh_precision" -> q363Sql,
    "q269_sorted_neighborhood" -> q269Sql,
    "q270_record_linkage" -> q270Sql,
    "q185_line_dedup" -> q185Sql,
    "q94_setsim_join" -> q94Sql,
    "q66_span_removal" -> q66Sql,
    "q65_semdedup" -> q65Sql,
    "q57_dup_spans" -> q57Sql,
    "q14_dedup_exact" -> q14Sql,
    "q419_index_takedown" -> q419Sql,
    "q15_dedup_ngram_jaccard" -> q15Sql,
    "q16_dedup_minhash_lsh" -> q16Sql,
    "q37_dedup_minhash_words" -> q37Sql,
    "q17_dedup_simhash" -> q17Sql,
    "q18_dedup_embedding" -> q18Sql,
  )
}
