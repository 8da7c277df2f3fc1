package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextAnalysis => TA}
import graft.operators.{Decontamination, Dedup, Packing}

/** The composed end-to-end training-data pipeline gate row (r5 VERDICT
  * item 4): every stage is individually oracle-green elsewhere
  * (q144 quality, q14 exact dedup, q16 MinHash-LSH, q56
  * decontamination, q42 packing), but a real user runs them CHAINED —
  * and composition bugs (column contracts between stages, persist
  * scopes, dropped-row bookkeeping) are exactly what 166 isolated rows
  * cannot catch. The oracle recomputes the full funnel from scratch in
  * DuckDB and summarizes the survivors' packed context windows, so a
  * single wrong drop at ANY stage shifts every downstream prefix sum
  * and fails the row.
  *
  * Chain (on the q14 dedup corpus = documents + planted exact dups +
  * planted near dups):
  *   ingest → Gopher quality filter (keep verdict, Rae et al. 2021)
  *   → exact dedup (min-id keeper per normalized fingerprint)
  *   → MinHash-LSH near-dedup (drop the larger id of every ≥0.5-Jaccard
  *     candidate pair, k=16, 4×4 bands)
  *   → decontaminate (drop docs sharing a word-13-gram with the eval
  *     prompts = first 20 tokens of every 17th base doc)
  *   → pack survivors into 2048-token context windows in id order
  *   → per-bin summary.
  *
  * Scale shape: quality is map-only; exact dedup is one hash agg;
  * near-dedup is the banded bucket join (never all-pairs);
  * decontamination broadcasts the eval grams; packing is the
  * distributed two-pass prefix sum — no stage collects the corpus. */
object QueriesPipeline {

  private def q164Pipeline(s: SparkSession, dir: String): DataFrame = {
    val full = QueriesDedup.corpus(s, dir)
    // 1. quality: Gopher keep verdict over the raw text
    val alive1 = full.filter(TA.gopherQuality(col("text")).getField("keep"))
    // 2. exact dedup: smallest id per normalized fingerprint survives
    val alive2 = Dedup.exactDedup(alive1, "doc_id", "text")
    // 3. near-dedup: uncapped for oracle parity (q16's stance); the
    //    larger id of every verified candidate pair is dropped
    val dropIds = Dedup.minhashNearDups(alive2, "doc_id", "text",
        shingleSize = 4, k = 16, bands = 4, threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .select(col("id2").as("doc_id")).distinct()
    val alive3 = alive2.join(broadcast(dropIds), Seq("doc_id"), "left_anti")
    // 4. decontaminate against eval prompts drawn from the BASE docs
    val evalSet = Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("eval_id"),
        concat_ws(" ",
          slice(split(TA.normalizeText(col("text")), " "), 1, 20))
          .as("eval_text"))
    val alive4 = Decontamination.decontaminate(alive3, "doc_id", "text",
      evalSet, "eval_id", "eval_text", n = 13)
    // 5. pack into 2048-token context windows, summarized per bin
    Packing.packingSummary(
        Packing.packByTokenBudget(alive4, "doc_id",
          TA.tokenCount(col("text")), 2048),
        "doc_id")
      .orderBy(col("bin"))
  }

  /** The Gopher keep-verdict CTE (gq(doc_id, keep)) over an arbitrary
    * (doc_id, text) relation — shared by the composed pipeline rows. */
  private def gopherGqSqlFrom(src: String): String = {
    val stops = TA.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""gq AS (
       |  SELECT doc_id,
       |    (CAST(len(tk) AS BIGINT) BETWEEN 50 AND 100000
       |     AND (CAST(list_aggregate(list_transform(tk, w -> len(w)),
       |            'sum') AS DOUBLE) / len(tk)) BETWEEN 3.0 AND 10.0
       |     AND CAST(len(regexp_extract_all(text, '#|\\.{3}|…'))
       |           AS DOUBLE) / len(tk) <= 0.1
       |     AND CAST(len(list_filter(ln,
       |           l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
       |           / len(ln) <= 0.9
       |     AND CAST(len(list_filter(ln,
       |           l -> regexp_matches(l, '(\\.{3}|…)\\s*$$'))) AS DOUBLE)
       |           / len(ln) <= 0.3
       |     AND CAST(len(list_filter(tk,
       |           w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
       |           / len(tk) >= 0.8
       |     AND len(list_filter(tk,
       |           w -> list_contains([$stops], lower(w)))) >= 2) AS keep
       |  FROM (SELECT doc_id, text,
       |          CASE WHEN text IS NULL OR trim(text) = ''
       |            THEN CAST([] AS VARCHAR[])
       |            ELSE string_split_regex(trim(text), '\\s+') END AS tk,
       |          string_split(text, chr(10)) AS ln
       |        FROM $src)
       |  WHERE len(tk) > 0 AND len(ln) > 0)""".stripMargin
  }

  private val q164Sql = {
    s"""WITH ${QueriesDedup.corpusSql},
       |${gopherGqSqlFrom("corpus")},
       |alive1 AS (
       |  SELECT c.doc_id, c.text FROM corpus c
       |  JOIN gq ON gq.doc_id = c.doc_id WHERE gq.keep),
       |fp AS (
       |  SELECT doc_id, text,
       |    substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
       |      'g')), 1, 16) AS f
       |  FROM alive1),
       |keepers AS (SELECT f, min(doc_id) AS k FROM fp GROUP BY 1),
       |alive2 AS (
       |  SELECT fp.doc_id, fp.text FROM fp
       |  JOIN keepers ON fp.f = keepers.f AND fp.doc_id = keepers.k),
       |${QueriesDedup.shinglesSqlFrom("alive2")},
       |${QueriesDedup.minhashCandCtes},
       |neardrop AS (
       |  SELECT DISTINCT c.id2 AS doc_id FROM cand c
       |  JOIN sh a ON a.doc_id = c.id1
       |  JOIN sh b ON b.doc_id = c.id2
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
       |alive3 AS (
       |  SELECT * FROM alive2
       |  WHERE doc_id NOT IN (SELECT doc_id FROM neardrop)),
       |norm3 AS (
       |  SELECT doc_id, t, string_split(t, ' ') AS tk
       |  FROM (SELECT doc_id,
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |        FROM alive3)),
       |docg AS (
       |  SELECT doc_id AS id, unnest(
       |    CASE WHEN len(tk) <= 13 THEN [t]
       |    ELSE list_distinct(list_transform(range(1, len(tk) - 11),
       |           i -> array_to_string(tk[i:i+12], ' '))) END) AS g
       |  FROM norm3),
       |normdoc AS (
       |  SELECT doc_id, t, string_split(t, ' ') AS tk
       |  FROM (SELECT doc_id,
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |        FROM documents)),
       |evt AS (
       |  SELECT doc_id AS eval_id, array_to_string(tk[1:20], ' ') AS et,
       |    tk[1:20] AS etk
       |  FROM normdoc WHERE doc_id % 17 = 0),
       |evg AS (
       |  SELECT eval_id AS id, unnest(
       |    CASE WHEN len(etk) <= 13 THEN [et]
       |    ELSE list_distinct(list_transform(range(1, len(etk) - 11),
       |           i -> array_to_string(etk[i:i+12], ' '))) END) AS g
       |  FROM evt),
       |contaminated AS (
       |  SELECT DISTINCT d.id AS doc_id FROM docg d
       |  JOIN evg e ON d.g = e.g),
       |alive4 AS (
       |  SELECT * FROM alive3
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |t AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+'))
       |    END AS tok
       |  FROM alive4),
       |c AS (
       |  SELECT doc_id, tok,
       |    sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |      - tok AS pre
       |  FROM t)
       |SELECT CAST(floor(pre / CAST(2048 AS DOUBLE)) AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY bin""".stripMargin
  }

  // -------------------------------------------------------------- q324
  /** Incremental composed pipeline — the DAILY-REFRESH shape of q164:
    * the corpus arrives as three batches (doc_id mod 3); each batch
    * flows through IncrementalDedup.acceptBatch (exact-fingerprint
    * dedup against the persistent index built by the EARLIER batches),
    * then the survivors are Gopher-quality-gated and token-counted.
    * The oracle restates the whole state machine declaratively — a
    * document survives iff it is the (batch, doc_id)-minimal carrier
    * of its fingerprint — so any drift in the index's novelty
    * semantics (self-masking, missed earlier batch, retry ghosts)
    * shifts a batch's survivor count and fails the row. */
  private def q324IncrementalPipeline(s: SparkSession, dir: String)
      : DataFrame = {
    val full = QueriesDedup.corpus(s, dir)
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft_incr_idx")
    val idx = idxRoot.toString
    try {
    val survivors = (0 until 3).map { b =>
      val batch = full.filter(pmod(col("doc_id"), lit(3)) === b)
      graft.operators.IncrementalDedup
        .acceptBatch(batch, "doc_id", "text", idx, s"day$b")
        .withColumn("batch", lit(b.toLong))
    }.reduce(_ unionAll _)
    val nIn = full
      .groupBy(pmod(col("doc_id"), lit(3)).as("batch"))
      .agg(count(lit(1)).as("n_in"))
    // Scale.spread: the Gopher-quality battery + token count below are
    // the per-row-heavy stage, and the accepted survivors inherit the
    // micro-batches' narrow layout (guide §2.5; r12)
    graft.operators.Scale.spread(survivors)
      .withColumn("keep", TA.gopherQuality(col("text")).getField("keep"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_survivors"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("keep"), TA.tokenCount(col("text")).cast("long"))
          .otherwise(0L)).as("quality_tokens"))
      .join(nIn, Seq("batch"))
      .select(col("batch"), col("n_in"), col("n_survivors"),
        col("n_quality"), col("quality_tokens"))
      .orderBy(col("batch"))
    // acceptBatch's survivors are localCheckpoint-materialized, so the
    // index tree is dead weight once the unions are built (q419's
    // no-orphaned-/tmp-tree hygiene)
    } finally QueriesDedup.deleteRecursively(idxRoot)
  }

  private val q324Sql =
    s"""WITH ${QueriesDedup.corpusSql},
       |fp AS (
       |  SELECT doc_id, text, doc_id % 3 AS batch,
       |    substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
       |      'g')), 1, 16) AS f
       |  FROM corpus),
       |win AS (
       |  SELECT doc_id, text, batch,
       |    row_number() OVER (PARTITION BY f ORDER BY batch, doc_id)
       |      AS rn
       |  FROM fp),
       |surv AS (SELECT doc_id, text, batch FROM win WHERE rn = 1),
       |${gopherGqSqlFrom("surv")},
       |scored AS (
       |  SELECT s.batch, s.doc_id,
       |    coalesce(gq.keep, FALSE) AS keep,
       |    CASE WHEN s.text IS NULL OR trim(s.text) = '' THEN 0
       |         ELSE len(regexp_split_to_array(trim(s.text), '\\s+'))
       |    END AS tok
       |  FROM surv s LEFT JOIN gq ON gq.doc_id = s.doc_id),
       |nin AS (
       |  SELECT doc_id % 3 AS batch, count(*) AS n_in
       |  FROM corpus GROUP BY 1)
       |SELECT sc.batch, nin.n_in, count(*) AS n_survivors,
       |  CAST(sum(CASE WHEN sc.keep THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_quality,
       |  CAST(sum(CASE WHEN sc.keep THEN sc.tok ELSE 0 END) AS BIGINT)
       |    AS quality_tokens
       |FROM scored sc JOIN nin ON nin.batch = sc.batch
       |GROUP BY 1, 2 ORDER BY sc.batch""".stripMargin

  // -------------------------------------------------------------- q396
  /** Corpus datasheet ("data card", Gebru et al. 2021) — the one-table
    * release summary a training corpus ships with: size, emptiness,
    * char/token volume, ASCII share, Gopher-keep rate, exact-dup
    * content census (distinct fingerprints), and the language/source
    * mixes, all as one long (metric, value) table of exact BIGINTs.
    * Each census is one hash aggregate over a shared cached scan
    * (the mixes key on low-cardinality labels; the fingerprint census
    * shuffles one row per DISTINCT fingerprint); nothing collects. */
  private def q396Datasheet(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val empty = col("text").isNull || trim(col("text")) === ""
    val base = d.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(when(empty, 1L).otherwise(0L)), lit(0L))
          .as("n_empty"),
        coalesce(sum(length(col("text")).cast("long")), lit(0L))
          .as("n_chars"),
        coalesce(sum(TA.tokenCount(col("text")).cast("long")), lit(0L))
          .as("n_tokens"),
        coalesce(max(TA.tokenCount(col("text")).cast("long")), lit(0L))
          .as("max_doc_tokens"),
        coalesce(sum(when(col("text").rlike("^[\\x20-\\x7e]*$"), 1L)
          .otherwise(0L)), lit(0L)).as("n_ascii"),
        coalesce(sum(when(TA.gopherQuality(col("text")).getField("keep"),
          1L).otherwise(0L)), lit(0L)).as("n_gopher_keep"))
      .select(expr("stack(7, 'n_docs', n_docs, 'n_empty', n_empty, " +
        "'n_chars', n_chars, 'n_tokens', n_tokens, " +
        "'max_doc_tokens', max_doc_tokens, 'n_ascii', n_ascii, " +
        "'n_gopher_keep', n_gopher_keep) AS (metric, value)"))
    val fp = d.filter(!empty)
      .select(TA.fingerprint(col("text")).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("value"))
      .select(lit("n_distinct_fp").as("metric"), col("value"))
    val langs = d.groupBy(col("lang")).agg(count(lit(1)).as("value"))
      .select(concat(lit("lang:"), coalesce(col("lang"), lit("null")))
        .as("metric"), col("value"))
    val sources = d.groupBy(col("source")).agg(count(lit(1)).as("value"))
      .select(concat(lit("source:"), coalesce(col("source"), lit("null")))
        .as("metric"), col("value"))
    // eagerly materialize the small (metric, value) table, then release
    // the documents cache — the row must not leave a session-lifetime
    // MEMORY_ONLY block behind (the jsDivergenceFromCounts rule)
    val out = base.unionAll(fp).unionAll(langs).unionAll(sources)
      .orderBy(col("metric"))
      .localCheckpoint(true)
    d.unpersist()
    out
  }

  private val q396Sql = {
    s"""WITH d AS (
       |  SELECT doc_id, text, lang, source FROM documents),
       |${gopherGqSqlFrom("d")},
       |tk AS (
       |  SELECT doc_id, text,
       |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+'))
       |    END AS ntok
       |  FROM d),
       |base AS (
       |  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value
       |  FROM d
       |  UNION ALL
       |  SELECT 'n_empty', CAST(sum(CASE WHEN text IS NULL
       |    OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT 'n_chars', CAST(coalesce(sum(length(text)), 0)
       |    AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT 'n_tokens', CAST(sum(ntok) AS BIGINT) FROM tk
       |  UNION ALL
       |  SELECT 'max_doc_tokens', CAST(max(ntok) AS BIGINT) FROM tk
       |  UNION ALL
       |  SELECT 'n_ascii', CAST(sum(CASE WHEN text IS NOT NULL
       |    AND regexp_matches(text, '^[\\x20-\\x7e]*$$') THEN 1 ELSE 0
       |    END) AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT 'n_gopher_keep', CAST(sum(CASE WHEN
       |    coalesce(gq.keep, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
       |  FROM d LEFT JOIN gq ON gq.doc_id = d.doc_id
       |  UNION ALL
       |  SELECT 'n_distinct_fp', CAST(count(DISTINCT
       |    substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ',
       |      'g')), 1, 16)) AS BIGINT)
       |  FROM d WHERE NOT (text IS NULL OR trim(text) = '')
       |  UNION ALL
       |  SELECT 'lang:' || coalesce(lang, 'null'),
       |    CAST(count(*) AS BIGINT) FROM d GROUP BY 1
       |  UNION ALL
       |  SELECT 'source:' || coalesce(source, 'null'),
       |    CAST(count(*) AS BIGINT) FROM d GROUP BY 1)
       |SELECT metric, value FROM base ORDER BY metric""".stripMargin
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q396_corpus_datasheet" -> (q396Datasheet _),
    "q164_pipeline_e2e" -> (q164Pipeline _),
    "q324_incremental_e2e" -> (q324IncrementalPipeline _),
  )

  val oracles: Map[String, String] = Map(
    "q164_pipeline_e2e" -> q164Sql,
    "q324_incremental_e2e" -> q324Sql,
    "q396_corpus_datasheet" -> q396Sql,
  )
}
