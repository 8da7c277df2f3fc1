package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{PiiRedaction, TextAnalysis => TA}
import graft.operators.Decontamination

/** Corpus-quality operator coverage (north-star extension, round 4):
  * the filter/scrub/decontaminate passes that sit between dedup and
  * training — Gopher-style repetition rules, PII masking, eval-set
  * n-gram decontamination, LM perplexity scoring, and the end-to-end
  * quality funnel that strings them together with first-drop
  * attribution. All oracle-checked: the repetition fractions are exact
  * small-integer ratios, the PII regexes use only Java-regex ∩ RE2
  * syntax, the decontamination join counts are integers, and the LM
  * score folds sorted floats (plus a threshold sitting in a measured
  * ~1e-2 score gap, 10 orders above cross-engine float noise).
  *
  * The oracle SQL is assembled from shared CTE fragments (norm /
  * planted / repetition / contamination / LM) so the funnel's oracle is
  * BY CONSTRUCTION the composition of the already-hash-proven
  * single-stage oracles.
  */
object QueriesQuality {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Shared normalized-token-list CTE (mirrors TA.normalizeText +
    * whitespace split), parameterized on the source relation so the
    * funnel can run it over the PII-planted corpus. */
  private def normSqlFrom(src: String): String =
    s"""norm AS (
       |  SELECT doc_id, t, string_split(t, ' ') AS tk
       |  FROM (SELECT doc_id,
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |        FROM $src))""".stripMargin

  private val normSql = normSqlFrom("documents")

  // Gopher repetition metrics over `norm` (q54 + funnel)
  private val repMSql =
    """m AS (
      |  SELECT doc_id,
      |    CAST(list_max(list_transform(list_distinct(tk),
      |           w -> len(list_filter(tk, x -> x = w)))) AS DOUBLE)
      |      / len(tk) AS topf,
      |    CASE WHEN len(tk) < 2 THEN 0.0 ELSE
      |      CAST(len(tk) - 1 - len(list_distinct(list_transform(
      |             range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])))
      |           AS DOUBLE) / (len(tk) - 1) END AS d2,
      |    CASE WHEN len(tk) < 3 THEN 0.0 ELSE
      |      CAST(len(tk) - 2 - len(list_distinct(list_transform(
      |             range(1, len(tk) - 1),
      |             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))
      |           AS DOUBLE) / (len(tk) - 2) END AS d3
      |  FROM norm)""".stripMargin

  // deterministic synthetic PII on every third doc (q55 + funnel).
  // No continuation line may START with '||': fragments get
  // stripMargin'd once here and once inside the composed query, and
  // the second pass would eat one pipe of a line-leading '||'.
  private val plantedSql =
    """planted AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      text || ' contact user' || doc_id || '@example.com or call 555-01' ||
      |        lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
      |        ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
      |    ELSE text END AS text
      |  FROM documents)""".stripMargin

  /** The Spark side of `plantedSql`. */
  private def plantedDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string")))
        .otherwise(col("text")).as("text"))

  // word-13-gram contamination CTEs over `norm` (q56 + funnel);
  // WordShinglesExpression's short-input rule: <= 13 tokens -> the
  // whole normalized string is the only shingle
  private val contCtesSql =
    """docg AS (
      |  SELECT doc_id AS id, unnest(
      |    CASE WHEN len(tk) <= 13 THEN [t]
      |    ELSE list_distinct(list_transform(range(1, len(tk) - 11),
      |           i -> array_to_string(tk[i:i+12], ' '))) END) AS g
      |  FROM norm),
      |evt AS (
      |  SELECT doc_id AS eval_id, array_to_string(tk[1:20], ' ') AS et,
      |    tk[1:20] AS etk
      |  FROM norm WHERE doc_id % 17 = 0),
      |evg AS (
      |  SELECT eval_id AS id, unnest(
      |    CASE WHEN len(etk) <= 13 THEN [et]
      |    ELSE list_distinct(list_transform(range(1, len(etk) - 11),
      |           i -> array_to_string(etk[i:i+12], ' '))) END) AS g
      |  FROM evt)""".stripMargin

  /** The Spark side of `evt`: first-20-token prompts of every 17th doc. */
  private def evalPrompts(d: DataFrame): DataFrame =
    d.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("eval_id"),
        concat_ws(" ",
          slice(split(TA.normalizeText(col("text")), " "), 1, 20))
          .as("eval_text"))

  // bigram-LM CTEs over `norm` (q60 + funnel): Laplace-smoothed
  // P(w2|w1); the per-doc fold runs over SORTED log values so both
  // engines add identical floats in identical order
  private val lmCtesSql =
    """bg0 AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
      |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
      |  FROM norm WHERE len(tk) >= 2),
      |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg0),
      |bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2),
      |hc AS (SELECT w1, count(*) AS c_h FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v
      |      FROM (SELECT unnest(tk) AS w FROM norm)),
      |lp AS (
      |  SELECT bg.doc_id, ln((bgc.c_bg + 1.0) / (hc.c_h + v.v)) AS lnp
      |  FROM bg JOIN bgc USING (w1, w2) JOIN hc USING (w1) CROSS JOIN v)""".stripMargin

  // --------------------------------------------------------------- q54
  /** Gopher-rule repetition filter: one codegen'd map-only pass emits
    * the three repetition fractions + the keep verdict per document
    * (Rae et al. 2021 §A1.1 thresholds, adapted). At 100 TB this is a
    * pure projection over the scan — no shuffle, no state. */
  private def q54Repetition(s: SparkSession, dir: String): DataFrame = {
    val r = TA.repetitionStats(col("text"))
    docs(s, dir)
      .select(col("doc_id"),
        r.getField("top_word_fraction").as("top_word_fraction"),
        r.getField("dup_2gram_fraction").as("dup_2gram_fraction"),
        r.getField("dup_3gram_fraction").as("dup_3gram_fraction"))
      .withColumn("keep",
        col("top_word_fraction") <= 0.3 &&
          col("dup_2gram_fraction") <= 0.2 &&
          col("dup_3gram_fraction") <= 0.18)
      .orderBy(col("doc_id"))
  }

  private val q54Sql =
    s"""WITH $normSql,
       |$repMSql
       |SELECT doc_id, topf AS top_word_fraction, d2 AS dup_2gram_fraction,
       |  d3 AS dup_3gram_fraction,
       |  (topf <= 0.3 AND d2 <= 0.2 AND d3 <= 0.18) AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q55
  /** PII scrub: deterministic synthetic PII (email + phone + IPv4,
    * derived from doc_id) is planted on every third document in BOTH
    * engines, then detected and masked. Counts use the same regexes as
    * the masks, so n_* == 0 rows prove the patterns don't false-hit the
    * base corpus. Map-only at any scale. */
  private def q55Pii(s: SparkSession, dir: String): DataFrame =
    plantedDocs(s, dir).select(col("doc_id"),
      PiiRedaction.emailCount(col("text")).as("n_emails"),
      PiiRedaction.phoneCount(col("text")).as("n_phones"),
      PiiRedaction.ipv4Count(col("text")).as("n_ips"),
      PiiRedaction.redact(col("text")).as("redacted"))
      .orderBy(col("doc_id"))

  private val q55Sql = {
    // single-quoted DuckDB literals keep backslashes verbatim, and the
    // patterns contain no quotes — embed as-is
    val email = PiiRedaction.EmailPattern
    val phone = PiiRedaction.PhonePattern
    val ip = PiiRedaction.Ipv4Pattern
    s"""WITH $plantedSql
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$email')) AS n_emails,
       |  len(regexp_extract_all(text, '$phone')) AS n_phones,
       |  len(regexp_extract_all(text, '$ip')) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'),
       |    '$phone', '<PHONE>', 'g'),
       |    '$ip', '<IP>', 'g') AS redacted
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q56
  /** Eval-set decontamination: the eval set is the first 20 normalized
    * tokens of every 17th document (a "leaked prompt" fixture built
    * identically in both engines); any doc sharing a word 13-gram with
    * it is flagged. Inverted-index join, eval side broadcast — the
    * corpus never shuffles. */
  private def q56Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Decontamination.contaminatedDocs(d, "doc_id", "text",
      evalPrompts(d), "eval_id", "eval_text", n = 13)
      .orderBy(col("doc_id"))
  }

  private val q56Sql =
    s"""WITH $normSql,
       |$contCtesSql
       |SELECT d.id AS doc_id, count(DISTINCT d.g) AS n_hits,
       |  min(e.id) AS min_eval_id
       |FROM docg d JOIN evg e ON d.g = e.g
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q60
  /** CCNet-style bigram-LM perplexity scoring: train on the corpus,
    * score every doc by mean negative log-probability (Laplace
    * smoothing). The per-doc sum folds SORTED log values so both
    * engines add identical floats in identical order; the gate row
    * emits the score as micro-units (round(score·1e6) → BIGINT) so the
    * hash cannot flip on a driver-side libm/DuckDB rebuild — the
    * residual ln last-ulp noise (~1e-13) sits five orders below the
    * rounding grid. q127 is the designated raw-transcendental row. */
  private def q60LmScore(s: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.scoreDocs(docs(s, dir), "doc_id", "text")
      .withColumn("score_micro", round(col("score") * lit(1e6)).cast("long"))
      .drop("score")
      .orderBy(col("doc_id"))

  private val q60Sql =
    s"""WITH $normSql,
       |$lmCtesSql
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(round(-list_aggregate(list_sort(list(lnp)), 'sum')
       |    / count(*) * 1e6) AS BIGINT) AS score_micro
       |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q380
  /** Interpolated Kneser–Ney bigram perplexity scoring
    * (LanguageModel.scoreDocsKneserNey, D = 0.75) — the production
    * smoothing beside q60's Laplace baseline: continuation
    * probability N₁₊(·w₂)/|types| replaces the uniform 1/V mass, so
    * the model statistics gain two more exact-integer tables
    * (distinct continuations per history, distinct contexts per
    * word) the oracle recomputes from the same bigram stream. Same
    * sorted-ln-fold / micro-unit discipline as q60. */
  private def q380KneserNey(s: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel
      .scoreDocsKneserNey(docs(s, dir), "doc_id", "text")
      .withColumn("score_micro", round(col("score") * lit(1e6)).cast("long"))
      .drop("score")
      .orderBy(col("doc_id"))

  private val q380Sql =
    s"""WITH $normSql,
       |bg0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
       |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
       |  FROM norm WHERE len(tk) >= 2),
       |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg0),
       |bgc AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2),
       |hc AS (SELECT w1, count(*) AS c_h, count(DISTINCT w2) AS n1f
       |       FROM bg GROUP BY 1),
       |cc AS (SELECT w2, count(*) AS n1b FROM bgc GROUP BY 1),
       |t AS (SELECT count(*) AS t FROM bgc),
       |lp AS (
       |  SELECT bg.doc_id,
       |    ln(greatest(bgc.c_bg - 0.75, 0.0) / hc.c_h
       |      + 0.75 * hc.n1f / hc.c_h * (cc.n1b / t.t)) AS lnp
       |  FROM bg JOIN bgc USING (w1, w2) JOIN hc USING (w1)
       |    JOIN cc USING (w2) CROSS JOIN t)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(round(-list_aggregate(list_sort(list(lnp)), 'sum')
       |    / count(*) * 1e6) AS BIGINT) AS score_micro
       |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q381
  /** Moore–Lewis cross-entropy data selection (LanguageModel
    * .mooreLewis): every doc scored under an IN-DOMAIN bigram LM
    * (trained on the deterministic doc_id % 7 = 0 stratum) and the
    * GENERAL corpus LM; ml = H_in − H_gen, negative = domain-like.
    * Exercises the cross-corpus paths self-scoring never hits (unseen
    * bigram → Laplace floor, unseen history → 1/V via left-join
    * coalesce), each restated in the oracle; emitted micro-rounded. */
  private def q381MooreLewis(s: SparkSession, dir: String): DataFrame = {
    val all = docs(s, dir)
    graft.operators.LanguageModel
      .mooreLewis(all, all.filter(pmod(col("doc_id"), lit(7)) === 0),
        all, "doc_id", "text")
      .withColumn("ml_micro", round(col("ml_diff") * lit(1e6)).cast("long"))
      .drop("ml_diff")
      .orderBy(col("doc_id"))
  }

  /** q381/q401's shared oracle CTE chain, ending in the per-doc
    * ml(doc_id, n_bigrams, ml_micro) table. */
  private val mlSqlCtes =
    s"""$normSql,
       |tin AS (SELECT * FROM norm WHERE doc_id % 7 = 0),
       |gbg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
       |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
       |  FROM norm WHERE len(tk) >= 2),
       |sb AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM gbg),
       |gbc AS (SELECT w1, w2, count(*) AS c_gb FROM sb GROUP BY 1, 2),
       |ghc AS (SELECT w1, count(*) AS c_gh FROM sb GROUP BY 1),
       |gv AS (SELECT count(DISTINCT w) AS v
       |       FROM (SELECT unnest(tk) AS w FROM norm)),
       |ibg AS (
       |  SELECT unnest(list_transform(range(1, len(tk)),
       |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
       |  FROM tin WHERE len(tk) >= 2),
       |ib AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM ibg),
       |ibc AS (SELECT w1, w2, count(*) AS c_ib FROM ib GROUP BY 1, 2),
       |ihc AS (SELECT w1, count(*) AS c_ih FROM ib GROUP BY 1),
       |iv AS (SELECT count(DISTINCT w) AS v
       |       FROM (SELECT unnest(tk) AS w FROM tin)),
       |lp AS (
       |  SELECT sb.doc_id,
       |    ln((coalesce(ibc.c_ib, 0) + 1.0)
       |      / (coalesce(ihc.c_ih, 0) + iv.v)) AS lnp_in,
       |    ln((coalesce(gbc.c_gb, 0) + 1.0)
       |      / (coalesce(ghc.c_gh, 0) + gv.v)) AS lnp_gen
       |  FROM sb
       |  LEFT JOIN ibc ON ibc.w1 = sb.w1 AND ibc.w2 = sb.w2
       |  LEFT JOIN ihc ON ihc.w1 = sb.w1
       |  LEFT JOIN gbc ON gbc.w1 = sb.w1 AND gbc.w2 = sb.w2
       |  LEFT JOIN ghc ON ghc.w1 = sb.w1
       |  CROSS JOIN iv CROSS JOIN gv),
       |ml AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |    CAST(round((-list_aggregate(list_sort(list(lnp_in)), 'sum')
       |        / count(*)
       |      - (-list_aggregate(list_sort(list(lnp_gen)), 'sum')
       |        / count(*))) * 1e6) AS BIGINT) AS ml_micro
       |  FROM lp GROUP BY 1)""".stripMargin

  private val q381Sql =
    s"""WITH $mlSqlCtes
       |SELECT doc_id, n_bigrams, ml_micro FROM ml
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q401
  /** Preference-pair mining for RLHF/DPO data prep: within every
    * (lang, source) bucket, pair the MOST in-domain document (minimal
    * Moore–Lewis score = "chosen") against the LEAST ("rejected"),
    * keeping pairs whose score gap clears 0.2 nats — the standard
    * construction when contrast comes from a scalar quality/domain
    * signal rather than human labels. Verdicts are fully integer:
    * ranking keys are q381's micro-rounded BIGINT scores with doc_id
    * tie-breaks (lexicographic struct min/max ≡ the oracle's
    * two-window row_number), so a float can never flip a pair. */
  private def q401PreferencePairs(s: SparkSession, dir: String): DataFrame = {
    val all = docs(s, dir)
    val ml = graft.operators.LanguageModel
      .mooreLewis(all, all.filter(pmod(col("doc_id"), lit(7)) === 0),
        all, "doc_id", "text")
      .select(col("doc_id"),
        round(col("ml_diff") * lit(1e6)).cast("long").as("ml_micro"))
    // NULL bucket labels fold to the literal 'null' (the q396
    // convention) — Spark's groupBy keeps NULL groups but the
    // oracle's equality join would drop them, a latent divergence
    ml.join(all.select(col("doc_id"),
          coalesce(col("lang"), lit("null")).as("lang"),
          coalesce(col("source"), lit("null")).as("source")),
        Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(min(struct(col("ml_micro"), col("doc_id"))).as("__c"),
        max(struct(col("ml_micro"), col("doc_id"))).as("__r"))
      .select(col("lang"), col("source"),
        col("__c").getField("doc_id").as("chosen_id"),
        col("__r").getField("doc_id").as("rejected_id"),
        col("__c").getField("ml_micro").as("chosen_ml"),
        col("__r").getField("ml_micro").as("rejected_ml"),
        (col("__r").getField("ml_micro") -
          col("__c").getField("ml_micro")).as("gap"))
      .filter(col("gap") >= 200000L)
      .orderBy(col("lang"), col("source"))
  }

  private val q401Sql =
    s"""WITH $mlSqlCtes,
       |dm AS (
       |  SELECT coalesce(d.lang, 'null') AS lang,
       |    coalesce(d.source, 'null') AS source,
       |    ml.doc_id, ml.ml_micro
       |  FROM ml JOIN documents d ON d.doc_id = ml.doc_id),
       |ch AS (
       |  SELECT lang, source, doc_id, ml_micro,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY ml_micro, doc_id) AS rn
       |  FROM dm),
       |rj AS (
       |  SELECT lang, source, doc_id, ml_micro,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY ml_micro DESC, doc_id DESC) AS rn
       |  FROM dm)
       |SELECT c.lang, c.source,
       |  c.doc_id AS chosen_id, r.doc_id AS rejected_id,
       |  c.ml_micro AS chosen_ml, r.ml_micro AS rejected_ml,
       |  r.ml_micro - c.ml_micro AS gap
       |FROM ch c JOIN rj r ON r.lang = c.lang AND r.source = c.source
       |WHERE c.rn = 1 AND r.rn = 1
       |  AND r.ml_micro - c.ml_micro >= 200000
       |ORDER BY c.lang, c.source""".stripMargin

  // --------------------------------------------------------------- q64
  /** LM-noise threshold for the funnel: sits in a measured ~9e-3 gap
    * of the sf0.01 planted-corpus score distribution (4.1% of docs
    * above), so a cross-engine float divergence of ~1e-12 can never
    * flip a verdict. */
  private val LmNoiseTau = 4.0

  /** The end-to-end quality funnel: every raw document is charged to
    * the FIRST pipeline stage that drops it — repetition rules, then
    * PII, then eval-set contamination, then LM perplexity — or 'kept'.
    * Output is the per-stage doc and token census, i.e. the report a
    * corpus-engineering run publishes alongside the cleaned corpus.
    *
    * Runs over the PII-planted corpus (the q55 fixture) so every stage
    * has real work. Scale shape: two map-only flag passes fused into
    * the scan, the broadcast contamination join (corpus never
    * shuffles), the LM pass (two model aggregates + one scoring join),
    * and a final ~5-row aggregate. */
  private def q64Funnel(s: SparkSession, dir: String): DataFrame = {
    val d = plantedDocs(s, dir)
    graft.operators.QualityFunnel.census(
      graft.operators.QualityFunnel.stageDocs(
        d, "doc_id", "text", evalPrompts(d), LmNoiseTau))
  }

  private val q64Sql = {
    val email = PiiRedaction.EmailPattern
    val phone = PiiRedaction.PhonePattern
    val ip = PiiRedaction.Ipv4Pattern
    // CAST sum_tokens: DuckDB promotes sum(BIGINT) to HUGEINT (q36
    // house rule)
    s"""WITH $plantedSql,
       |${normSqlFrom("planted")},
       |$repMSql,
       |pii AS (
       |  SELECT doc_id,
       |    (len(regexp_extract_all(text, '$email'))
       |     + len(regexp_extract_all(text, '$phone'))
       |     + len(regexp_extract_all(text, '$ip'))) > 0 AS has_pii
       |  FROM planted),
       |$contCtesSql,
       |cont AS (
       |  SELECT DISTINCT d.id AS doc_id
       |  FROM docg d JOIN evg e ON d.g = e.g),
       |$lmCtesSql,
       |lm AS (
       |  SELECT doc_id,
       |    -list_aggregate(list_sort(list(lnp)), 'sum') / count(*) AS score
       |  FROM lp GROUP BY 1),
       |staged AS (
       |  SELECT n.doc_id, len(n.tk) AS n_tokens,
       |    CASE
       |      WHEN NOT (m.topf <= 0.3 AND m.d2 <= 0.2 AND m.d3 <= 0.18)
       |        THEN 'repetition'
       |      WHEN p.has_pii THEN 'pii'
       |      WHEN c.doc_id IS NOT NULL THEN 'contaminated'
       |      WHEN l.score > $LmNoiseTau THEN 'lm_noise'
       |      ELSE 'kept' END AS stage
       |  FROM norm n
       |  JOIN m USING (doc_id)
       |  JOIN pii p USING (doc_id)
       |  LEFT JOIN cont c ON n.doc_id = c.doc_id
       |  LEFT JOIN lm l ON n.doc_id = l.doc_id)
       |SELECT stage, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM staged GROUP BY 1 ORDER BY stage""".stripMargin
  }

  // --------------------------------------------------------------- q93
  /** Declarative data-quality expectations (Expectations.run): six
    * constraints over lineitem — four scalar checks compiled into ONE
    * aggregation pass (completeness, range, accepted set, regex), a
    * composite-key uniqueness check (one aggregate by the key, not a
    * distinct-expand), and referential integrity to orders (one
    * semi-join). Exact integer-count fractions; the publish gate of an
    * ingestion pipeline, asserting where q49's profiler describes. */
  private def q93Expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations
    import graft.operators.Expectations._
    val li = Tables.load(s, dir, "lineitem")
    Expectations.run(li,
      expects = Seq(
        complete("l_shipdate"),
        inRange("l_discount", 0.0, 0.2),
        inSet("l_returnflag", Seq("A", "N", "R")),
        matches("l_linestatus", "^[OF]$")),
      unique = Seq(Seq("l_orderkey", "l_linenumber")),
      refs = Seq(("l_orderkey", Tables.load(s, dir, "orders"), "o_orderkey")))
  }

  private val q93Sql =
    """WITH t AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ok_ship,
      |    CAST(sum(CASE WHEN l_discount IS NOT NULL
      |      AND l_discount >= 0.0 AND l_discount <= 0.2 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ok_disc,
      |    CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS ok_rf,
      |    CAST(sum(CASE WHEN l_linestatus IS NOT NULL
      |      AND regexp_matches(l_linestatus, '^[OF]$') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ok_ls
      |  FROM lineitem),
      |u AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ok
      |  FROM (SELECT count(*) AS c FROM lineitem
      |        GROUP BY l_orderkey, l_linenumber)),
      |r AS (
      |  SELECT (SELECT count(*) FROM lineitem) AS n,
      |    (SELECT count(*) FROM lineitem
      |     WHERE l_orderkey IN (SELECT o_orderkey FROM orders)) AS ok),
      |rows_ AS (
      |  SELECT 'complete(l_shipdate)' AS check_name, n AS n_rows,
      |    ok_ship AS n_ok FROM t
      |  UNION ALL SELECT 'in_range(l_discount)', n, ok_disc FROM t
      |  UNION ALL SELECT 'in_set(l_returnflag)', n, ok_rf FROM t
      |  UNION ALL SELECT 'matches(l_linestatus)', n, ok_ls FROM t
      |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', n, ok FROM u
      |  UNION ALL SELECT 'ref(l_orderkey -> o_orderkey)', n, ok FROM r)
      |SELECT check_name, n_rows, n_ok,
      |  CAST(n_ok AS DOUBLE) / CAST(n_rows AS DOUBLE) AS fraction,
      |  CAST(n_ok AS DOUBLE) / CAST(n_rows AS DOUBLE) >= 1.0 AS pass
      |FROM rows_ ORDER BY check_name""".stripMargin

  // -------------------------------------------------------------- q132
  /** DSIR importance scoring (Xie et al. 2023): every document scored
    * by log w = Σ [ln p_target(bigram) − ln p_raw(bigram)], target =
    * the English subset, raw = the whole corpus (Laplace smoothing
    * over the raw bigram vocabulary). The `selected` verdict uses a
    * threshold sitting in a measured 0.149-wide gap of the sf0.01
    * score distribution (between −2.541 and −2.392; ~358 of 500 docs
    * select), so cross-engine float noise of ~1e-12 can never flip
    * it — the LmNoiseTau trick. Cross-engine rank/top-k selection is
    * deliberately NOT gated (float ranks are only bit-stable within
    * one engine); `ImportanceScoring.selectTopK` is spec-pinned
    * instead.
    *
    * Gate hardening (r7): logw is emitted as micro-units
    * (round(logw·1e6) → BIGINT) and `selected` is derived from the
    * SAME integer against an integer threshold, so neither column can
    * flip on a driver-side libm/DuckDB rebuild. q127 is the designated
    * raw-transcendental row. */
  private val DsirTauMicro = -2460000L

  private def q132Dsir(s: SparkSession, dir: String): DataFrame =
    graft.operators.ImportanceScoring
      .dsirScores(docs(s, dir), "doc_id", "text", col("lang") === "en")
      .withColumn("logw_micro", round(col("logw") * lit(1e6)).cast("long"))
      .withColumn("selected", col("logw_micro") > lit(DsirTauMicro))
      .drop("logw")
      .orderBy(col("doc_id"))

  private val q132Sql =
    s"""WITH nrm AS (
       |  SELECT doc_id, lang,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
       |      'g'), ' ') AS tk
       |  FROM documents),
       |bg0 AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(tk)),
       |    i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
       |  FROM nrm WHERE len(tk) >= 2),
       |bg AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bg0),
       |rc AS (SELECT w1, w2, count(*) AS c_r FROM bg GROUP BY 1, 2),
       |tc AS (SELECT w1, w2, count(*) AS c_t FROM bg
       |       WHERE lang = 'en' GROUP BY 1, 2),
       |sc AS (SELECT (SELECT count(*) FROM bg) AS n_r,
       |         (SELECT count(*) FROM bg WHERE lang = 'en') AS n_t,
       |         (SELECT count(*) FROM rc) AS v),
       |lp AS (
       |  SELECT bg.doc_id,
       |    ln((coalesce(tc.c_t, 0) + 1.0) / (sc.n_t + sc.v))
       |      - ln((rc.c_r + 1.0) / (sc.n_r + sc.v)) AS lnr
       |  FROM bg JOIN rc USING (w1, w2) LEFT JOIN tc USING (w1, w2)
       |  CROSS JOIN sc)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(round(list_aggregate(list_sort(list(lnr)), 'sum') * 1e6)
       |    AS BIGINT) AS logw_micro,
       |  CAST(round(list_aggregate(list_sort(list(lnr)), 'sum') * 1e6)
       |    AS BIGINT) > $DsirTauMicro AS selected
       |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q144
  /** The full Gopher quality-rule battery (Rae et al. 2021 §A1.1 —
    * the rules BEYOND the repetition family that q54 pins): word
    * count, mean word length, symbol ratio, bullet/ellipsis line
    * fractions, alphabetic-word fraction, stopword count, combined
    * keep verdict. Map-only projection; every ratio is one division
    * of exact integers, so the doubles are bit-identical
    * cross-engine and the verdict thresholds can't wobble. */
  private def q144GopherBattery(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TA.gopherQuality(col("text")).as("g"))
      .select(col("doc_id"),
        col("g.n_words").as("n_words"),
        col("g.mean_word_len").as("mean_word_len"),
        col("g.symbol_ratio").as("symbol_ratio"),
        col("g.bullet_frac").as("bullet_frac"),
        col("g.ellipsis_frac").as("ellipsis_frac"),
        col("g.alpha_frac").as("alpha_frac"),
        col("g.n_stopwords").as("n_stopwords"),
        col("g.keep").as("keep"))
      .orderBy(col("doc_id"))

  private val q144Sql = {
    val stops = TA.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t0 AS (
       |  SELECT doc_id, text,
       |    CASE WHEN text IS NULL OR trim(text) = ''
       |      THEN CAST([] AS VARCHAR[])
       |      ELSE string_split_regex(trim(text), '\\s+') END AS tk,
       |    string_split(text, chr(10)) AS ln
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CASE WHEN len(tk) > 0 THEN
       |      CAST(list_aggregate(list_transform(tk, w -> len(w)),
       |        'sum') AS DOUBLE) / len(tk) ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN len(tk) > 0 THEN
       |      CAST(len(regexp_extract_all(text, '#|\\.{3}|…')) AS DOUBLE)
       |        / len(tk) ELSE 0.0 END AS symbol_ratio,
       |    CASE WHEN len(ln) > 0 THEN
       |      CAST(len(list_filter(ln,
       |        l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
       |        / len(ln) ELSE 0.0 END AS bullet_frac,
       |    CASE WHEN len(ln) > 0 THEN
       |      CAST(len(list_filter(ln,
       |        l -> regexp_matches(l, '(\\.{3}|…)\\s*$$'))) AS DOUBLE)
       |        / len(ln) ELSE 0.0 END AS ellipsis_frac,
       |    CASE WHEN len(tk) > 0 THEN
       |      CAST(len(list_filter(tk,
       |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
       |        / len(tk) ELSE 0.0 END AS alpha_frac,
       |    CAST(len(list_filter(tk,
       |      w -> list_contains([$stops], lower(w)))) AS BIGINT)
       |      AS n_stopwords
       |  FROM t0)
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       |  ellipsis_frac, alpha_frac, n_stopwords,
       |  (n_words >= 50 AND n_words <= 100000
       |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
       |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
       |    AND n_stopwords >= 2) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- q145
  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * algorithm): md5-hashed char-5-grams, window-4 minima, sorted
    * distinct selection — guaranteed to share a fingerprint with any
    * copied substring of length ≥ 8 at expected density 2/(w+1). The
    * hash array is materialized at a projection boundary before
    * window selection (the O(len²) inline pitfall); the fingerprint
    * array leaves the gate as a ','-joined string of sorted distinct
    * hashes — the gate comparator cannot sort list-typed columns (r5
    * adjudication), and the join is lossless over integer hashes. */
  private def q145Winnowing(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        TA.winnowingFingerprints(col("text"), k = 5, w = 4).as("fp"))
      .select(col("doc_id"),
        size(col("fp")).cast("bigint").as("n_fp"),
        try_element_at(col("fp"), lit(1)).as("min_fp"),
        try_element_at(col("fp"), lit(-1)).as("max_fp"),
        array_join(col("fp").cast("array<string>"), ",").as("fp"))
      .orderBy(col("doc_id"))

  private val q145Sql =
    """WITH nrm AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      |  FROM documents WHERE doc_id % 3 = 0),
      |h AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) - 4 <= 0 THEN CAST([] AS BIGINT[])
      |    ELSE list_transform(range(1, len(t) - 3),
      |      i -> ('0x' || substr(md5(substr(t, i, 5)), 1, 15))::BIGINT)
      |    END AS hs
      |  FROM nrm),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
      |         WHEN len(hs) - 3 <= 0 THEN [list_min(hs)]
      |    ELSE list_sort(list_distinct(list_transform(
      |      range(1, len(hs) - 2), j -> list_min(hs[j:j+3])))) END AS fp
      |  FROM h)
      |SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
      |  fp[1] AS min_fp, fp[len(fp)] AS max_fp,
      |  coalesce(array_to_string(fp, ','), '') AS fp
      |FROM f ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q184
  /** The C4 structural-rule battery (Raffel et al. 2020 §2.2) over a
    * deterministically RESTRUCTURED corpus: the flat fixture docs are
    * chunked into 5-word lines with arithmetic-planted hazards —
    * punctuation-less lines ((doc+j)%4=0), short lines ((3·doc+j)%5=0
    * truncates to 3 words), "javascript" lines ((doc+2j)%9=0),
    * lorem-ipsum pages (doc%23=0), curly-brace pages (doc%17=0) — so
    * every rule fires on a known subset and the oracle replays the
    * identical synthesis. TA.c4Quality then scores each page in one
    * map-only pass: per-line retention (terminal punct + ≥5 words +
    * no javascript) and the page verdict (≥3 sentences, no lorem, no
    * brace). Integers and booleans end to end. */
  private def q184C4Battery(s: SparkSession, dir: String): DataFrame = {
    val tk = TA.tokens(col("text"))
    val did = col("doc_id")
    val nl = (size(tk) / lit(5)).cast("int")
    val body = when(nl >= 1, transform(sequence(lit(1), nl), j => {
      val takeN = when((did * 3 + j) % 5 === 0, lit(3)).otherwise(lit(5))
      val base = slice(tk, (j - 1) * lit(5) + 1, takeN)
      val toks = when((did + j * 2) % 9 === 0,
        concat(array(lit("javascript")), slice(base, lit(2), size(base) - 1)))
        .otherwise(base)
      val punct = when((did + j) % 4 =!= 0, lit(".")).otherwise(lit(""))
      concat(concat_ws(" ", toks), punct)
    })).otherwise(array().cast("array<string>"))
    val lorem = when(did % 23 === 0,
      array(lit("lorem ipsum dolor sit amet.")))
      .otherwise(array().cast("array<string>"))
    val brace = when(did % 17 === 0,
      array(lit("config block { width: 5 }")))
      .otherwise(array().cast("array<string>"))
    val text2 = array_join(concat(body, lorem, brace), "\n")
    docs(s, dir)
      .select(did.as("doc_id"), TA.c4Quality(text2).as("g"))
      .select(col("doc_id"),
        col("g.n_lines").as("n_lines"), col("g.n_kept").as("n_kept"),
        col("g.kept_words").as("kept_words"),
        col("g.n_sentences").as("n_sentences"),
        col("g.has_lorem").as("has_lorem"),
        col("g.has_brace").as("has_brace"),
        col("g.keep").as("keep"))
      .orderBy(col("doc_id"))
  }

  private val q184Sql =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    CASE WHEN text IS NULL OR trim(text) = ''
      |      THEN CAST([] AS VARCHAR[])
      |      ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |b AS (SELECT doc_id, tk, len(tk) // 5 AS nl FROM t0),
      |built AS (
      |  SELECT doc_id,
      |    list_transform(range(1, nl + 1), j ->
      |      array_to_string(
      |        CASE WHEN (doc_id + j * 2) % 9 = 0
      |          THEN list_prepend('javascript',
      |            (tk[(j-1)*5+1 : (j-1)*5 +
      |              CASE WHEN (doc_id*3 + j) % 5 = 0 THEN 3 ELSE 5 END])
      |              [2:])
      |          ELSE tk[(j-1)*5+1 : (j-1)*5 +
      |            CASE WHEN (doc_id*3 + j) % 5 = 0 THEN 3 ELSE 5 END]
      |        END, ' ')
      |      || CASE WHEN (doc_id + j) % 4 <> 0 THEN '.' ELSE '' END)
      |    || CASE WHEN doc_id % 23 = 0
      |         THEN ['lorem ipsum dolor sit amet.']
      |         ELSE CAST([] AS VARCHAR[]) END
      |    || CASE WHEN doc_id % 17 = 0
      |         THEN ['config block { width: 5 }']
      |         ELSE CAST([] AS VARCHAR[]) END AS lines
      |  FROM b),
      |m AS (
      |  SELECT doc_id, lines,
      |    list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
      |      AND len(string_split_regex(trim(l), '\s+')) >= 5
      |      AND NOT contains(lower(l), 'javascript')) AS kept,
      |    contains(lower(array_to_string(lines, chr(10))), 'lorem ipsum')
      |      AS has_lorem,
      |    contains(array_to_string(lines, chr(10)), '{') AS has_brace
      |  FROM built),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(len(kept) AS BIGINT) AS n_kept,
      |    CAST(coalesce(list_aggregate(list_transform(kept,
      |      l -> len(string_split_regex(trim(l), '\s+'))), 'sum'), 0)
      |      AS BIGINT) AS kept_words,
      |    CAST(coalesce(list_aggregate(list_transform(kept,
      |      l -> len(regexp_extract_all(l, '[.!?]'))), 'sum'), 0)
      |      AS BIGINT) AS n_sentences,
      |    has_lorem, has_brace
      |  FROM m)
      |SELECT doc_id, n_lines, n_kept, kept_words, n_sentences,
      |  has_lorem, has_brace,
      |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace) AS keep
      |FROM f ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q195
  /** Unicode script-mix battery (TA.scriptMix) over a corpus with
    * deterministically planted script runs: zh docs gain CJK runs,
    * fr/es/de gain accented runs, every 13th doc gains Cyrillic
    * contamination — run lengths scale with doc_id so the dominant
    * script actually flips on the longer runs. Integer counts from
    * identical character-class regexes (ranges are literal characters
    * — the one syntax Java regex and RE2 share), fixed-precedence
    * dominant script, mixed flag. Map-only. */
  private def q195ScriptMix(s: SparkSession, dir: String): DataFrame = {
    val zh = when(col("lang") === "zh",
      expr("repeat(' 中文语料', CAST(doc_id % 30 + 1 AS INT))"))
      .otherwise(lit(""))
    val acc = when(col("lang").isin("fr", "es", "de"),
      expr("repeat(' éàñü', CAST(doc_id % 20 + 1 AS INT))"))
      .otherwise(lit(""))
    val cyr = when(col("doc_id") % 13 === 0,
      expr("repeat(' русский', CAST(doc_id % 15 + 1 AS INT))"))
      .otherwise(lit(""))
    docs(s, dir)
      .select(col("doc_id"),
        TA.scriptMix(concat(col("text"), zh, acc, cyr)).as("g"))
      .select(col("doc_id"),
        col("g.n_latin").as("n_latin"), col("g.n_cjk").as("n_cjk"),
        col("g.n_cyrillic").as("n_cyrillic"),
        col("g.n_accented").as("n_accented"),
        col("g.main_script").as("main_script"),
        col("g.is_mixed").as("is_mixed"))
      .orderBy(col("doc_id"))
  }

  private val q195Sql =
    """WITH built AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN lang = 'zh' THEN
      |         repeat(' 中文语料', CAST(doc_id % 30 + 1 AS INT))
      |       ELSE '' END
      |    || CASE WHEN lang IN ('fr', 'es', 'de') THEN
      |         repeat(' éàñü', CAST(doc_id % 20 + 1 AS INT))
      |       ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0 THEN
      |         repeat(' русский', CAST(doc_id % 15 + 1 AS INT))
      |       ELSE '' END AS t
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS BIGINT)
      |      AS n_latin,
      |    CAST(len(regexp_extract_all(t, '[一-鿿]')) AS BIGINT)
      |      AS n_cjk,
      |    CAST(len(regexp_extract_all(t, '[Ѐ-ӿ]')) AS BIGINT)
      |      AS n_cyrillic,
      |    CAST(len(regexp_extract_all(t, '[À-ÿ]')) AS BIGINT)
      |      AS n_accented
      |  FROM built)
      |SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_accented,
      |  CASE WHEN n_cjk >= n_cyrillic AND n_cjk >= n_accented
      |         AND n_cjk >= n_latin AND n_cjk > 0 THEN 'cjk'
      |       WHEN n_cyrillic >= n_accented AND n_cyrillic >= n_latin
      |         AND n_cyrillic > 0 THEN 'cyrillic'
      |       WHEN n_accented >= n_latin AND n_accented > 0
      |         THEN 'accented'
      |       WHEN n_latin > 0 THEN 'latin' ELSE 'none' END
      |    AS main_script,
      |  ((CASE WHEN n_latin > 0 THEN 1 ELSE 0 END)
      |   + (CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END)
      |   + (CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END)
      |   + (CASE WHEN n_accented > 0 THEN 1 ELSE 0 END)) >= 2
      |    AS is_mixed
      |FROM m ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q196
  /** HTML extraction battery (TA.stripHtml) over deterministically
    * HTML-wrapped docs: h1 head, classed paragraph, planted entities,
    * and a script block on every 7th doc that must vanish WHOLESALE
    * (tag-stripping alone would leak 'var x = 1;' into the text —
    * the classic extraction bug). The oracle replays the identical
    * regex chain (all patterns Java-regex ∩ RE2; DuckDB needs the
    * explicit 'g' flag Spark applies implicitly); md5 round-trips the
    * cleaned text. Map-only. */
  private def q196HtmlStrip(s: SparkSession, dir: String): DataFrame = {
    val tk = TA.tokens(col("text"))
    val head = concat_ws(" ", slice(tk, 1, 5))
    val rest = when(size(tk) > 5,
      concat_ws(" ", slice(tk, lit(6), size(tk) - 5))).otherwise(lit(""))
    val html = concat(
      lit("<html><body><h1>"), head,
      lit("</h1><p class=\"x\">"), rest,
      lit(" &amp; more &lt;tags&gt;</p>"),
      when(col("doc_id") % 7 === 0,
        lit("<script>var x = 1;</script>")).otherwise(lit("")),
      lit("</body></html>"))
    docs(s, dir)
      .select(col("doc_id"), html.as("h"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("h"), lit("<[^>]*>"), lit(0)))
          .cast("long").as("n_tags"),
        size(regexp_extract_all(col("h"),
          lit("&(amp|lt|gt|quot|#39|nbsp);"), lit(0)))
          .cast("long").as("n_entities"),
        TA.stripHtml(col("h")).as("clean"))
      .select(col("doc_id"), col("n_tags"), col("n_entities"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  private val q196Sql =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    CASE WHEN text IS NULL OR trim(text) = ''
      |      THEN CAST([] AS VARCHAR[])
      |      ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM documents),
      |built AS (
      |  SELECT doc_id,
      |    '<html><body><h1>' || array_to_string(tk[1:5], ' ')
      |    || '</h1><p class="x">'
      |    || CASE WHEN len(tk) > 5
      |         THEN array_to_string(tk[6:len(tk)], ' ') ELSE '' END
      |    || ' &amp; more &lt;tags&gt;</p>'
      |    || CASE WHEN doc_id % 7 = 0
      |         THEN '<script>var x = 1;</script>' ELSE '' END
      |    || '</body></html>' AS h
      |  FROM t0),
      |stripped AS (
      |  SELECT doc_id, h,
      |    trim(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(
      |        h,
      |        '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
      |        '<[^>]*>', ' ', 'g'),
      |        '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      |        '&quot;', '"', 'g'), '&#39;', chr(39), 'g'),
      |        '&nbsp;', ' ', 'g'),
      |        '\s+', ' ', 'g')) AS clean
      |  FROM built)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(h, '<[^>]*>')) AS BIGINT) AS n_tags,
      |  CAST(len(regexp_extract_all(h, '&(amp|lt|gt|quot|#39|nbsp);'))
      |    AS BIGINT) AS n_entities,
      |  CAST(length(clean) AS BIGINT) AS clean_len,
      |  md5(clean) AS clean_md5
      |FROM stripped ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q186
  /** Tokenizer economics battery: per-language corpus totals of
    * bytes, characters, whitespace tokens, and BPE-ish subword pieces
    * (the `[A-Za-z0-9_]+|[^A-Za-z0-9_\s]` pre-tokenizer shape), plus
    * the two ratios every tokenizer report leads with — bytes/token
    * (compression) and fertility (subwords per word). The counts are
    * exact integers and each ratio is a single IEEE division of the
    * same two integers on both engines, so the doubles are
    * bit-identical cross-engine. Map-only + one partial-aggregated
    * groupBy on a 5-value key: at 100 TB this is a single scan. */
  private def q186Fertility(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"),
        expr("octet_length(text)").cast("long").as("bytes"),
        length(col("text")).cast("long").as("chars"),
        TA.tokenCount(col("text")).cast("long").as("ws"),
        TA.bpeishTokenCount(col("text")).cast("long").as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("bytes").as("sum_bytes"),
        sum("chars").as("sum_chars"),
        sum("ws").as("sum_ws_tokens"),
        sum("bpe").as("sum_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("sum_bytes"),
        col("sum_chars"), col("sum_ws_tokens"), col("sum_bpe_tokens"),
        (col("sum_bytes").cast("double") / col("sum_bpe_tokens"))
          .as("bytes_per_token"),
        (col("sum_bpe_tokens").cast("double") / col("sum_ws_tokens"))
          .as("fertility"))
      .orderBy(col("lang"))

  private val q186Sql =
    """WITH m AS (
      |  SELECT lang,
      |    CAST(strlen(text) AS BIGINT) AS bytes,
      |    CAST(length(text) AS BIGINT) AS chars,
      |    CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |      ELSE len(string_split_regex(trim(text), '\s+')) END
      |      AS BIGINT) AS ws,
      |    CAST(len(regexp_extract_all(text,
      |      '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS bpe
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
      |  CAST(sum(chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(ws) AS BIGINT) AS sum_ws_tokens,
      |  CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
      |  CAST(sum(bytes) AS DOUBLE) / CAST(sum(bpe) AS BIGINT)
      |    AS bytes_per_token,
      |  CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS BIGINT)
      |    AS fertility
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------- q213
  /** RAKE keyword extraction (Retrieval.rakeKeywords, Rose et al.
    * 2010) corpus-wide: punctuation planted by literal replaces so
    * fragment splitting actually engages, stopwords 'a'/'the' bound
    * the candidate phrases, deg/freq from exact integer aggregates,
    * score one division. Fully relational — two explodes, one
    * (doc, fragment) window, three hash aggregates; no folds. */
  private def q213Rake(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).select(col("doc_id"),
      expr("replace(replace(lower(text), ' slow ', ', slow '), " +
        "' merge ', '; merge ')").as("t"))
    graft.operators.Retrieval
      .rakeKeywords(planted, "doc_id", "t", Seq("a", "the"))
      .filter(col("freq") >= 5)
      .orderBy(col("word"))
  }

  private val q213Sql =
    """WITH built AS (
      |  SELECT doc_id, replace(replace(lower(text), ' slow ', ', slow '),
      |    ' merge ', '; merge ') AS t
      |  FROM documents),
      |frags AS (
      |  SELECT doc_id, f.i AS fi, f.x AS frag
      |  FROM built,
      |    unnest(list_transform(string_split_regex(t, '[^a-z0-9'' ]+'),
      |      (x, i) -> struct_pack(x := x, i := i))) AS u(f)
      |  WHERE f.x <> ''),
      |words AS (
      |  SELECT doc_id, fi, w.i AS wi, w.x AS word
      |  FROM frags,
      |    unnest(list_transform(string_split_regex(frag, ' +'),
      |      (x, i) -> struct_pack(x := x, i := i))) AS u(w)
      |  WHERE w.x <> ''),
      |marked AS (
      |  SELECT doc_id, fi, wi, word,
      |    CASE WHEN word IN ('a', 'the') THEN 1 ELSE 0 END AS stop
      |  FROM words),
      |ph AS (
      |  SELECT doc_id, fi, wi, word, stop,
      |    sum(stop) OVER (PARTITION BY doc_id, fi ORDER BY wi
      |      ROWS UNBOUNDED PRECEDING) AS pid
      |  FROM marked),
      |keep AS (SELECT doc_id, fi, pid, word FROM ph WHERE stop = 0),
      |plen AS (
      |  SELECT doc_id, fi, pid, count(*) AS plen
      |  FROM keep GROUP BY 1, 2, 3),
      |occ AS (
      |  SELECT k.word, p.plen
      |  FROM keep k JOIN plen p
      |    ON p.doc_id = k.doc_id AND p.fi = k.fi AND p.pid = k.pid)
      |SELECT word, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS deg,
      |  CAST(sum(plen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS score
      |FROM occ GROUP BY 1 HAVING count(*) >= 5
      |ORDER BY word""".stripMargin

  // -------------------------------------------------------------- q214
  /** Mojibake / encoding-damage census (TA.mojibakeStats) with the
    * three classic signatures planted deterministically: every 3rd doc
    * re-decoded 'e'→'Ã©' (UTF-8-as-Latin-1), every 5th gains U+FFFD
    * replacement chars, every 7th a mojibake'd smart-quote span. Pure
    * literal replace/length arithmetic — no regex — so counts are
    * engine-exact; census per source. Map-only + one aggregate. */
  private def q214Mojibake(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).select(col("source"),
      concat(
        when(col("doc_id") % 3 === 0,
          expr("replace(text, 'e', 'Ã©')")).otherwise(col("text")),
        when(col("doc_id") % 5 === 0,
          expr("repeat('�', CAST(doc_id % 4 + 1 AS INT))"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" â€œquotedâ€"))
          .otherwise(lit(""))).as("t"))
    planted.select(col("source"), TA.mojibakeStats(col("t")).as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("g.is_damaged"), 1L).otherwise(0L)).as("n_damaged"),
        sum(col("g.n_replacement")).as("sum_replacement"),
        sum(col("g.n_atilde")).as("sum_atilde"),
        sum(col("g.n_smart")).as("sum_smart"))
      .orderBy(col("source"))
  }

  private val q214Sql =
    """WITH built AS (
      |  SELECT source,
      |    (CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'Ã©')
      |          ELSE text END)
      |    || (CASE WHEN doc_id % 5 = 0
      |          THEN repeat(chr(65533), CAST(doc_id % 4 + 1 AS INT))
      |          ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN ' â€œquotedâ€'
      |          ELSE '' END) AS t
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |    len(t) - len(replace(t, chr(65533), '')) AS n_repl,
      |    len(t) - len(replace(t, 'Ã', '')) AS n_atilde,
      |    (len(t) - len(replace(t, 'â€', ''))) // 2 AS n_smart
      |  FROM built)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_repl + n_atilde + n_smart > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged,
      |  CAST(sum(n_repl) AS BIGINT) AS sum_replacement,
      |  CAST(sum(n_atilde) AS BIGINT) AS sum_atilde,
      |  CAST(sum(n_smart) AS BIGINT) AS sum_smart
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q266
  /** Luhn checksum battery (TextAnalysis.luhnSum) — the validity test
    * PII detection applies to card-like digit runs. Pure integer
    * expression tree; synthetic 16-digit fixtures from customer
    * keys. */
  private def q266Luhn(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey"),
        (lit(4000000000000000L) + col("c_custkey") * 37)
          .cast("string").as("card"))
      .select(col("c_custkey"), col("card"),
        TextAnalysis.luhnSum(col("card")).cast("long").as("luhn_sum"),
        TextAnalysis.luhnValid(col("card")).as("valid"))
      .orderBy(col("c_custkey"))
  }

  private val q266Sql =
    """WITH b AS (
      |  SELECT c_custkey,
      |    CAST(4000000000000000 + c_custkey * 37 AS STRING) AS card
      |  FROM customer WHERE c_custkey <= 300),
      |d AS (
      |  SELECT c_custkey, card,
      |    CAST(list_sum(list_transform(
      |      generate_series(1, length(card)),
      |      i -> CASE WHEN i % 2 = 1
      |        THEN ascii(substr(reverse(card), i, 1)) - 48
      |        ELSE CASE
      |          WHEN ascii(substr(reverse(card), i, 1)) - 48 >= 5
      |          THEN (ascii(substr(reverse(card), i, 1)) - 48) * 2 - 9
      |          ELSE (ascii(substr(reverse(card), i, 1)) - 48) * 2
      |        END END)) AS BIGINT) AS luhn_sum
      |  FROM b)
      |SELECT c_custkey, card, luhn_sum, luhn_sum % 10 = 0 AS valid
      |FROM d ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q291
  /** IBAN mod-97-10 validation (TextAnalysis.ibanMod97, ISO 13616 /
    * ISO 7064) — q266's Luhn sibling for bank-account-shaped PII: the
    * 4-char rotation, letter→two-digit expansion, and the streaming
    * (state·10 + d) mod 97 fold, all as one pure expression tree (no
    * big-integer anywhere — state stays < 97). Every 10th row is the
    * ISO example IBAN (remainder 1, valid); the rest are synthetic
    * DE-BBANs whose validity falls where it falls. DuckDB replays the
    * fold with list_reduce over a prepended init. Map-only. */
  private def q291Iban(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0,
          lit("DE89370400440532013000"))
          .otherwise(concat(lit("DE"),
            lpad((col("c_custkey") % 99).cast("string"), 2, "0"),
            lpad((col("c_custkey") * 7919).cast("string"), 16, "0")))
          .as("iban"))
      .select(col("c_custkey"), col("iban"),
        TextAnalysis.ibanMod97(col("iban")).cast("long").as("mod97"),
        TextAnalysis.ibanValid(col("iban")).as("valid"))
      .orderBy(col("c_custkey"))
  }

  private val q291Sql =
    """WITH b AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 10 = 0 THEN 'DE89370400440532013000'
      |      ELSE 'DE' || lpad(CAST(c_custkey % 99 AS VARCHAR), 2, '0')
      |        || lpad(CAST(c_custkey * 7919 AS VARCHAR), 16, '0')
      |    END AS iban
      |  FROM customer),
      |d AS (
      |  SELECT c_custkey, iban,
      |    list_reduce(list_prepend(0, list_transform(
      |      generate_series(1, len(iban)),
      |      i -> ascii(substr(substr(iban, 5) || substr(iban, 1, 4),
      |        i, 1)))),
      |      (acc, c) -> CASE
      |        WHEN c BETWEEN 48 AND 57 THEN (acc * 10 + (c - 48)) % 97
      |        ELSE ((acc * 10 + (c - 55) // 10) % 97 * 10
      |          + (c - 55) % 10) % 97
      |      END) AS m
      |  FROM b)
      |SELECT c_custkey, iban, CAST(m AS BIGINT) AS mod97,
      |  m = 1 AS valid
      |FROM d ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q337
  /** Index of coincidence per document — the log-free gibberish
    * signal (Friedman's IC): over the lowercased letters-only stream,
    * IC = Σ f_c(f_c−1) / (L(L−1)); uniform-random text sits near
    * 1/26 ≈ 0.0385, English near 0.067 — a quality-filter feature
    * with EXACT integer numerator and denominator and one final
    * division. One char-explode + two aggregates, map-side combined.
    */
  private def q337Coincidence(s: SparkSession, dir: String): DataFrame = {
    val t = regexp_replace(lower(col("text")), "[^a-z]", "")
    val base = docs(s, dir).select(col("doc_id"), t.as("t"))
      .filter(length(col("t")) >= 2)
    val freq = base
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")))).as("i"),
        col("t"))
      .select(col("doc_id"),
        substring(col("t"), col("i"), lit(1)).as("c"))
      .groupBy(col("doc_id"), col("c"))
      .agg(count(lit(1)).as("f"))
    freq.groupBy(col("doc_id"))
      .agg(sum(col("f")).as("l_len"),
        sum(col("f") * (col("f") - 1L)).as("sum_ff1"))
      .select(col("doc_id"), col("l_len"), col("sum_ff1"),
        (col("sum_ff1").cast("double") /
          (col("l_len") * (col("l_len") - 1L)).cast("double")).as("ic"))
      .orderBy(col("doc_id"))
  }

  private val q337Sql =
    """WITH base AS (
      |  SELECT doc_id, regexp_replace(lower(text), '[^a-z]', '', 'g')
      |    AS t
      |  FROM documents),
      |chars AS (
      |  SELECT doc_id,
      |    substr(t, CAST(unnest(generate_series(1, length(t)))
      |      AS INT), 1) AS c
      |  FROM base WHERE length(t) >= 2),
      |freq AS (
      |  SELECT doc_id, c, count(*) AS f FROM chars GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(f) AS BIGINT) AS l_len,
      |  CAST(sum(f * (f - 1)) AS BIGINT) AS sum_ff1,
      |  CAST(sum(f * (f - 1)) AS DOUBLE)
      |    / CAST(CAST(sum(f) AS BIGINT)
      |      * (CAST(sum(f) AS BIGINT) - 1) AS DOUBLE) AS ic
      |FROM freq GROUP BY 1 ORDER BY doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q337_coincidence" -> (q337Coincidence _),
    "q291_iban" -> (q291Iban _),
    "q266_luhn" -> (q266Luhn _),
    "q213_rake" -> (q213Rake _),
    "q214_mojibake" -> (q214Mojibake _),
    "q184_c4_battery" -> (q184C4Battery _),
    "q195_script_mix" -> (q195ScriptMix _),
    "q196_html_strip" -> (q196HtmlStrip _),
    "q186_tokenizer_fertility" -> (q186Fertility _),
    "q144_gopher_battery" -> (q144GopherBattery _),
    "q145_winnowing" -> (q145Winnowing _),
    "q132_dsir" -> (q132Dsir _),
    "q93_expectations" -> (q93Expectations _),
    "q54_quality_repetition" -> (q54Repetition _),
    "q55_pii_redact" -> (q55Pii _),
    "q56_decontaminate" -> (q56Decontaminate _),
    "q60_lm_score" -> (q60LmScore _),
    "q380_kneser_ney" -> (q380KneserNey _),
    "q381_moore_lewis" -> (q381MooreLewis _),
    "q401_preference_pairs" -> (q401PreferencePairs _),
    "q64_quality_funnel" -> (q64Funnel _),
  )

  val oracles: Map[String, String] = Map(
    "q337_coincidence" -> q337Sql,
    "q291_iban" -> q291Sql,
    "q266_luhn" -> q266Sql,
    "q213_rake" -> q213Sql,
    "q214_mojibake" -> q214Sql,
    "q184_c4_battery" -> q184Sql,
    "q195_script_mix" -> q195Sql,
    "q196_html_strip" -> q196Sql,
    "q186_tokenizer_fertility" -> q186Sql,
    "q144_gopher_battery" -> q144Sql,
    "q145_winnowing" -> q145Sql,
    "q132_dsir" -> q132Sql,
    "q93_expectations" -> q93Sql,
    "q54_quality_repetition" -> q54Sql,
    "q55_pii_redact" -> q55Sql,
    "q56_decontaminate" -> q56Sql,
    "q60_lm_score" -> q60Sql,
    "q380_kneser_ney" -> q380Sql,
    "q381_moore_lewis" -> q381Sql,
    "q401_preference_pairs" -> q401Sql,
    "q64_quality_funnel" -> q64Sql,
  )
}
