package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extension, SURVEY.md §7): tokenization, quality scoring, language ID,
  * fingerprinting. All pure `Column` expressions — codegen-friendly, no
  * UDFs, and every function has an exactly-equivalent ANSI/DuckDB SQL
  * form used by the driver's oracle.
  *
  * At 100 TB these run as map-only projections (no shuffle); the only
  * aggregation is whatever the caller groups by afterwards.
  */
object TextAnalysis {

  /** Whitespace tokenization. Empty/blank text -> empty array. */
  def tokens(text: Column): Column =
    when(trim(text) === "" || text.isNull, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of word chars OR single non-word-non-space
    * chars (the shape of GPT-style pre-tokenizers). Counts pieces without
    * materializing them. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** ASCII-punctuation character ratio (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", ""))
    when(length(text) > 0, punct.cast("double") / length(text))
      .otherwise(lit(0.0))
  }

  /** Small fixed English stopword list (public, standard). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Fraction of tokens that are stopwords (0 for empty text). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => lower(t).isin(stopwords.map(x => x: Any): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]:
    * 0.4 * length saturation (chars/500 capped at 1)
    * + 0.3 * (1 - min(1, 4*punct_ratio))
    * + 0.3 * min(1, 5*stopword_ratio).
    * The exact weights are this engine's own policy (the point is a
    * deterministic, oracle-checkable scoring pipeline). */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(length(text).cast("double") / lit(500.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(lit(4.0) * punctRatio(text), lit(1.0))) +
      lit(0.3) * least(lit(5.0) * stopwordRatio(text), lit(1.0))

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Public common-word lists. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "dans", "est", "pour", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "den", "von"))

  /** Language ID: argmax of per-language stopword hit counts; ties and
    * zero-hit texts -> "und" (undetermined). Deterministic: a language
    * wins only with a STRICTLY greater count than every later language
    * and >= every earlier one (priority order = LangMarkers order). */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => lower(t).isin(words.map(x => x: Any): _*)))
    }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    val maxScore = greatest(scores.map(_._2): _*)
    // first language (in LangMarkers priority order) holding the max score
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(anyHit && s === maxScore, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: 64-bit-ish hash of whitespace-normalized,
    * lowercased text — md5-based so the oracle (DuckDB) computes the
    * identical value. First 16 hex chars = 64 bits of the digest. */
  def fingerprint(text: Column): Column =
    substring(md5(normalizeText(text)), 1, 16)

  /** Normalization for fingerprint/dedup: lowercase + collapse whitespace
    * + trim. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Luhn checksum over a digit string (ISO/IEC 7812) — the validity
    * test that separates card-LIKE digit runs from real card numbers
    * in PII detection (a 16-digit run that fails Luhn is noise; one
    * that passes deserves redaction). Pure integer expression tree
    * (positions via sequence, alternate-double-minus-9, integer sum)
    * — codegen-friendly, no UDF, order-free.
    * Returns the checksum total (NULL for an empty string, matching
    * DuckDB's list_sum over generate_series(1,0) = empty list — and
    * guarding Spark's sequence(1,0), which counts DOWN);
    * validity is `luhnSum % 10 === 0`. */
  def luhnSum(digits: Column): Column = {
    val rev = reverse(digits)
    when(length(digits) >= 1,
      aggregate(
        transform(sequence(lit(1), length(digits)), i => {
          val d = ascii(rev.substr(i, lit(1))) - 48
          when(i % 2 === 1, d)
            .otherwise(when(d >= 5, d * 2 - 9).otherwise(d * 2))
        }),
        lit(0), (acc, x) => acc + x))
      .otherwise(lit(null).cast("int"))
  }

  def luhnValid(digits: Column): Column = luhnSum(digits) % 10 === 0

  /** ISO 7064 mod-97-10 remainder of an IBAN (ISO 13616): rotate the
    * first four chars to the end, expand letters to two digits
    * (A=10 … Z=35), then fold the digit stream left-to-right as
    * state = (state·10 + d) mod 97 — the streaming-safe form of the
    * huge-integer mod (state < 97 ⇒ state·10 + 35 never overflows,
    * letters fold as two steps). Uppercase ASCII letters/digits only;
    * anything else poisons the fold to NULL via ANSI-safe branches.
    * A valid IBAN has remainder 1. Pure expression tree, map-only. */
  def ibanMod97(iban: Column): Column = {
    val rot = concat(iban.substr(lit(5), length(iban) - 4),
      iban.substr(lit(1), lit(4)))
    val codes = transform(sequence(lit(1), length(rot)), i => {
      val c = ascii(rot.substr(i, lit(1)))
      when(c >= 48 && c <= 57, c - 48)
        .when(c >= 65 && c <= 90, c - 55) // 'A' -> 10
    })
    when(length(iban) >= 5,
      aggregate(codes, lit(0), (acc, v) => {
        val d1 = floor(v / 10).cast("int") // v ∈ [10, 35] ⇒ exact
        val d2 = v % 10
        when(v <= 9, (acc * 10 + v) % 97)
          .otherwise(((acc * 10 + d1) % 97 * 10 + d2) % 97)
      }))
  }

  def ibanValid(iban: Column): Column = ibanMod97(iban) === 1

  /** THE alnum word tokenizer: lowercase, split on non-[a-z0-9] runs,
    * empties dropped. Single definition shared by the n-gram /
    * vocab / feature-encoding / retrieval family — a tokenizer tweak
    * here changes all of them together (they must not diverge). */
  def alnumTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => w =!= "")

  /** Word n-gram shingles: lowercase alnum words joined by single
    * spaces, one n-gram per window position (empty array when the doc
    * has fewer than n words — NOT a truncated shingle). The shared
    * tokenizer for the n-gram dedup/similarity family. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1 (got $n)")
    val words = alnumTokens(text)
    // sequence(1, k) with k < 1 counts DOWN in Spark — guard short docs
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Character n-gram shingles of the normalized text (for Jaccard /
    * MinHash dedup). Text shorter than n -> single shingle of the whole
    * text. Backed by the codegen'd CharShinglesExpression (single pass;
    * the sequence+substr+array_distinct composition re-walks the string
    * per position and the distinct is O(n^2)); equivalence pinned in
    * ExpressionsSpec. */
  def charShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.CharShinglesExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          normalizeText(text)), n))

  /** Character n-gram shingles WITHOUT the normalization pass — for
    * byte streams reinterpreted as strings (Multimodal.binaryNearDups),
    * where lowercasing / whitespace-collapse would alias genuinely
    * different byte values (0x41 vs 0x61, padding runs) into one
    * sketch. Text semantics want [[charShingles]]. */
  def rawCharShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.CharShinglesExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text), n))

  /** Word n-gram shingles of the normalized text — the canonical
    * LLM-corpus dedup unit (13-gram-style word windows). `<= n` tokens
    * -> single shingle of the whole normalized text, mirroring
    * charShingles' short-input rule. Codegen'd single pass; equivalence
    * pinned in ExpressionsSpec. */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.WordShinglesExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          normalizeText(text)), n))

  /** Unrestricted Damerau–Levenshtein distance (adjacent
    * transpositions cost 1 and may be re-edited; matches DuckDB's
    * damerau_levenshtein). Spark has only plain levenshtein. Backed by
    * the codegen'd DamerauLevenshteinExpression — O(|a|·|b|) per pair,
    * so bound candidate pairs before applying it at scale (the q74
    * FastSS / q94 prefix-filter discipline). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.DamerauLevenshteinExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(b)))

  /** Jaro similarity pinned bit-for-bit to DuckDB 1.0's arithmetic
    * (see JaroWinklerUtil's scaladoc for the probed corners). */
  def jaro(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.JaroExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(b)))

  /** Jaro–Winkler similarity (prefix boost l ≤ 4 above jaro 0.7) —
    * the record-linkage name comparator; DuckDB-bit-exact. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.JaroWinklerExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(b)))

  /** Encoding-damage (mojibake) census: counts the three loud
    * signatures of a corrupted decode pipeline —
    *   n_replacement: U+FFFD replacement chars (invalid bytes hit a
    *     lenient decoder);
    *   n_atilde: 'Ã' chars (UTF-8 multibyte heads re-decoded as
    *     Latin-1 — 'é' becomes 'Ã©', etc.);
    *   n_smart: 'â€' digraphs (mojibake'd smart quotes/dashes);
    * plus is_damaged = any hit. Pure literal replace/length
    * arithmetic (no regex), so any engine counts identically; counts
    * are exact multiples, so the pattern-length division is exact.
    * Map-only — one codegen'd pass per row at any corpus size. */
  def mojibakeStats(text: Column): Column = {
    def cnt(pat: String): Column =
      ((length(text) - length(
        org.apache.spark.sql.functions.replace(text, lit(pat), lit(""))))
        / lit(pat.length)).cast("long")
    val nRepl = cnt("�")
    val nAtilde = cnt("Ã")
    val nSmart = cnt("â€")
    struct(nRepl.as("n_replacement"), nAtilde.as("n_atilde"),
      nSmart.as("n_smart"),
      (nRepl + nAtilde + nSmart > 0L).as("is_damaged"))
  }

  /** Gopher-style repetition quality stats (Rae et al. 2021 §A1.1):
    * struct(top_word_fraction, dup_2gram_fraction, dup_3gram_fraction)
    * over the normalized token stream, in ONE codegen'd pass (see
    * RepetitionStatsExpression). Map-only at any scale. */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.RepetitionStatsExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          normalizeText(text))))

  /** Column-composition form of repetitionStats (spec reference only):
    * same three fractions via higher-order functions. Quadratic in the
    * token count (per-token count scan) — the expression form is the
    * production path. */
  private[graft] def repetitionStatsComposed(text: Column): Column = {
    val tk = split(normalizeText(text), " ")
    def ngrams(k: Int): Column =
      transform(sequence(lit(1), size(tk) - lit(k - 1)),
        i => concat_ws(" ", slice(tk, i, lit(k))))
    def dupFrac(k: Int): Column =
      when(size(tk) < k, lit(0.0)).otherwise(
        (size(ngrams(k)) - size(array_distinct(ngrams(k)))).cast("double") /
          size(ngrams(k)))
    val top = when(size(tk) === 0 || (size(tk) === 1 && element_at(tk, 1) === ""),
      lit(0.0)).otherwise(
      array_max(transform(array_distinct(tk),
        w => size(filter(tk, x => x === w)))).cast("double") / size(tk))
    struct(top.as("top_word_fraction"),
      dupFrac(2).as("dup_2gram_fraction"),
      dupFrac(3).as("dup_3gram_fraction"))
  }

  /** Column-composition form of wordShingles (spec reference only). */
  private[graft] def wordShinglesComposed(text: Column, n: Int): Column = {
    val norm = normalizeText(text)
    val tk = split(norm, " ")
    when(size(tk) <= n, array(norm)).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(tk) - lit(n)),
        i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
  }

  /** Column-composition form of charShingles (spec reference only). */
  private[graft] def charShinglesComposed(text: Column, n: Int): Column = {
    val norm = normalizeText(text)
    when(length(norm) <= n, array(norm)).otherwise(
      array_distinct(transform(
        sequence(lit(1), length(norm) - lit(n - 1)),
        i => norm.substr(i, lit(n)))))
  }

  /** The full Gopher document-quality rule battery (Rae et al. 2021
    * §A1.1 — the metrics BEYOND the repetition family, which
    * [[repetitionStats]] covers): word count, mean word length,
    * symbol-to-word ratio (#/ellipsis), bullet-start and ellipsis-end
    * line fractions, alphabetic-word fraction, stopword count, plus
    * the combined keep verdict at the paper's thresholds. One struct
    * of pure Column expressions — map-only projection at any scale,
    * and every metric is an exact int ratio (single division of exact
    * integers), so cross-engine floats are bit-identical. */
  def gopherQuality(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.GopherQualityExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          coalesce(text, lit("")))))

  /** Reference Column-composition form of [[gopherQuality]] (kept for
    * the equivalence spec; five interpreted higher-order filters per
    * document — do not use in hot paths). */
  private[graft] def gopherQualityComposed(text: Column): Column = {
    val words = tokens(text)
    val nWords = size(words).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val meanWordLen = when(nWords > 0,
      aggregate(transform(words, w => length(w).cast("long")), lit(0L),
        (a, x) => a + x).cast("double") / nWords).otherwise(lit(0.0))
    val nSymbols = size(regexp_extract_all(text,
      lit("#|\\.{3}|…"), lit(0))).cast("long")
    val symbolRatio = when(nWords > 0,
      nSymbols.cast("double") / nWords).otherwise(lit(0.0))
    val bulletFrac = when(nLines > 0,
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") /
        nLines).otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0,
      size(filter(lines, l => l.rlike("(\\.{3}|…)\\s*$"))).cast("double") /
        nLines).otherwise(lit(0.0))
    val alphaFrac = when(nWords > 0,
      size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
        nWords).otherwise(lit(0.0))
    val nStopwords = size(filter(words,
      w => lower(w).isin(EnglishStopwords: _*))).cast("long")
    val keep = nWords >= 50 && nWords <= 100000 &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && nStopwords >= 2
    struct(nWords.as("n_words"), meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      nStopwords.as("n_stopwords"), keep.as("keep"))
  }

  /** Winnowing document fingerprints (Schleimer et al. 2003 — the MOSS
    * algorithm): hash every char k-gram of the normalized text, slide
    * a w-hash window, keep each window's minimum; the selected set is
    * guaranteed to share a fingerprint with any copy of length
    * ≥ w + k − 1, at expected density 2/(w+1) — position-robust
    * substring fingerprints where [[fingerprint]] is whole-document.
    * Hashes are the house md5-60-bit ints, so ties are ~impossible
    * and the whole construction replays exactly in the DuckDB oracle.
    * Returns the SORTED DISTINCT fingerprint array; shorter-than-one-
    * window texts yield their single overall minimum; texts shorter
    * than k yield the empty array. Map-only; per-doc work O(len · w)
    * with small w.
    *
    * This is the PRODUCTION path: the whole hash → window-min → sort/
    * dedup chain as ONE codegen'd pass (WinnowingExpression) — no HOF
    * interpretation, no CollapseProject re-inline hazard (measured
    * 7.6 s → ~2 s at sf0.1 vs the composed winnowingHashes +
    * winnowingSelect form below, which is kept as the
    * equivalence-spec reference). */
  def winnowingFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.WinnowingExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          normalizeText(text)), k, w))

  /** Composed-form reference, step 1: the 60-bit md5 hash of every
    * char k-gram as an array (< k chars → empty). Pair with
    * [[winnowingSelect]]; see [[winnowingFingerprints]] for the
    * production single-pass node. */
  def winnowingHashes(text: Column, k: Int = 5): Column = {
    require(k >= 2, s"winnowing needs k >= 2 (got $k)")
    val norm = normalizeText(text)
    val m = (length(norm) - lit(k - 1)).cast("int") // k-gram count
    when(m <= 0, array().cast("array<long>")).otherwise(
      transform(sequence(lit(1), m),
        i => conv(substring(md5(norm.substr(i, lit(k))), 1, 15), 16, 10)
          .cast("long")))
  }

  /** C4 cleaning rules (Raffel et al. 2020 §2.2) as one map-only
    * struct: per-LINE retention (ends in a terminal punctuation mark,
    * has ≥ 5 words, no "javascript"), and the page-level verdicts
    * (≥ 3 sentences among retained lines, no "lorem ipsum", no curly
    * brace). The dirty-word list is out of scope (fixture corpora are
    * synthetic); the structural rules — the ones that do the bulk of
    * C4's dropping — are all here. Counts are integers and the
    * verdict is boolean logic over them, so the row is oracle-exact.
    * At 100 TB this is one codegen'd projection pass, no shuffle. */
  def c4Quality(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.C4QualityExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          coalesce(text, lit("")))))

  /** Reference Column-composition form of [[c4Quality]] (kept for the
    * equivalence spec; the interpreted higher-order-function chain
    * measured 10–14 s on the sf0.1 battery row vs ~1 s for the
    * codegen'd single pass — do not use in hot paths). */
  private[graft] def c4QualityComposed(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val lines = filter(transform(split(t, "\n"), l => trim(l)),
      l => l =!= "")
    val wordsOf = (l: Column) => size(split(l, "\\s+"))
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") && wordsOf(l) >= 5 &&
        !lower(l).contains("javascript"))
    val keptWords = aggregate(kept, lit(0L),
      (acc, l) => acc + wordsOf(l).cast("long"))
    val nSentences = aggregate(kept, lit(0L), (acc, l) =>
      acc + size(regexp_extract_all(l, lit("[.!?]"), lit(0))).cast("long"))
    val hasLorem = lower(t).contains("lorem ipsum")
    val hasBrace = t.contains("{")
    struct(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      keptWords.as("kept_words"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (nSentences >= 3 && !hasLorem && !hasBrace).as("keep"))
  }

  /** Shared Unicode script ranges — actual characters (not escape
    * syntax), so the SAME Scala string drives Java regex and RE2. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "cjk" -> "一-鿿",
    "cyrillic" -> "Ѐ-ӿ",
    "accented" -> "À-ÿ")

  /** Unicode script mix per document — the multilingual-corpus triage
    * pass (is this page really the language its tag claims? is it
    * script-contaminated?): per-script character counts over four
    * ranges, the dominant script under a fixed precedence (cjk >
    * cyrillic > accented > latin on ties — rarer scripts win so a
    * 50/50 contamination surfaces), and a mixed flag when ≥ 2
    * scripts appear. Counts are integers from identical
    * character-class regexes both engines (ranges are literal chars,
    * valid in Java regex and RE2 alike); map-only at any scale. */
  def scriptMix(text: Column): Column = {
    val t = coalesce(text, lit(""))
    def cnt(range: String): Column =
      size(regexp_extract_all(t, lit(s"[$range]"), lit(0))).cast("long")
    val latin = cnt(ScriptRanges(0)._2)
    val cjk = cnt(ScriptRanges(1)._2)
    val cyr = cnt(ScriptRanges(2)._2)
    val acc = cnt(ScriptRanges(3)._2)
    val main = when(cjk >= cyr && cjk >= acc && cjk >= latin && cjk > 0,
      lit("cjk"))
      .when(cyr >= acc && cyr >= latin && cyr > 0, lit("cyrillic"))
      .when(acc >= latin && acc > 0, lit("accented"))
      .when(latin > 0, lit("latin"))
      .otherwise(lit("none"))
    val nScripts = Seq(latin, cjk, cyr, acc)
      .map(c => when(c > 0, 1).otherwise(0)).reduce(_ + _)
    struct(latin.as("n_latin"), cjk.as("n_cjk"), cyr.as("n_cyrillic"),
      acc.as("n_accented"), main.as("main_script"),
      (nScripts >= 2).as("is_mixed"))
  }

  /** HTML boilerplate strip (the trafilatura-lite text-extraction
    * step): drop script/style blocks wholesale, strip every tag,
    * decode the six standard entities, collapse whitespace. Pure
    * regex/replace chain — one codegen'd map pass, and every pattern
    * is Java-regex ∩ RE2 so the oracle runs the identical pipeline. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(coalesce(html, lit("")),
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, e, r) // entity names contain no regex metachars
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Window-minimum selection over an ALREADY-MATERIALIZED hash column
    * from [[winnowingHashes]] — `hashes` must be a bound column, not
    * an inline expression: Catalyst inlines an inline tree into every
    * window's slice, turning selection O(len·w) into O(len²·md5) (the
    * LanguageModel.bigramsFromTokens pitfall). Texts shorter than one
    * window yield their single overall minimum; empty hash arrays stay
    * empty. */
  def winnowingSelect(hashes: Column, w: Int = 4): Column = {
    require(w >= 1, s"winnowing needs w >= 1 (got $w)")
    val nWin = size(hashes) - lit(w - 1)
    when(size(hashes) === 0, array().cast("array<long>"))
      .when(nWin <= 0, array(array_min(hashes)))
      .otherwise(sort_array(array_distinct(
        transform(sequence(lit(1), nWin),
          j => array_min(slice(hashes, j, lit(w)))))))
  }
}
