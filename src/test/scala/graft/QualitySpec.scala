package graft

import org.apache.spark.sql.functions._
import graft.functions.{PiiRedaction, TextAnalysis => TA}
import graft.operators.Decontamination

/** Corpus-quality operators: Gopher repetition rules, PII redaction,
  * eval-set decontamination (round-4 north-star extensions). */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- repetition stats

  test("repetitionStats: hand-computed fractions") {
    // 6 tokens: 'a' x4 -> top 4/6; 2-grams [a a, a a, a b, b a, a c]
    // -> 5 total, 4 distinct -> 0.2; 3-grams [a a a, a a b, a b a,
    // b a c] -> 4 total 4 distinct -> 0.0
    val r = evalOne[org.apache.spark.sql.Row](
      TA.repetitionStats(lit("a a a b a c")))
    r.getDouble(0) shouldBe (4.0 / 6.0)
    r.getDouble(1) shouldBe 0.2
    r.getDouble(2) shouldBe 0.0
  }

  test("repetitionStats: degenerate repeated word") {
    val r = evalOne[org.apache.spark.sql.Row](
      TA.repetitionStats(lit("spam spam spam spam")))
    r.getDouble(0) shouldBe 1.0
    r.getDouble(1) shouldBe (2.0 / 3.0)
    r.getDouble(2) shouldBe 0.5
  }

  test("repetitionStats: short and empty inputs") {
    val one = evalOne[org.apache.spark.sql.Row](TA.repetitionStats(lit("word")))
    one.getDouble(0) shouldBe 1.0
    one.getDouble(1) shouldBe 0.0
    one.getDouble(2) shouldBe 0.0
    val empty = evalOne[org.apache.spark.sql.Row](TA.repetitionStats(lit("  ")))
    empty.getDouble(0) shouldBe 0.0
    empty.getDouble(1) shouldBe 0.0
    empty.getDouble(2) shouldBe 0.0
  }

  test("repetitionStats: expression equals composed reference on corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
      TA.repetitionStats(col("text")).as("e"),
      TA.repetitionStatsComposed(col("text")).as("c"))
    both.filter(col("e") =!= col("c")).count() shouldBe 0L
  }

  // ------------------------------------------------------ PII redaction

  test("PII: masks and counts all three classes") {
    val t = lit("mail Bob.Smith+x@corp.example.org or 415-555-0123, " +
      "backup 555-0199, host 192.168.1.10 done")
    evalOne[Int](PiiRedaction.emailCount(t)) shouldBe 1
    evalOne[Int](PiiRedaction.phoneCount(t)) shouldBe 2
    evalOne[Int](PiiRedaction.ipv4Count(t)) shouldBe 1
    evalOne[String](PiiRedaction.redact(t)) shouldBe
      "mail <EMAIL> or <PHONE>, backup <PHONE>, host <IP> done"
  }

  test("PII: clean text untouched, zero counts") {
    val t = lit("the quick brown fox, order 12-34, version 1.2 beta")
    evalOne[Int](PiiRedaction.emailCount(t)) shouldBe 0
    evalOne[Int](PiiRedaction.phoneCount(t)) shouldBe 0
    evalOne[Int](PiiRedaction.ipv4Count(t)) shouldBe 0
    evalOne[String](PiiRedaction.redact(t)) shouldBe
      "the quick brown fox, order 12-34, version 1.2 beta"
  }

  test("PII: word boundaries reject embedded digit runs") {
    // 7 digits before the dash: \b…XXX-XXXX must not half-match
    val t = lit("ticket 1234567-8901234 ref")
    evalOne[Int](PiiRedaction.phoneCount(t)) shouldBe 0
    // recall-over-precision: the leading quad of a longer dotted run
    // still matches (RE2 has no lookahead to forbid a trailing .digit)
    evalOne[Int](PiiRedaction.ipv4Count(lit("v 1.2.3.4.5 x"))) shouldBe 1
  }

  test("repetition stats and PII mask are SQL-callable after registration") {
    graft.expressions.GraftExtensions.register(spark)
    Seq(("spam  SPAM spam", "mail a@b.io or 555-0199 at 10.0.0.1"))
      .toDF("rep", "pii").createOrReplaceTempView("quality_t")
    val r = spark.sql(
      """SELECT graft_repetition_stats(rep).top_word_fraction AS topf,
        |  graft_redact_pii(pii) AS clean
        |FROM quality_t""".stripMargin).head()
    r.getDouble(0) shouldBe 1.0
    r.getString(1) shouldBe "mail <EMAIL> or <PHONE> at <IP>"
  }

  // --------------------------------------------------- decontamination

  test("decontamination: flags exactly the docs sharing a 13-gram") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")        // 30 tokens
    val leaked = (1 to 30).map(i => s"w$i").take(15).mkString(" ")
    val clean = (100 to 129).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, words), (2L, clean), (3L, "tiny doc"))
      .toDF("doc_id", "text")
    val eval = Seq((900L, leaked)).toDF("eval_id", "eval_text")

    val out = Decontamination.contaminatedDocs(
      corpus, "doc_id", "text", eval, "eval_id", "eval_text", n = 13)
      .collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L)
    // 15-token eval prompt -> 3 distinct 13-grams, all present in doc 1
    out.head.getLong(1) shouldBe 3L
    out.head.getLong(2) shouldBe 900L
  }

  test("semantic decontamination: flags the near-copy, spares the " +
      "orthogonal doc, blocks on the sign bucket") {
    // corpus: v1 near-parallel to the eval vector (flagged), v2
    // orthogonal (bucket-mate, dot below threshold), v3 opposite-sign
    // first dims (different bucket — never even dotted)
    val corpus = Seq(
      (1L, Seq(1.0, 1.0, 1.0, 1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 1.0, 1.0, 1.0, -120.0 / 127.0, 0.0)),
      (3L, Seq(-1.0, -1.0, -1.0, -1.0, 0.0, 0.0)))
      .toDF("doc_id", "emb")
    val eval = Seq((900L, Seq(1.0, 1.0, 1.0, 1.0, 0.02, 0.0)))
      .toDF("eval_id", "ev")
    // quantized: v1 -> (127,127,127,127,0,0); eval -> (127,127,127,127,3,0)
    // dot(v1, eval) = 4*127*127 = 64516; v2 shares the bucket but its
    // -120 dim adds nothing against eval's +3 -> dot 64516 - 360
    val out = Decontamination.semanticContaminatedDocs(
      corpus, "doc_id", "emb", eval, "eval_id", "ev",
      minDot = 64500L).orderBy("doc_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L)
    out.head.getLong(1) shouldBe 1L      // n_hits
    out.head.getLong(2) shouldBe 64516L  // max_dot = 4 * 127^2
    out.head.getLong(3) shouldBe 900L
    // lower threshold picks up the bucket-mate but still not v3
    val loose = Decontamination.semanticContaminatedDocs(
      corpus, "doc_id", "emb", eval, "eval_id", "ev",
      minDot = 60000L).orderBy("doc_id").collect()
    loose.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
  }

  test("multi-probe decon (probeFlips = 1) recovers a one-sign-flip " +
      "leak the single-bucket probe misses, at eval-side cost only") {
    // corpus doc 1 sits in bucket 0b1110 (dim 1 negative); the eval
    // leak is the same vector with dim 1 flipped positive (bucket
    // 0b1111) — their dot is still huge, but the home buckets differ
    // in exactly one bit
    val corpus = Seq((1L, Seq(-0.02, 1.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("doc_id", "emb")
    val eval = Seq((900L, Seq(0.02, 1.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("eval_id", "ev")
    // q = (∓3, 127, 127, 127, 127, 127): dot = -9 + 5·127² = 80636
    val miss = Decontamination.semanticContaminatedDocs(
      corpus, "doc_id", "emb", eval, "eval_id", "ev",
      minDot = 80000L).collect()
    miss shouldBe empty // the documented single-probe recall trade
    val hit = Decontamination.semanticContaminatedDocs(
      corpus, "doc_id", "emb", eval, "eval_id", "ev",
      minDot = 80000L, probeFlips = 1).collect()
    hit.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 1L, 80636L))
    // probeFlips = 0 is bit-identical to the pre-dial operator: the
    // near-parallel fixture above still flags through the dial default
    val same = Decontamination.semanticContaminatedDocs(
      corpus, "doc_id", "emb", eval, "eval_id", "ev",
      minDot = 80000L, probeFlips = 0).collect()
    same shouldBe empty
  }

  test("decontaminate drops flagged docs and keeps the rest") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val clean = (100 to 129).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, words), (2L, clean)).toDF("doc_id", "text")
    val eval = Seq((900L, words)).toDF("eval_id", "eval_text")
    val kept = Decontamination.decontaminate(
      corpus, "doc_id", "text", eval, "eval_id", "eval_text")
    kept.select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  // ------------------------------------------------------ LM scoring

  test("bigram LM score matches hand computation") {
    import graft.operators.LanguageModel
    // corpus: d1 = "a b a b", d2 = "a b c"
    // c(a,b)=3 c(b,a)=1 c(b,c)=1; histories a->3, b->2; V=3
    // P(a,b)=4/6, P(b,a)=2/5, P(b,c)=2/5
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LanguageModel.scoreDocs(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    got.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 3L), (2L, 2L))
    val p_ab = 4.0 / 6.0; val p_ba = 2.0 / 5.0; val p_bc = 2.0 / 5.0
    got(0).getDouble(2) shouldBe
      -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3 +- 1e-12
    got(1).getDouble(2) shouldBe
      -(math.log(p_ab) + math.log(p_bc)) / 2 +- 1e-12
    // repeated boilerplate scores as more predictable (lower) than the
    // doc that ends in a rarer continuation
    got(0).getDouble(2) should be < got(1).getDouble(2)
  }

  test("Kneser-Ney bigram score matches hand computation and its " +
      "continuation mass sums to 1 over the history") {
    import graft.operators.LanguageModel
    // corpus: d1 = "a b", d2 = "a b", d3 = "a c"
    // bigram types: (a,b) c=2, (a,c) c=1; history a: c_h=3, N1+(a·)=2;
    // contexts: N1+(·b)=1, N1+(·c)=1; |types|=2; D=0.75
    // P(b|a) = (2-.75)/3 + .75·2/3·(1/2) = 2/3
    // P(c|a) = (1-.75)/3 + .75·2/3·(1/2) = 1/3   (sums to 1 — the
    // defining KN property: discounted mass returns via continuation)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = LanguageModel.scoreDocsKneserNey(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    got.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 1L), (2L, 1L), (3L, 1L))
    got(0).getDouble(2) shouldBe -math.log(2.0 / 3.0) +- 1e-12
    got(1).getDouble(2) shouldBe -math.log(2.0 / 3.0) +- 1e-12
    got(2).getDouble(2) shouldBe -math.log(1.0 / 3.0) +- 1e-12
    // the rarer continuation scores as less predictable
    got(2).getDouble(2) should be > got(0).getDouble(2)
  }

  test("cross-corpus scoring: unseen bigram takes the Laplace floor, " +
      "unseen history degrades to 1/V; mooreLewis ranks domain-like " +
      "text negative") {
    import graft.operators.LanguageModel
    // model corpus: "a b" only -> c(a,b)=1, c_h(a)=1, V={a,b}=2
    val model = Seq((10L, "a b")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "a b"),  // attested: P = (1+1)/(1+2) = 2/3
      (2L, "a c"),  // unseen bigram, seen history: P = 1/(1+2) = 1/3
      (3L, "x y"))  // unseen history: P = 1/(0+2) = 1/2
      .toDF("doc_id", "text")
    val got = LanguageModel.scoreDocsAgainst(cands, model,
      "doc_id", "text").orderBy("doc_id").collect()
    got(0).getDouble(2) shouldBe -math.log(2.0 / 3.0) +- 1e-12
    got(1).getDouble(2) shouldBe -math.log(1.0 / 3.0) +- 1e-12
    got(2).getDouble(2) shouldBe -math.log(1.0 / 2.0) +- 1e-12
    // Moore-Lewis: candidates that read like the in-domain corpus
    // score negative (H_in < H_gen), off-domain positive. The
    // in-domain vocab must be comparable to the general one — a tiny
    // V_in inflates the 1/V unseen floor and makes EVERYTHING look
    // domain-like (the standard Moore-Lewis caveat, demonstrated by
    // this fixture's sizing)
    val inDomain = Seq((20L,
      "alpha beta gamma delta epsilon zeta eta theta alpha beta"))
      .toDF("doc_id", "text")
    val general = Seq((30L, "x y x z"), (31L, "p q"))
      .toDF("doc_id", "text")
    val ml = LanguageModel.mooreLewis(
      Seq((1L, "alpha beta"), (2L, "x y")).toDF("doc_id", "text"),
      inDomain, general, "doc_id", "text")
      .orderBy("doc_id").collect()
    ml(0).getDouble(2) should be < 0.0 // domain-like
    ml(1).getDouble(2) should be > 0.0 // general-like
  }

  test("LM scorer skips docs with fewer than two tokens") {
    import graft.operators.LanguageModel
    val docs = Seq((1L, "only"), (2L, ""), (3L, "two words"))
      .toDF("doc_id", "text")
    LanguageModel.scoreDocs(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(3L)
  }

  // --------------------------------------------------------- funnel

  test("quality funnel charges each doc to its first failing stage") {
    import graft.operators.QualityFunnel
    val repetitive = ("spam " * 40).trim            // fails Gopher rules
    val repetitiveWithPii = repetitive + " a@b.com" // repetition wins: first drop
    val clean = (1 to 40).map(i => s"tok$i").mkString(" ")
    val pii = clean + " reach me at someone@example.org"
    // shares its full 20-token prompt with the eval set (doc 6 below)
    val leaked = (1 to 20).map(i => s"ev$i").mkString(" ") + " trailing words here"
    val docs = Seq(
      (1L, repetitive), (2L, repetitiveWithPii), (3L, clean),
      (4L, pii), (5L, leaked),
      (6L, (1 to 20).map(i => s"ev$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val evalPrompts = docs.filter($"doc_id" === 6L)
      .select($"doc_id".as("eval_id"), $"text".as("eval_text"))
    val staged = QualityFunnel.stageDocs(docs, "doc_id", "text",
        evalPrompts, lmTau = Double.MaxValue) // lm stage off: tiny-corpus scores are all "noise"
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    staged.toSeq shouldBe Seq(
      (1L, "repetition"), (2L, "repetition"), (3L, "kept"),
      (4L, "pii"), (5L, "contaminated"), (6L, "contaminated"))
    // census is additive: stages partition the corpus
    val census = QualityFunnel.census(
      QualityFunnel.stageDocs(docs, "doc_id", "text", evalPrompts,
        lmTau = Double.MaxValue)).collect()
    census.map(_.getLong(1)).sum shouldBe 6L
  }

  test("quality funnel lm stage drops high-perplexity docs") {
    import graft.operators.QualityFunnel
    // boilerplate corpus + one doc of unique tokens: the unique doc has
    // the highest mean -log P; a threshold between the two separates them
    val boiler = (1 to 20).map(i => (i.toLong, "alpha beta gamma delta"))
    val odd = (21L, "zu qo xi ve")
    val docs = (boiler :+ odd).toDF("doc_id", "text")
    val evalPrompts = docs.filter($"doc_id" < 0)
      .select($"doc_id".as("eval_id"), $"text".as("eval_text"))
    val scores = graft.operators.LanguageModel
      .scoreDocs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val tau = (scores(1L) + scores(21L)) / 2
    val staged = QualityFunnel.stageDocs(docs, "doc_id", "text",
        evalPrompts, lmTau = tau)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    staged(21L) shouldBe "lm_noise"
    staged(1L) shouldBe "kept"
  }

  test("quality pass runs unchanged under Structured Streaming") {
    // map-only ops (repetition stats, PII mask) need no watermark or
    // state — the same Columns drive readStream, and the stream output
    // equals the batch output row-for-row
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "spam spam spam mail a@b.io now"),
      (2L, "a normal doc with no repeats or pii at all"))
    def pass(df: org.apache.spark.sql.DataFrame) = {
      val r = TA.repetitionStats(col("text"))
      df.select(col("doc_id"),
        r.getField("top_word_fraction").as("topf"),
        PiiRedaction.redact(col("text")).as("clean"))
    }
    val stream = MemoryStream[(Long, String)]
    val q = pass(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("quality_stream").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("quality_stream")
        .orderBy("doc_id").collect().toSeq
      val want = pass(rows.toDF("doc_id", "text"))
        .orderBy("doc_id").collect().toSeq
      got shouldBe want
      got.head.getString(2) should include ("<EMAIL>")
    } finally q.stop()
  }

  test("decontamination: short-doc whole-text rule") {
    // both sides under 13 tokens -> whole normalized text is the shingle;
    // exact (normalized) equality is the only way to match
    val corpus = Seq((1L, "Hello  WORLD"), (2L, "another doc"))
      .toDF("doc_id", "text")
    val eval = Seq((7L, "hello world")).toDF("eval_id", "eval_text")
    val out = Decontamination.contaminatedDocs(
      corpus, "doc_id", "text", eval, "eval_id", "eval_text", n = 13)
      .collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("winnowing expression equals the composed hashes+select form") {
    import graft.functions.{TextAnalysis => TA}
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "αβγδε ζη θικ multibyte text"), // code-point offsets
      (3L, "abcdef"), // m=2 < w -> single overall minimum
      (4L, "abc"), // < k -> empty
      (5L, "aaaaaaaaaa") // repeated grams -> dedup
    ).toDF("doc_id", "text")
    val composed = d
      .select(col("doc_id"), TA.winnowingHashes(col("text"), 5).as("h"))
      .localCheckpoint(eager = true)
      .select(col("doc_id"), TA.winnowingSelect(col("h"), 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expr = d
      .select(col("doc_id"),
        TA.winnowingFingerprints(col("text"), 5, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    expr shouldBe composed
    expr(4L) shouldBe Seq.empty
    expr(3L).length shouldBe 1
    expr(5L).length shouldBe 1
  }

  test("DSIR: target-like docs outscore off-target docs") {
    import graft.operators.ImportanceScoring
    // target dialect says "alpha beta", off-target says "zeta yota";
    // a fresh raw doc written in the target dialect must score above
    // one written in the off-target dialect
    val docs = (
      (1L to 10L).map(i => (i, "alpha beta alpha beta alpha", true)) ++
      (11L to 20L).map(i => (i, "zeta yota zeta yota zeta", false)) ++
      Seq((100L, "alpha beta alpha beta", false),
          (101L, "zeta yota zeta yota", false))
    ).toDF("doc_id", "text", "is_t")
    val s = ImportanceScoring
      .dsirScores(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    s(100L) should be > s(101L)
    s(100L) should be > 0.0 // target-like: p_t > p_r on its bigrams
    s(101L) should be < 0.0
  }

  test("DSIR: selectTopK keeps the k best with id tiebreak") {
    import graft.operators.ImportanceScoring
    val docs = (
      (1L to 5L).map(i => (i, "alpha beta alpha", true)) ++
      Seq((10L, "alpha beta alpha", false), // ties doc 11 exactly
          (11L, "alpha beta alpha", false),
          (12L, "zeta yota zeta", false))
    ).toDF("doc_id", "text", "is_t")
    val scores = ImportanceScoring
      .dsirScores(docs, "doc_id", "text", col("is_t"))
    val top = ImportanceScoring.selectTopK(
        scores.filter(col("doc_id") >= 10L), 2)
      .collect().map(_.getLong(0)).toSeq
    top shouldBe Seq(10L, 11L) // equal scores -> smaller id first
  }

  test("scriptMix: dominant script precedence and mixed flag") {
    import graft.functions.{TextAnalysis => TA}
    def mix(t: String) = Seq(t).toDF("text")
      .select(TA.scriptMix(col("text")).as("g")).select("g.*").collect()(0)
    val cjk = mix("中文文本")
    cjk.getString(4) shouldBe "cjk"
    cjk.getBoolean(5) shouldBe false
    val contaminated = mix("hello мир widely привет друг")
    contaminated.getLong(0) shouldBe 11L // latin chars
    contaminated.getLong(2) shouldBe 13L // cyrillic chars
    contaminated.getString(4) shouldBe "cyrillic" // rarer script wins tie-free
    contaminated.getBoolean(5) shouldBe true
    // accented chars are NOT latin; é counts once in accented only
    val fr = mix("café")
    fr.getLong(0) shouldBe 3L
    fr.getLong(3) shouldBe 1L
    fr.getString(4) shouldBe "latin"
    mix("12345 !!!").getString(4) shouldBe "none"
  }

  test("stripHtml: script blocks vanish wholesale, entities decode") {
    import graft.functions.{TextAnalysis => TA}
    def strip(t: String) = Seq(t).toDF("text")
      .select(TA.stripHtml(col("text"))).collect()(0).getString(0)
    strip("<p>Tom &amp; Jerry &lt;3</p>") shouldBe "Tom & Jerry <3"
    // the classic leak: tag-stripping alone would keep 'var x = 1;'
    strip("<h1>Title</h1><script>var x = 1;</script><p>Body</p>") shouldBe
      "Title Body"
    strip("<style>.a { color: red }</style>ok") shouldBe "ok"
    // multiline script block ((?s) flag), attributes on the tag
    strip("a<script type=\"x\">\nline1\nline2\n</script>b") shouldBe "a b"
    strip("A&nbsp;B&#39;C&quot;D") shouldBe "A B'C\"D"
    strip("") shouldBe ""
  }

  test("c4Quality: hand-computed line and page rules") {
    import graft.functions.{TextAnalysis => TA}
    val page = Seq(
      "The quick brown fox jumps over the lazy dog.", // kept, 1 sentence
      "Short line.",                     // < 5 words -> dropped
      "no terminal punctuation here at all", // no punct -> dropped
      "Enable JavaScript to view this content.", // javascript -> dropped
      "Is this a question? Yes! It ends well.",  // kept, 3 sentences
      "Another perfectly fine sentence right here."  // kept, 1 sentence
    ).mkString("\n")
    val r = Seq(page).toDF("text")
      .select(TA.c4Quality(col("text")).as("g")).select("g.*").collect()(0)
    r.getLong(0) shouldBe 6L   // n_lines
    r.getLong(1) shouldBe 3L   // n_kept
    r.getLong(2) shouldBe (9L + 8L + 6L) // kept_words
    r.getLong(3) shouldBe 5L   // n_sentences: 1 + 3 + 1
    r.getBoolean(4) shouldBe false // lorem
    r.getBoolean(5) shouldBe false // brace
    r.getBoolean(6) shouldBe true  // >= 3 sentences, clean page
    // page verdicts: lorem ipsum / curly brace / too few sentences
    val lorem = Seq("Lorem Ipsum dolor sit amet friend.\nMore good text here today.")
      .toDF("text").select(TA.c4Quality(col("text")).as("g"))
      .select("g.has_lorem", "g.keep").collect()(0)
    lorem.getBoolean(0) shouldBe true
    lorem.getBoolean(1) shouldBe false
    val brace = Seq("A fine sentence with words. Then code { here }.")
      .toDF("text").select(TA.c4Quality(col("text")).as("g"))
      .select("g.has_brace", "g.keep").collect()(0)
    brace.getBoolean(0) shouldBe true
    brace.getBoolean(1) shouldBe false
    // empty/null text: zero counts, not-kept, no NULL leakage
    val empty = Seq("").toDF("text")
      .select(TA.c4Quality(col("text")).as("g")).select("g.*").collect()(0)
    empty.getLong(0) shouldBe 0L
    empty.getLong(3) shouldBe 0L
    empty.getBoolean(6) shouldBe false
  }

  test("gopherQuality codegen'd expression is field-for-field " +
      "equivalent to the composed reference (ratios bit-identical)") {
    import graft.functions.{TextAnalysis => TA}
    val edges = Seq(
      "- bullet line\n* another\nplain text line here",
      "trailing dots...\nand an ellipsis …  \nnormal",
      "# symbols ### and ...... dots",
      "\tTab-led words make the split artifact",
      "the of and a in is it you that he was for on are",
      "àçcéntéd wörds with nö ascii letters ùü",
      "😀𝒜 supplementary code points count once each",
      "word\n\n\nword\n", "", "   ", null,
      (1 to 80).map(i => s"steady word$i the").mkString(" "))
    val df = edges.toDF("text")
    val a = df.select(TA.gopherQuality(col("text")).as("g"))
      .select("g.*").collect().map(_.toSeq)
    val b = df.select(TA.gopherQualityComposed(col("text")).as("g"))
      .select("g.*").collect().map(_.toSeq)
    a.toSeq shouldBe b.toSeq
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val ga = docs.select(col("doc_id"),
        TA.gopherQuality(col("text")).as("g"))
      .orderBy("doc_id").select("g.*").collect().map(_.toSeq)
    val gb = docs.select(col("doc_id"),
        TA.gopherQualityComposed(col("text")).as("g"))
      .orderBy("doc_id").select("g.*").collect().map(_.toSeq)
    ga.toSeq shouldBe gb.toSeq
  }

  test("c4Quality codegen'd expression is field-for-field equivalent " +
      "to the composed reference on edge inputs and real corpus text") {
    import graft.functions.{TextAnalysis => TA}
    val edges = Seq(
      "Plain sentence with enough words here.",
      "\tTab-led line with many words inside.", // split's leading-empty
      "Carriage return tail with words here.\r", // $ before \r
      "  spaces   around  many   words  here. ", // space-only trim
      "Ends with a quote and five words\"",
      "JAVASCRIPT required to read this page.", // case-folded drop
      "Multi. Dots! And? Questions. Here too.",
      "lorem ipsum in the body of text.",
      "brace { in a perfectly good sentence.",
      "word", "", "   ", "\n\n\n",
      "Ünïcödé wörds with àccents count fine tóó.",
      (1 to 40).map(i => s"Generated sentence number $i is long enough.")
        .mkString("\n"),
      null)
    val df = edges.toDF("text")
    val a = df.select(TA.c4Quality(col("text")).as("g"))
      .select("g.*").collect().map(_.toSeq)
    val b = df.select(TA.c4QualityComposed(col("text")).as("g"))
      .select("g.*").collect().map(_.toSeq)
    a.toSeq shouldBe b.toSeq
    // real corpus text at sf0.001: every field identical
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val ga = docs.select(col("doc_id"), TA.c4Quality(col("text")).as("g"))
      .orderBy("doc_id").select("g.*").collect().map(_.toSeq)
    val gb = docs.select(col("doc_id"),
        TA.c4QualityComposed(col("text")).as("g"))
      .orderBy("doc_id").select("g.*").collect().map(_.toSeq)
    ga.toSeq shouldBe gb.toSeq
  }

  test("mojibakeStats counts each damage signature and flags any hit") {
    val rows = Seq(
      "clean text",
      "cafÃ© broken",      // 'Ã©' -> one Ã head
      "bad �� bytes",       // two replacement chars
      "he said â€œhiâ€") // â€œ + â€<9d>
      .toDF("text")
    val got = rows.select(TA.mojibakeStats(col("text")).as("g"))
      .select("g.*")
      .as[(Long, Long, Long, Boolean)].collect()
    got(0) shouldBe ((0L, 0L, 0L, false))
    got(1) shouldBe ((0L, 1L, 0L, true))
    got(2) shouldBe ((2L, 0L, 0L, true))
    got(3) shouldBe ((0L, 0L, 2L, true))
  }

  test("luhnValid: canonical 79927398713 valid, neighbor invalid") {
    import graft.functions.{TextAnalysis => T}
    val got = Seq("79927398713", "79927398714").toDF("s")
      .select(col("s"), T.luhnValid(col("s")).as("v"))
      .orderBy("s").collect()
    got.map(r => (r.getString(0), r.getBoolean(1))).toSeq shouldBe
      Seq(("79927398713", true), ("79927398714", false))
  }

  test("ibanMod97: ISO examples valid, mutation invalid, junk NULL") {
    import graft.functions.{TextAnalysis => T}
    val got = Seq(
      "DE89370400440532013000", // ISO example
      "GB82WEST12345698765432", // letters in the BBAN too
      "DE89370400440532013001", // last digit mutated
      "DE89x70400440532013000") // non-alnum char -> NULL
      .toDF("iban")
      .select(col("iban"), T.ibanMod97(col("iban")).as("m"),
        T.ibanValid(col("iban")).as("v"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    got("DE89370400440532013000") shouldBe Some(1)
    got("GB82WEST12345698765432") shouldBe Some(1)
    got("DE89370400440532013001") should not be Some(1)
    got("DE89x70400440532013000") shouldBe None // lowercase poisons
  }
}
