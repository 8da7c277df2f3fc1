package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GreaterThanOrEqual, If, IsNull, Literal, Or}

/** SQL-surface registration: exposes the engine's functions to
  * `spark.sql(...)` callers via SparkSessionExtensions
  * (`.withExtensions(new GraftExtensions)`) or post-hoc on a live
  * session (`GraftExtensions.register(spark)`).
  *
  * Functions:
  *   graft_simhash32(array<string>) -> bigint   (custom codegen'd node)
  *   graft_cosine(a, b)             -> double   (custom codegen'd node)
  *   graft_int_dot(a, b)            -> bigint   (exact int8 dot, codegen'd)
  *   graft_token_lcs(a, b)          -> int      (LCS of token arrays, codegen'd)
  *   graft_char_shingles(text, n)   -> array    (custom codegen'd node)
  *   graft_word_shingles(text, n)   -> array    (custom codegen'd node)
  *   graft_fingerprint(string)      -> string   (composed built-ins)
  *   graft_kmv_distinct(x[, k])     -> double   (KMV sketch aggregate)
  *   graft_hll(x[, p])              -> double   (HyperLogLog aggregate)
  *   graft_cms(x[, d, w])           -> array    (count-min sketch aggregate)
  *   graft_tdigest(x, q[, delta])   -> double   (t-digest quantile aggregate)
  *   graft_repetition_stats(text)   -> struct   (Gopher repetition rules)
  *   graft_c4_quality(text)         -> struct   (C4 line/page battery, codegen'd)
  *   graft_gopher_quality(text)     -> struct   (Gopher quality rules, codegen'd)
  *   graft_redact_pii(text)         -> string   (email/phone/IPv4 mask)
  *   graft_zorder(x, y[, bits])     -> bigint   (z-order clustering key)
  *   st_point(lon, lat)             -> struct   (composed built-ins)
  *   st_point_from_wkb_hex(hex[, srid]) -> struct (codegen'd WKB parse)
  *   st_x(geom) / st_y(geom)        -> double
  *   st_astext(geom)                -> string
  *   st_transform(geom, srid)       -> struct   (4326/3857/UTM 326xx-327xx)
  *
  * One optimizer rule is injected beyond reference parity (which needs
  * none, SURVEY.md §4): TopKHeapRewrite turns `row_number() <= k`
  * window filters into the bounded-heap aggregation — SQL users get
  * the scalable top-k plan without rewriting their queries.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.TopKHeapRewrite)
  }
}

object GraftExtensions {
  /** Builders return UnresolvedFunction trees over built-ins — the
    * analyzer resolves them like any SQL text would, so the same Catalyst
    * implementations back both the DataFrame and SQL surfaces. */
  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  private def lit(v: Any): Expression = Literal(v)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name) // usage text optional; class tag only

  /** st_point(lon, lat[, srid]) as a named struct; NULL if either
    * coordinate is NULL (GeomFunctions.stPoint semantics). */
  private def stPoint(exprs: Seq[Expression]): Expression = {
    val xd = fn("double", exprs(0))
    val yd = fn("double", exprs(1))
    val srid = if (exprs.length >= 3) fn("int", exprs(2)) else lit(4326)
    val struct = fn("named_struct",
      lit("x"), xd, lit("y"), yd, lit("srid"), fn("int", srid))
    If(Or(IsNull(xd), IsNull(yd)),
      fn("named_struct", lit("x"), fn("double", Literal(null)),
        lit("y"), fn("double", Literal(null)),
        lit("srid"), fn("int", Literal(null))),
      struct)
  }

  /** st_point_from_wkb_hex(hex[, srid]): decode a hex-WKB/EWKB point
    * into the geometry struct — EWKB's embedded SRID wins, plain WKB
    * adopts the optional default (4326 when omitted); NULL hex yields
    * the null-field struct (the st_point convention). */
  private def stPointFromWkbHex(exprs: Seq[Expression]): Expression = {
    val arr = WkbPointExpression(exprs.head)
    val defaultSrid =
      if (exprs.length >= 2) fn("double", exprs(1)) else lit(4326.0)
    val x = fn("element_at", arr, lit(1))
    val y = fn("element_at", arr, lit(2))
    val s = fn("element_at", arr, lit(3))
    val srid = fn("int",
      If(GreaterThanOrEqual(s, lit(0.0)), s, defaultSrid))
    If(IsNull(exprs.head),
      fn("named_struct", lit("x"), fn("double", Literal(null)),
        lit("y"), fn("double", Literal(null)),
        lit("srid"), fn("int", Literal(null))),
      fn("named_struct", lit("x"), x, lit("y"), y, lit("srid"), srid))
  }

  private def normalizeExpr(text: Expression): Expression =
    fn("regexp_replace", fn("lower", fn("trim", text)),
      lit("\\s+"), lit(" "))

  private def intLit(where: String, e: Expression): Int = e match {
    case Literal(n: Int, _) => n
    case other => throw new IllegalArgumentException(
      s"$where: n must be an integer literal, got $other")
  }

  /** SQL fractional literals parse as DecimalType — accept both. */
  private def doubleLit(where: String, e: Expression): Double = e match {
    case Literal(d: Double, _) => d
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(n: Int, _) => n.toDouble
    case other => throw new IllegalArgumentException(
      s"$where: q must be a numeric literal, got $other")
  }

  private def fingerprint(text: Expression): Expression =
    fn("substring",
      fn("md5", fn("regexp_replace",
        fn("lower", fn("trim", text)), lit("\\s+"), lit(" "))),
      lit(1), lit(16))

  private def redactPii(text: Expression): Expression = {
    import graft.functions.PiiRedaction
    fn("regexp_replace",
      fn("regexp_replace",
        fn("regexp_replace", text,
          lit(PiiRedaction.EmailPattern), lit("<EMAIL>")),
        lit(PiiRedaction.PhonePattern), lit("<PHONE>")),
      lit(PiiRedaction.Ipv4Pattern), lit("<IP>"))
  }

  private def wkt(g: Expression): Expression =
    If(IsNull(g), Literal(null, org.apache.spark.sql.types.StringType),
      fn("concat", lit("POINT("),
        fn("string", UnresolvedExtractValue(g, lit("x"))), lit(" "),
        fn("string", UnresolvedExtractValue(g, lit("y"))), lit(")")))

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash32", info("graft_simhash32", "simhash"),
      (exprs: Seq[Expression]) => SimHash32Expression(exprs.head)),
    ("graft_cosine", info("graft_cosine", "cosine similarity"),
      (exprs: Seq[Expression]) =>
        CosineSimilarityExpression(exprs(0), exprs(1))),
    ("graft_int_dot", info("graft_int_dot", "exact int8 dot product"),
      (exprs: Seq[Expression]) =>
        IntDotExpression(exprs(0), exprs(1))),
    ("graft_c4_quality", info("graft_c4_quality", "C4 structural rules"),
      (exprs: Seq[Expression]) =>
        C4QualityExpression(fn("coalesce", exprs.head, lit("")))),
    ("graft_gopher_quality", info("graft_gopher_quality",
        "Gopher quality rules"),
      (exprs: Seq[Expression]) =>
        GopherQualityExpression(fn("coalesce", exprs.head, lit("")))),
    ("graft_token_lcs", info("graft_token_lcs",
        "longest common token subsequence"),
      (exprs: Seq[Expression]) =>
        TokenLcsExpression(exprs(0), exprs(1))),
    ("graft_hamming_lcs", info("graft_hamming_lcs",
        "hamming-tolerant LCS over 64-bit fingerprint arrays"),
      (exprs: Seq[Expression]) => HammingLcsExpression(
        exprs(0), exprs(1), intLit("graft_hamming_lcs", exprs(2)))),
    ("graft_char_shingles", info("graft_char_shingles", "char n-grams"),
      (exprs: Seq[Expression]) => CharShinglesExpression(
        normalizeExpr(exprs.head), intLit("graft_char_shingles", exprs(1)))),
    ("graft_word_shingles", info("graft_word_shingles", "word n-grams"),
      (exprs: Seq[Expression]) => WordShinglesExpression(
        normalizeExpr(exprs.head), intLit("graft_word_shingles", exprs(1)))),
    ("graft_fingerprint", info("graft_fingerprint", "fingerprint"),
      (exprs: Seq[Expression]) => fingerprint(exprs.head)),
    ("graft_repetition_stats", info("graft_repetition_stats", "repetition quality"),
      (exprs: Seq[Expression]) =>
        RepetitionStatsExpression(normalizeExpr(exprs.head))),
    ("graft_redact_pii", info("graft_redact_pii", "pii mask"),
      (exprs: Seq[Expression]) => redactPii(exprs.head)),
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from a builder in an AggregateExpression automatically. The child
    // is md5-hashed to the KMV's 60-bit hash space in the builder, so
    // SQL callers pass the raw column: graft_kmv_distinct(x[, k]).
    ("graft_kmv_distinct", info("graft_kmv_distinct", "kmv distinct estimate"),
      (exprs: Seq[Expression]) => KmvDistinctEstimate(
        fn("bigint", fn("conv",
          fn("substring", fn("md5", fn("string", exprs.head)), lit(1), lit(15)),
          lit(16), lit(10))),
        if (exprs.length >= 2) intLit("graft_kmv_distinct", exprs(1)) else 256)),
    // aggregate: HyperLogLog distinct estimate — graft_hll(x[, p]) ->
    // double. Same md5-to-60-bit-hash builder convention as the KMV.
    ("graft_hll", info("graft_hll", "hyperloglog distinct estimate"),
      (exprs: Seq[Expression]) => HllDistinctEstimate(
        fn("bigint", fn("conv",
          fn("substring", fn("md5", fn("string", exprs.head)), lit(1), lit(15)),
          lit(16), lit(10))),
        if (exprs.length >= 2) intLit("graft_hll", exprs(1)) else 6)),
    // aggregate: count-min frequency sketch — graft_cms(x[, d, w]) ->
    // array<bigint> of d*w counters (row-major; probe with the min over
    // an item's d bucket positions). Bucket indices are md5-derived in
    // the builder so SQL callers pass the raw column, exactly like the
    // DataFrame surface (Sketches.cmsBuckets).
    ("graft_cms", info("graft_cms", "count-min frequency sketch"),
      (exprs: Seq[Expression]) => {
        val d = if (exprs.length >= 2) intLit("graft_cms", exprs(1)) else 4
        val w = if (exprs.length >= 3) intLit("graft_cms", exprs(2)) else 512
        val buckets =
          org.apache.spark.sql.catalyst.expressions.CreateArray(
            (0 until d).map { r =>
              fn("mod", fn("bigint", fn("conv",
                fn("substring", fn("md5",
                  fn("concat", lit(s"$r:"), fn("string", exprs.head))),
                  lit(1), lit(15)),
                lit(16), lit(10))), lit(w.toLong))
            })
        CountMinSketch(buckets, d, w)
      }),
    // aggregate: t-digest quantile estimate — graft_tdigest(x, q[, δ])
    // -> double. The quantile member of the sketch family; state is
    // ≤ ~2δ centroids per group per partition. An ESTIMATE (rank error
    // spec-bounded), so no oracle row — see TDigestQuantile scaladoc.
    ("graft_tdigest", info("graft_tdigest", "t-digest quantile estimate"),
      (exprs: Seq[Expression]) => TDigestQuantile(
        fn("double", exprs.head),
        doubleLit("graft_tdigest", exprs(1)),
        if (exprs.length >= 3) intLit("graft_tdigest", exprs(2)) else 100)),
    ("st_point", info("st_point", "point"),
      (exprs: Seq[Expression]) => stPoint(exprs)),
    ("st_point_from_wkb_hex", info("st_point_from_wkb_hex", "wkb decode"),
      (exprs: Seq[Expression]) => stPointFromWkbHex(exprs)),
    ("st_x", info("st_x", "x"),
      (exprs: Seq[Expression]) => UnresolvedExtractValue(exprs.head, lit("x"))),
    ("st_y", info("st_y", "y"),
      (exprs: Seq[Expression]) => UnresolvedExtractValue(exprs.head, lit("y"))),
    ("st_astext", info("st_astext", "wkt"),
      (exprs: Seq[Expression]) => wkt(exprs.head)),
    // st_transform(geom, target_srid): the full SRID matrix (4326 /
    // 3857 / UTM 326xx-327xx). Built from raw unresolved nodes — a
    // Column-bridge round-trip here leaves column-node wrappers the SQL
    // analyzer cannot extract fields from. All supported pairs route
    // through the single-node GeomPivotExpression (identity for
    // src == target inside the scalar).
    ("st_transform", info("st_transform", "reproject"),
      (exprs: Seq[Expression]) => stTransformSql(exprs(0), exprs(1))),
    // graft_zorder(x, y[, bits]): the z-order clustering key (see
    // operators/Layout) — SQL users can ORDER BY it before a write
    ("graft_zorder", info("graft_zorder", "z-order key"),
      (exprs: Seq[Expression]) => MortonInterleave(
        fn("bigint", exprs(0)), fn("bigint", exprs(1)),
        if (exprs.length >= 3) intLit("graft_zorder", exprs(2)) else 32)),
  )

  private def stTransformSql(g: Expression, targetRaw: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, CaseWhen, EqualTo,
      GreaterThanOrEqual, IsNull, LessThanOrEqual, Or}
    val t = fn("int", targetRaw)
    val s = fn("int", UnresolvedExtractValue(g, lit("srid")))
    def supported(e: Expression): Expression =
      Or(Or(EqualTo(e, lit(4326)), EqualTo(e, lit(3857))),
        Or(And(GreaterThanOrEqual(e, lit(32601)), LessThanOrEqual(e, lit(32660))),
          And(GreaterThanOrEqual(e, lit(32701)), LessThanOrEqual(e, lit(32760)))))
    val piv = GeomPivotExpression(
      fn("double", UnresolvedExtractValue(g, lit("x"))),
      fn("double", UnresolvedExtractValue(g, lit("y"))), s, t)
    val out = fn("named_struct",
      lit("x"), fn("element_at", piv, lit(1)),
      lit("y"), fn("element_at", piv, lit(2)),
      lit("srid"), t)
    CaseWhen(
      Seq(
        (IsNull(g), Literal(null)),
        // identity first, like the Column surface: src == target is a
        // no-op for ANY srid, supported or not
        (EqualTo(s, t), g),
        (And(supported(s), supported(t)), out)),
      Some(Literal(null)))
  }

  /** Register on an already-built session (tests, REPL). Functions go
    * into the function registry; the top-k rule via
    * experimental.extraOptimizations (idempotent). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TopKHeapRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TopKHeapRewrite
  }
}
