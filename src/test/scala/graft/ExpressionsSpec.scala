package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftExtensions
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Custom Catalyst expression + SQL function registration. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("SimHash32Expression matches the Column-composition form") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c", "", "single",
      "the quick brown fox jumps over the lazy cat").toDF("text")
    val toks = TextAnalysis.tokens(col("text"))
    val rows = docs.select(
      Dedup.simhash32(toks).as("fast"),
      Dedup.simhash32Composed(toks).as("composed")).collect()
    rows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
    // empty text -> 0
    docs.filter(col("text") === "")
      .select(Dedup.simhash32(toks)).head().getLong(0) shouldBe 0L
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // non-foldable input (a literal array constant-folds the whole node —
    // ConstantFolding can evaluate SimHash32Expression, which is itself a
    // useful property) over a codegen'd scan
    val df = spark.range(1)
      .select(Dedup.simhash32(
        split(concat(lit("a b c "), col("id").cast("string")), " ")).as("sh"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' marks operators fused into a WholeStageCodegen stage
    plan should include ("*(1) Project")
    plan should include ("graft_simhash32")
    // and evaluation under codegen equals interpreted eval
    df.head().getLong(0) should not be 0L
  }

  test("functions are SQL-callable after registration") {
    GraftExtensions.register(spark)
    Seq(("x y z", 1.5, 2.5)).toDF("text", "lon", "lat")
      .createOrReplaceTempView("ext_t")
    val r = spark.sql(
      """SELECT graft_simhash32(split(text, ' ')) AS sh,
        |  graft_fingerprint(text) AS fp,
        |  st_x(st_point(lon, lat)) AS x,
        |  st_y(st_point(lon, lat)) AS y,
        |  st_astext(st_point(lon, lat)) AS wkt
        |FROM ext_t""".stripMargin).head()
    r.getLong(0) should not be 0L
    r.getString(1) should have length 16
    r.getDouble(2) shouldBe 1.5
    r.getDouble(3) shouldBe 2.5
    r.getString(4) shouldBe "POINT(1.5 2.5)"
  }

  test("graft_token_lcs and graft_int_dot are SQL-callable and " +
      "codegen-evaluate correctly") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_token_lcs(array('the', 'cat', 'sat'),
        |                  array('cat', 'the', 'sat')) AS lcs,
        |  graft_int_dot(array(1, -2, 3), array(4, 5, 6)) AS dot,
        |  graft_int_dot(array(1, 2), array(1, 2, 3)) AS mismatch
        |""".stripMargin).head()
    r.getInt(0) shouldBe 2
    r.getLong(1) shouldBe (4L - 10L + 18L)
    r.isNullAt(2) shouldBe true
  }

  test("graft_hamming_lcs: tolerance widens the match predicate to " +
      "popcount(xor) <= k; k = 0 replays exact equality; null tokens " +
      "never match") {
    GraftExtensions.register(spark)
    // tokens: 5 and 7 differ by 1 bit; 5 and 255 by 6 bits
    val r = spark.sql(
      """SELECT
        |  graft_hamming_lcs(array(5L, 9L), array(7L, 9L), 0) AS exact,
        |  graft_hamming_lcs(array(5L, 9L), array(7L, 9L), 1) AS tol1,
        |  graft_hamming_lcs(array(5L, 255L), array(5L, 5L), 5) AS tol5,
        |  graft_hamming_lcs(array(5L, 255L), array(5L, 5L), 6) AS tol6,
        |  graft_hamming_lcs(array(CAST(NULL AS BIGINT)),
        |                    array(CAST(NULL AS BIGINT)), 64) AS nulls,
        |  graft_hamming_lcs(array(), array(1L), 64) AS empty
        |""".stripMargin).head()
    r.getInt(0) shouldBe 1 // only the 9s match exactly
    r.getInt(1) shouldBe 2 // 5~7 within 1 bit
    r.getInt(2) shouldBe 1 // 255 vs 5: 6 bits — outside k=5
    r.getInt(3) shouldBe 2 // ...inside k=6
    r.getInt(4) shouldBe 0 // null tokens never match at any k
    r.getInt(5) shouldBe 0
    // out-of-range tolerance fails loudly
    an[Exception] should be thrownBy spark.sql(
      "SELECT graft_hamming_lcs(array(1L), array(1L), 65)").head()
    // order sensitivity is preserved (it IS an LCS, not a bag match)
    spark.sql("SELECT graft_hamming_lcs(array(1L, 2L, 4L), " +
      "array(4L, 1L, 2L), 0) AS v").head().getInt(0) shouldBe 2
  }

  test("graft_c4_quality and graft_gopher_quality are SQL-callable " +
      "with NULL-safe coalescing") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_c4_quality(
        |    'One good sentence with plenty words here.\nTwo more fine
        |     sentences follow this one. And a third one lands here.'
        |  ).keep AS c4_keep,
        |  graft_gopher_quality(CAST(NULL AS STRING)).n_words AS gw,
        |  graft_c4_quality(CAST(NULL AS STRING)).n_lines AS cl
        |""".stripMargin).head()
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 0L
  }

  test("st_transform is SQL-callable across the SRID matrix") {
    GraftExtensions.register(spark)
    Seq((-73.5, 40.5)).toDF("lon", "lat").createOrReplaceTempView("ext_geo")
    val r = spark.sql(
      """SELECT
        |  st_x(st_transform(st_point(lon, lat), 32618)) AS utm_x,
        |  st_x(st_transform(st_transform(st_point(lon, lat), 32618),
        |       4326)) AS back_x,
        |  st_y(st_transform(st_point(lon, lat), 3857)) AS merc_y,
        |  st_transform(st_point(lon, lat), 27700) AS unknown
        |FROM ext_geo""".stripMargin).head()
    r.getDouble(0) shouldBe 627103.0873 +- 0.005 // Redfearn cross-check
    r.getDouble(1) shouldBe -73.5 +- 1e-7
    r.getDouble(2) shouldBe 4938869.18 +- 0.01 // ln(tan(65.25 deg)) * R
    r.isNullAt(3) shouldBe true
  }

  test("graft_kmv_distinct is SQL-callable and matches the operator form") {
    GraftExtensions.register(spark)
    import graft.operators.Sketches
    (1 to 500).map(i => (i % 2, i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("ext_kmv")
    val sql = spark.sql(
      """SELECT g, graft_kmv_distinct(v, 64) AS e FROM ext_kmv GROUP BY g
        |ORDER BY g""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val df = spark.table("ext_kmv").groupBy(col("g"))
      .agg(Sketches.kmvDistinct(col("v"), 64).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    sql shouldBe df
    // 250 distinct per group, k=64 -> sketch estimate within ~20%
    sql(0) shouldBe 250.0 +- 50.0
    sql(1) shouldBe 250.0 +- 50.0
  }

  test("graft_hll is SQL-callable and matches the operator form") {
    GraftExtensions.register(spark)
    import graft.operators.Sketches
    (1 to 4000).map(i => (i % 2, i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("ext_hll")
    val sql = spark.sql(
      """SELECT g, graft_hll(v, 8) AS e FROM ext_hll GROUP BY g
        |ORDER BY g""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val df = spark.table("ext_hll").groupBy(col("g"))
      .agg(Sketches.hllDistinct(col("v"), 8).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    sql shouldBe df
    // 2000 distinct per group, m=256 -> ~6.5% expected error; 20% margin
    sql(0) shouldBe 2000.0 +- 400.0
    sql(1) shouldBe 2000.0 +- 400.0
  }

  test("graft_cms is SQL-callable and matches the operator form") {
    GraftExtensions.register(spark)
    import graft.operators.Sketches
    (1 to 300).map(i => (i % 2, (i % 23).toLong)).toDF("g", "v")
      .createOrReplaceTempView("ext_cms")
    val sql = spark.sql(
      """SELECT g, graft_cms(v, 3, 64) AS sk FROM ext_cms GROUP BY g
        |ORDER BY g""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val df = spark.table("ext_cms").groupBy(col("g"))
      .agg(Sketches.cmsSketch(col("v"), 3, 64).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    sql shouldBe df // bit-identical counter matrices
    sql(0).sum shouldBe 3L * 150
  }

  test("graft_zorder is SQL-callable and matches the operator form") {
    GraftExtensions.register(spark)
    Seq((3L, 5L), (0L, 0L), (1023L, 511L)).toDF("x", "y")
      .createOrReplaceTempView("ext_z")
    val sql = spark.sql(
      "SELECT graft_zorder(x, y, 10) AS z FROM ext_z ORDER BY z")
      .collect().map(_.getLong(0)).toSeq
    val df = spark.table("ext_z")
      .select(graft.operators.Layout.zkey(col("x"), col("y"), 10).as("z"))
      .orderBy(col("z")).collect().map(_.getLong(0)).toSeq
    sql shouldBe df
    sql should contain(39L) // z(3,5) hand-computed
  }

  test("CharShinglesExpression matches the composed form") {
    val texts = Seq("The  Quick Brown fox", "ab", "abcd", "abcde",
      " spaced   out  text ", "").toDF("text")
    val rows = texts.select(
      TextAnalysis.charShingles(col("text"), 4).as("fast"),
      TextAnalysis.charShinglesComposed(col("text"), 4).as("composed"))
      .collect()
    rows.foreach { r =>
      r.getSeq[String](0).sorted shouldBe r.getSeq[String](1).sorted
    }
  }

  test("WordShinglesExpression matches the composed form") {
    val texts = Seq("The  Quick Brown fox jumps over dogs", "one two", "",
      "a b c d e f g", "single").toDF("text")
    val rows = texts.select(
      TextAnalysis.wordShingles(col("text"), 3).as("fast"),
      TextAnalysis.wordShinglesComposed(col("text"), 3).as("composed"))
      .collect()
    rows.foreach { r =>
      r.getSeq[String](0).sorted shouldBe r.getSeq[String](1).sorted
    }
    // windows are real word 3-grams
    texts.filter(col("text") === "a b c d e f g")
      .select(TextAnalysis.wordShingles(col("text"), 3)).head()
      .getSeq[String](0) should contain ("c d e")
  }

  test("MinHashBandsExpression matches the composed band keys") {
    val texts = Seq("the quick brown fox jumps", "abcdefgh", "xy")
      .toDF("text")
    val sh = TextAnalysis.charShingles(col("text"), 4)
    val fast = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.MinHashBandsExpression(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(sh), 4, 4))
    val rows = texts.select(fast.as("fast"),
      Dedup.lshBandKeysFromShingles(sh, 4, 4).as("composed")).collect()
    rows.foreach { r =>
      r.getSeq[String](0) shouldBe r.getSeq[String](1)
    }
  }

  test("SortedIntersectSize equals array_intersect size on shingles") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val pairs = Seq(
      ("the quick brown fox", "the quick brown cat"),
      ("abcdefg", "xyz"), ("same", "same"), ("", "x")).toDF("a", "b")
    val sa = TextAnalysis.charShingles(col("a"), 4)
    val sb = TextAnalysis.charShingles(col("b"), 4)
    val fast = ColumnBridge.column(
      graft.expressions.SortedIntersectSizeExpression(
        ColumnBridge.expression(sa), ColumnBridge.expression(sb)))
    val rows = pairs.select(fast.as("fast"),
      org.apache.spark.sql.functions.size(array_intersect(sa, sb)).as("ref"))
      .collect()
    rows.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("CosineSimilarityExpression matches the composed form") {
    val pairs = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),          // zero norm -> 0.0
      (Seq(-1.5, 2.5, 0.25), Seq(3.125, -0.5, 7.0)),
      (Seq(1e-300, 1e300), Seq(1e300, 1e-300))).toDF("a", "b")
    val rows = pairs.select(
      Dedup.cosine(col("a"), col("b")).as("fast"),
      Dedup.cosineComposed(col("a"), col("b")).as("composed")).collect()
    // bit-exact: same in-order summation
    rows.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("CosineSimilarityExpression: length mismatch -> null") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    df.select(Dedup.cosine(col("a"), col("b"))).head().isNullAt(0) shouldBe true
  }

  test("hashed-long shingle intersect equals string-shingle intersect") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val pairs = Seq(
      ("the quick brown fox", "the quick brown cat"),
      ("abcdefg", "xyz"), ("same", "same"), ("", "x"),
      ("lorem ipsum dolor sit amet", "ipsum dolor sit")).toDF("a", "b")
    val sa = TextAnalysis.charShingles(col("a"), 4)
    val sb = TextAnalysis.charShingles(col("b"), 4)
    def hashed(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      graft.expressions.HashedShinglesExpression(ColumnBridge.expression(c)))
    val fast = ColumnBridge.column(
      graft.expressions.SortedLongIntersectSizeExpression(
        ColumnBridge.expression(hashed(sa)), ColumnBridge.expression(hashed(sb))))
    val rows = pairs.select(fast.as("fast"),
      org.apache.spark.sql.functions.size(array_intersect(sa, sb)).as("ref"))
      .collect()
    rows.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("SQL graft_cosine / graft_char_shingles equal the DataFrame forms") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), "The  Quick brown"))
      .toDF("a", "b", "text").createOrReplaceTempView("ext_t3")
    val r = spark.sql(
      """SELECT graft_cosine(a, b) AS cos,
        |  graft_char_shingles(text, 4) AS sh FROM ext_t3""".stripMargin).head()
    val ref = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), "The  Quick brown"))
      .toDF("a", "b", "text")
      .select(Dedup.cosine(col("a"), col("b")),
        TextAnalysis.charShingles(col("text"), 4)).head()
    r.getDouble(0) shouldBe ref.getDouble(0)
    r.getSeq[String](1) shouldBe ref.getSeq[String](1)
  }

  test("SQL simhash equals DataFrame simhash") {
    GraftExtensions.register(spark)
    Seq("alpha beta gamma").toDF("text").createOrReplaceTempView("ext_t2")
    val sqlV = spark.sql(
      "SELECT graft_simhash32(split(text, ' ')) FROM ext_t2").head().getLong(0)
    val dfV = Seq("alpha beta gamma").toDF("text")
      .select(Dedup.simhash32(split(col("text"), " "))).head().getLong(0)
    sqlV shouldBe dfV
  }

  test("damerauLevenshtein: reference distances and DL-specific cases") {
    import graft.expressions.EditDistanceUtil.damerauStr
    // classic published cases
    damerauStr("kitten", "sitting") shouldBe 3 // no transposition help
    damerauStr("ca", "abc") shouldBe 2 // UNRESTRICTED: swap then insert
    damerauStr("abcd", "acbd") shouldBe 1 // adjacent swap
    damerauStr("ab", "ba") shouldBe 1
    damerauStr("", "abc") shouldBe 3
    damerauStr("abc", "") shouldBe 3
    damerauStr("same", "same") shouldBe 0
    damerauStr("martha", "marhta") shouldBe 1
    // dl <= lev always; dl >= |len diff|
    val words = Seq("alpha", "alpah", "beta", "betta", "gamma", "magam")
    for (a <- words; b <- words) {
      val dl = damerauStr(a, b)
      dl should be <= levRef(a, b)
      dl should be >= math.abs(a.length - b.length)
    }
  }

  test("damerauLevenshtein column matches the row-eval path") {
    val df = Seq(("ca", "abc"), ("abcd", "acbd"), ("x", "")).toDF("a", "b")
    df.select(graft.functions.TextAnalysis
        .damerauLevenshtein(col("a"), col("b")))
      .as[Int].collect().toSeq shouldBe Seq(2, 1, 1)
  }

  test("jaro/jaroWinkler: DuckDB-probed corners") {
    import graft.expressions.JaroWinklerUtil._
    def j(a: String, b: String) = jaroStr(a, b)
    def jw(a: String, b: String) =
      jaroWinkler(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // classics (values = DuckDB 1.0 bit-for-bit)
    j("martha", "marhta") shouldBe 0.9444444444444445
    jw("martha", "marhta") shouldBe 0.9611111111111111
    j("dixon", "dicksonx") shouldBe 0.7666666666666666
    jw("dixon", "dicksonx") shouldBe 0.8133333333333332
    jw("sup", "sip") shouldBe 0.7999999999999999
    // window clamp: no match within max(3,3)/2-1 = 0
    j("abc", "bca") shouldBe 0.0
    // odd mismatch count -> INTEGER transposition halving (3/2 = 1)
    j("abcxyz", "bcaxyz") shouldBe 0.9444444444444445
    // boost gate: jaro <= 0.7 keeps prefix unboosted
    jw("abcdefgh", "abxxxxxx") shouldBe 0.5
    // prefix cap at 4
    val base = j("abcdefgh", "abcdefxy")
    jw("abcdefgh", "abcdefxy") shouldBe base + 4 * 0.1 * (1.0 - base)
    // empties
    j("", "") shouldBe 0.0
    j("a", "") shouldBe 0.0
    jw("same", "same") shouldBe 1.0
    // codegen path through the Column wrapper
    val df = Seq(("martha", "marhta")).toDF("a", "b")
    df.select(graft.functions.TextAnalysis.jaroWinkler(col("a"), col("b")))
      .as[Double].head() shouldBe 0.9611111111111111
  }

  test("jaccardSorted equals the hash-set jaccard on sorted inputs") {
    import graft.operators.Dedup
    val df = Seq(
      ("a b c d", "c d e f"), // overlap 2, union 6
      ("x", "x"), // identical
      ("a b", "c d"), // disjoint
      ("hello world foo", "foo bar hello baz qux")).toDF("t1", "t2")
    val sh1 = array_sort(graft.functions.TextAnalysis
      .charShingles(col("t1"), 4))
    val sh2 = array_sort(graft.functions.TextAnalysis
      .charShingles(col("t2"), 4))
    val got = df.select(Dedup.jaccardSorted(sh1, sh2).as("a"),
      Dedup.jaccard(sh1, sh2).as("b")).collect()
    got.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("MinHashSignatureExpression matches an independent re-derivation") {
    import graft.expressions.MinHashScheme
    import graft.operators.Dedup
    val texts = Seq("abcd", "hello world near dup text")
    val df = texts.toDF("t")
    val got = df.select(
        Dedup.minhashSignature(
          graft.functions.TextAnalysis.charShingles(col("t"), 4), 16))
      .as[Seq[Long]].collect()
    def ref(t: String): Seq[Long] = {
      val norm = t.trim.toLowerCase.replaceAll("\\s+", " ")
      val sh =
        if (norm.length <= 4) Seq(norm)
        else (0 to norm.length - 4).map(i => norm.substring(i, i + 4))
          .distinct
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 16).map { i =>
        sh.map { s =>
          val d = md.digest(s.getBytes("UTF-8")); md.reset()
          val h1 = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x7fffffffL
          val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) & 0x7fffffffL
          ((MinHashScheme.a(i) * h1) % MinHashScheme.P +
            (MinHashScheme.b(i) * h2) % MinHashScheme.P +
            MinHashScheme.c(i)) % MinHashScheme.P
        }.min
      }
    }
    got(0).toSeq shouldBe ref(texts(0))
    got(1).toSeq shouldBe ref(texts(1))
  }

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
