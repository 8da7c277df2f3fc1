package graft

import org.apache.spark.sql.functions._

/** The general SQL surface over registered tables (SURVEY §2C): CTEs
  * (S7), spark.sql over the catalog, and non-CSV storage formats
  * (parquet everywhere; JSON and ORC round-trips here). */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registered tables answer CTE queries (S7)") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """WITH big AS (
        |  SELECT o_custkey, sum(o_totalprice) AS spend
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, spend,
        |    row_number() OVER (ORDER BY spend DESC, o_custkey) AS rnk
        |  FROM big)
        |SELECT count(*) AS n FROM ranked WHERE rnk <= 10""".stripMargin)
      .head().getLong(0)
    r shouldBe 10L
  }

  test("json sink/source round-trip preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json")
    val src = Tables.load(spark, sf, "nation")
    src.write.mode("overwrite").json(dir.resolve("nation_json").toString)
    val back = spark.read.json(dir.resolve("nation_json").toString)
    back.count() shouldBe src.count()
    back.select(sum(col("n_nationkey"))).head().getLong(0) shouldBe
      src.select(sum(col("n_nationkey"))).head().getLong(0)
  }

  test("orc sink/source round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
    val src = Tables.load(spark, sf, "region")
    src.write.mode("overwrite").orc(dir.resolve("region_orc").toString)
    val back = spark.read.orc(dir.resolve("region_orc").toString)
    back.schema shouldBe src.schema
    back.count() shouldBe src.count()
  }

  test("csv sink round-trips an ingested table (symmetric T1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvout")
    val src = Tables.load(spark, sf, "region")
    src.write.mode("overwrite").option("header", "true")
      .csv(dir.resolve("region_csv").toString)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "false")
      .csv(dir.resolve("region_csv").toString)
    back.count() shouldBe src.count()
    back.columns.toSeq shouldBe src.columns.toSeq
  }

  test("df.stat battery: crosstab exact, freqItems guarantee, " +
      "approxQuantile bound, corr vs exact moments") {
    import spark.implicits._
    val df = (1 to 1000).map { i =>
      (if (i % 3 == 0) "a" else "b", if (i % 2 == 0) "x" else "y",
        i.toLong, (i * 2).toLong)
    }.toDF("g", "h", "u", "v")
    // crosstab: counts match a plain group-by
    val ct = df.stat.crosstab("g", "h").orderBy("g_h").collect()
    ct.map(r => (r.getString(0), r.getLong(1) + r.getLong(2))).toSeq shouldBe
      Seq(("a", 333L), ("b", 667L))
    // freqItems: any item with frequency > n/k MUST be returned
    val fi = df.stat.freqItems(Array("g"), 0.4).head()
      .getSeq[String](0)
    fi should contain("b") // 667/1000 > 0.4
    // approxQuantile at relativeError e: rank within e*n of exact
    val med = df.stat.approxQuantile("u", Array(0.5), 0.05).head
    med should (be >= 450.0 and be <= 550.0)
    // corr of an exactly linear pair is 1 (Pearson)
    df.stat.corr("u", "v") shouldBe 1.0 +- 1e-9
    df.stat.cov("u", "u") shouldBe
      df.stat.cov("u", "u") // deterministic on same plan
  }

  test("hash/encoding battery: known digests and round-trips") {
    import spark.implicits._
    val r = Seq("abc").toDF("s").select(
      md5(col("s")), sha2(col("s"), 256),
      base64(col("s").cast("binary")),
      decode(unhex(lower(hex(col("s")))), "UTF-8")).head()
    r.getString(0) shouldBe "900150983cd24fb0d6963f7d28e17f72"
    r.getString(1) shouldBe
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    r.getString(2) shouldBe "YWJj"
    r.getString(3) shouldBe "abc"
  }

  test("na battery: replace-before-fill order and drop subset") {
    import spark.implicits._
    val df = Seq((1, Some("F")), (2, None), (3, Some("X")))
      .toDF("k", "st")
    val out = df.na.replace("st", Map("F" -> "FIN"))
      .na.fill(Map("st" -> "NONE")).orderBy("k").collect()
    out.map(_.getString(1)).toSeq shouldBe Seq("FIN", "NONE", "X")
    // fill-before-replace would give NONE for k=2 either way but F
    // must become FIN (replace sees the pre-fill value)
    val dropped = Seq((1, Some(1)), (2, None)).toDF("k", "pri")
      .na.drop(Seq("pri"))
    dropped.count() shouldBe 1L
  }

  test("NOT IN with a NULL in the set returns zero rows") {
    import spark.implicits._
    Seq(1, 2).toDF("k").createOrReplaceTempView("probe_t")
    Seq(Some(1), None).toDF("v").createOrReplaceTempView("set_t")
    spark.sql(
      "SELECT * FROM probe_t WHERE k NOT IN (SELECT v FROM set_t)")
      .count() shouldBe 0L
    spark.sql("SELECT * FROM probe_t p WHERE NOT EXISTS " +
      "(SELECT 1 FROM set_t s WHERE s.v = p.k)")
      .count() shouldBe 1L
  }
}
