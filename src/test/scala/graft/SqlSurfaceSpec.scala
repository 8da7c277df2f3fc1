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
}
