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
}
