package graft

import org.apache.spark.sql.functions._

/** Scan-level 100 TB levers that have no query-shape of their own:
  * parquet aggregate pushdown (MIN/MAX/COUNT answered from footer
  * statistics — no row decode at all) and the `_metadata` hidden
  * column (file provenance carried through a projection, the
  * lineage-stamping idiom for multi-file ingests). */
class ScanFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_scan")
      .resolve("t").toString
    (1 to 10000).map(i => (i.toLong, i % 97))
      .toDF("id", "v").repartition(4).write.parquet(d)
    d
  }

  test("parquet aggregate pushdown answers MIN/MAX/COUNT from footers") {
    val saved = spark.conf.getOption("spark.sql.parquet.aggregatePushDown")
      .getOrElse("false")
    val savedV1 = spark.conf.getOption("spark.sql.sources.useV1SourceList")
      .getOrElse("avro,csv,json,kafka,orc,parquet,text")
    spark.conf.set("spark.sql.parquet.aggregatePushDown", "true")
    // aggregate pushdown is a DSv2 capability — route parquet through v2
    spark.conf.set("spark.sql.sources.useV1SourceList",
      savedV1.split(",").filterNot(_.trim == "parquet").mkString(","))
    try {
      val agg = spark.read.parquet(dir)
        .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
          max(col("id")).as("mx"))
      // the optimized plan must carry the pushed aggregation marker
      val plan = agg.queryExecution.executedPlan.toString
      plan should include("PushedAggregation")
      val r = agg.head()
      (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe (10000L, 1L, 10000L)
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushDown", saved)
      spark.conf.set("spark.sql.sources.useV1SourceList", savedV1)
    }
  }

  test("_metadata hidden column stamps file provenance per row") {
    val withMeta = spark.read.parquet(dir)
      .select(col("id"), col("_metadata.file_name").as("f"),
        col("_metadata.file_size").as("sz"))
    val rows = withMeta.limit(5).collect()
    all(rows.map(_.getString(1))) should endWith(".parquet")
    all(rows.map(_.getLong(2))) should be > 0L
    // distinct files seen equals the written partition count
    withMeta.select(col("f")).distinct().count() shouldBe 4L
  }

  test("hive partition pruning reads only the matching directories") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_prune").toString
    (1 to 100).map(i => (i.toLong, s"g${i % 4}"))
      .toDF("id", "part")
      .coalesce(1).write.partitionBy("part").mode("overwrite")
      .parquet(root)
    val whole = spark.read.parquet(root)
    whole.inputFiles.length shouldBe 4
    val pruned = whole.filter(col("part") === "g1")
    // collect() executes THIS df's plan (count() would build another)
    pruned.collect().length shouldBe 25
    // the scan's runtime metric proves only ONE directory was read
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    scan.metrics("numFiles").value shouldBe 1L
    // and the plan carries a partition filter, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
  }
}
