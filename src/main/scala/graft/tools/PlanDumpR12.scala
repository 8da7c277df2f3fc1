package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r12 plan evidence for operator internals whose query-level
  * `.explain` is hidden behind an eager localCheckpoint (the operator
  * materializes during query construction, so the registry plan is
  * just `Scan ExistingRDD`). Reconstructs the EXACT inner pipelines
  * and prints the formatted plan of the before- and after-shapes so
  * the r12 claims (SortMergeJoin → BroadcastHashJoin on the triangle
  * closing semi-join; the Scale.spread exchange ahead of per-row-heavy
  * projections) are checkable without running Spark.
  *
  * Usage: runMain graft.tools.PlanDumpR12 [sfDir]
  */
object PlanDumpR12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String, df: DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    // ---- triangle family: wedge-closing semi-join (q78/q167) ----
    val e = graft.Tables.load(spark, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    val canon = graft.operators.Graph.canonicalEdges(e, "src", "dst")
    val deg = canon.select(col("u").as("n"))
      .unionAll(canon.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = canon
      .hint("shuffle_hash")
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
      .hint("shuffle_hash")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("lo"), col("v").as("hi")))
        .otherwise(struct(col("v").as("lo"), col("u").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    val left = oriented.select(col("lo").as("apex"), col("hi").as("a"))
    val right = oriented.select(col("lo").as("apex"), col("hi").as("b"))
    val wedges = left.hint("shuffle_hash").join(right, Seq("apex"))
      .filter(col("a") < col("b"))
    val closing = canon.select(col("u").as("a"), col("v").as("b"))
    show("triangle_closing_BEFORE (default semi-join of wedges vs edges)",
      wedges.join(closing, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_triangles")))
    show("triangle_closing_AFTER (broadcast semi-join, wedges in-pipeline)",
      wedges.join(broadcast(closing), Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_triangles")))

    // ---- Scale.spread ahead of a per-row-heavy projection ----
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val shingles = graft.functions.TextAnalysis.charShingles(col("text"), 4)
    show("shingle_stage_BEFORE (single-split scan feeds the shingle project)",
      docs.select(col("doc_id"), shingles.as("__sh")))
    show("shingle_stage_AFTER (round-robin spread exchange ahead of it)",
      graft.operators.Scale.spread(docs)
        .select(col("doc_id"), shingles.as("__sh")))

    spark.stop()
  }
}
