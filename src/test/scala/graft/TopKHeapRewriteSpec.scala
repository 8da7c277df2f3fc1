package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKHeapRewrite

/** The row_number-to-bounded-heap optimizer rule: fires on uniform-
  * direction rank filters, leaves everything else alone, and preserves
  * results and downstream resolution. */
class TopKHeapRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ TopKHeapRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  // unique scores so row_number is deterministic in both plans
  private def scores: DataFrame = (0 until 200).map { i =>
    (i % 7, i.toLong, (i * 37 % 199) * 1.0)
  }.toDF("grp", "id", "score")

  test("desc rank filter rewrites to collect_top_k with equal results") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
    def q = scores.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("grp"), col("id"), col("score"), col("rnk"))
    val expected = q.orderBy("grp", "rnk").collect()
    withRule {
      val plan = q.queryExecution.optimizedPlan.toString
      plan should include ("collect_top_k")
      plan should not include "Window"
      q.orderBy("grp", "rnk").collect() shouldBe expected
    }
  }

  test("ascending rank filter rewrites too") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
    def q = scores.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") < 4) // strict bound form
    val expected = q.orderBy("grp", "rnk").collect()
    withRule {
      q.queryExecution.optimizedPlan.toString should include ("collect_top_k")
      q.orderBy("grp", "rnk").collect() shouldBe expected
    }
  }

  test("rank = 1 argmax rewrites") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
    def q = scores.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1).drop("rnk")
    val expected = q.orderBy("grp").collect()
    withRule {
      q.queryExecution.optimizedPlan.toString should include ("collect_top_k")
      q.orderBy("grp").collect() shouldBe expected
    }
  }

  test("extra filter conjuncts survive the rewrite") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
    def q = scores.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3 && col("id") % 2 === 0)
    val expected = q.orderBy("grp", "rnk").collect()
    withRule {
      q.queryExecution.optimizedPlan.toString should include ("collect_top_k")
      q.orderBy("grp", "rnk").collect() shouldBe expected
    }
  }

  test("mixed directions are NOT rewritten") {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id").asc)
    def q = scores.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    withRule {
      q.queryExecution.optimizedPlan.toString should include ("Window")
    }
  }

  test("rank-like functions other than row_number are NOT rewritten") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
    def q = scores.withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
    withRule {
      q.queryExecution.optimizedPlan.toString should include ("Window")
    }
  }

  test("SQL window rank rewrites through GraftExtensions.register") {
    graft.expressions.GraftExtensions.register(spark)
    try {
      scores.createOrReplaceTempView("rewrite_t")
      val q = spark.sql(
        """SELECT grp, id, score, rnk FROM (
          |  SELECT grp, id, score, row_number() OVER (
          |    PARTITION BY grp ORDER BY score DESC) AS rnk
          |  FROM rewrite_t) WHERE rnk <= 2""".stripMargin)
      q.queryExecution.optimizedPlan.toString should include ("collect_top_k")
      q.count() shouldBe 14 // 7 groups x 2
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == TopKHeapRewrite)
    }
  }
}
