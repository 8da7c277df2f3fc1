package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** JL random projection + matryoshka truncation invariants (no
  * memorized fixtures): projection is linear, approximately
  * norm-preserving in expectation (JL), and deterministic;
  * matryoshka output is unit-norm (or all-zero) and proportional to
  * the prefix. */
class EmbeddingOpsSpec extends SparkSpec {

  private val embDf = Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("randomProject: deterministic, linear, JL norm class") {
    val p = Similarity.randomProject(col("embedding"), 64, 16)
    val rows = embDf.limit(50)
      .select(col("vec_id"), p.as("y"),
        sqrt(aggregate(col("embedding"),
          lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
          .as("xn"),
        sqrt(aggregate(p, lit(0.0), (a, x) => a + x * x)).as("yn"))
      .collect()
    // deterministic: second evaluation bit-equal
    val rows2 = embDf.limit(50)
      .select(col("vec_id"), Similarity.randomProject(col("embedding"),
        64, 16).as("y")).collect()
    rows.map(_.getSeq[Double](1)) shouldBe rows2.map(_.getSeq[Double](1))
    // JL class: mean norm ratio within a loose band around 1
    val ratios = rows.map(r => r.getDouble(3) / r.getDouble(2))
    val mean = ratios.sum / ratios.length
    mean should be > 0.5
    mean should be < 1.5
    rows.foreach(_.getSeq[Double](1).length shouldBe 16)
  }

  test("matryoshka: unit norm, prefix-proportional, zero-safe") {
    val m = Similarity.matryoshka(col("embedding"), 8)
    val rows = embDf.limit(20)
      .select(col("embedding"), m.as("m")).collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](0).map(_.toDouble)
      val y = r.getSeq[Double](1)
      y.length shouldBe 8
      val n = math.sqrt(y.map(v => v * v).sum)
      if (x.take(8).exists(_ != 0.0)) {
        n shouldBe 1.0 +- 1e-12
        // proportionality: y[i] * ||x_pre|| == x[i]
        val xn = math.sqrt(x.take(8).map(v => v * v).sum)
        y.zip(x.take(8)).foreach { case (yi, xi) =>
          yi * xn shouldBe xi +- 1e-9
        }
      }
    }
    // all-zero prefix stays zeros, no NaN
    import spark.implicits._
    val z = Seq(Tuple1(Array.fill(16)(0.0f))).toDF("embedding")
      .select(Similarity.matryoshka(col("embedding"), 8).as("m"))
      .head().getSeq[Double](0)
    z shouldBe Seq.fill(8)(0.0)
  }
}
