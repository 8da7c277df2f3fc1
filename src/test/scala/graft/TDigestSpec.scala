package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import graft.expressions.TDigestQuantile

/** The t-digest is an ESTIMATE (no bit-level oracle contract — see the
  * TDigestQuantile scaladoc), so the spec pins what the design
  * guarantees instead: rank error, layout robustness, bounded state,
  * and degenerate inputs. */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private def tdigest(q: Double, delta: Int = 100) =
    ColumnBridge.column(TDigestQuantile(
      ColumnBridge.expression(col("x")), q, delta).toAggregateExpression())

  /** Fraction of values strictly below the estimate — compare to q. */
  private def rankOf(values: Seq[Double], est: Double): Double =
    values.count(_ < est).toDouble / values.size

  test("rank error <= 1.5% at delta=100 on uniform and skewed data") {
    val uniform = (1 to 100000).map(_.toDouble)
    val skewed = (1 to 100000).map(i => math.pow(i.toDouble, 3))
    for ((name, data) <- Seq("uniform" -> uniform, "skewed" -> skewed)) {
      val df = data.toDF("x").repartition(16)
      for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
        val est = df.agg(tdigest(q)).head().getDouble(0)
        val err = math.abs(rankOf(data, est) - q)
        withClue(s"$name q=$q est=$est rank err $err: ") {
          err should be <= 0.015
        }
      }
    }
  }

  test("tails are sharp: p999 rank error <= 0.2%") {
    val data = (1 to 200000).map(_.toDouble)
    val est = data.toDF("x").repartition(32)
      .agg(tdigest(0.999)).head().getDouble(0)
    math.abs(rankOf(data, est) - 0.999) should be <= 0.002
  }

  test("estimate quality is layout-robust (1 vs 32 partitions)") {
    val data = (1 to 50000).map(i => (i % 1000).toDouble)
    for (parts <- Seq(1, 32)) {
      val est = data.toDF("x").repartition(parts)
        .agg(tdigest(0.5)).head().getDouble(0)
      math.abs(rankOf(data, est) - 0.5) should be <= 0.015
    }
  }

  test("degenerate inputs: empty -> NULL, constant -> the constant") {
    Seq.empty[Double].toDF("x").agg(tdigest(0.5))
      .head().isNullAt(0) shouldBe true
    Seq.fill(1000)(7.5).toDF("x").repartition(8)
      .agg(tdigest(0.9)).head().getDouble(0) shouldBe 7.5
  }

  test("state stays bounded: centroid count <= 2*delta after 1M adds") {
    val d = new TDigestQuantile.Digest(100)
    var i = 0
    while (i < 1000000) { d.add((i * 31 % 99991).toDouble); i += 1 }
    d.centroidCount should be <= 200
    d.toBytes.length should be <= (4 + 16 * 200)
  }

  test("SQL surface: graft_tdigest is callable and grouped") {
    graft.expressions.GraftExtensions.register(spark)
    (1 to 10000).map(i => (i % 2, i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("td_in")
    val rows = spark.sql(
      "SELECT g, graft_tdigest(x, 0.5) AS m FROM td_in GROUP BY g ORDER BY g")
      .collect()
    rows.length shouldBe 2
    // per-group medians of {even, odd} values of 1..10000 are ~5000
    all(rows.map(_.getDouble(1))) should (be > 4800.0 and be < 5200.0)
  }
}
