package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all specs (one JVM-wide session; ScalaTest
  * suites run sequentially in the forked test JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep catalog tables (bucketing specs) out of the repo tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Evaluate scalar Column expressions over a single synthetic row. */
  def eval(cols: org.apache.spark.sql.Column*): Row =
    spark.range(1).select(cols: _*).head()

  def evalOne[T](c: org.apache.spark.sql.Column): T =
    eval(c).getAs[T](0)

  def isNull(c: org.apache.spark.sql.Column): Boolean = eval(c).isNullAt(0)

  def rows(df: DataFrame): Seq[Row] = df.collect().toIndexedSeq
}
