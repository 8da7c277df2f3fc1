package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Test-table access for the driver-generated parquet dirs
  * (`/root/testdata/sf*` — see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table stores TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and convert with integer
    * division (a double division would lose precision at ~1.7e18 ns).
    *
    * documents/embeddings arrive as ONE small parquet split; a
    * round-robin repartition at load was tried and MEASURED SLOWER at
    * sf0.1 (q16 7s -> 10-24s, q14 1.0 -> 1.7s): at this data size the
    * extra shuffle plus 32-task scheduling overhead beats the
    * parallelism gain, and the map-heavy stages were not core-bound. On
    * a real multi-split corpus the layout is already parallel. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
