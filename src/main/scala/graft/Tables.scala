package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Test-table access for the driver-generated parquet dirs
  * (`/root/testdata/sf*` — see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp normalization: driver-generated parquet has carried two
    * timestamp encodings across rounds — TIMESTAMP(NANOS) (rejected by
    * Spark's reader unless read as long and integer-divided; a double
    * division would lose precision at ~1.7e18 ns) and, since the
    * round-4 regeneration, naive TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ.
    * Every NTZ column is cast back to session-zone TIMESTAMP here —
    * value-preserving under the engine's fixed UTC session timezone,
    * and exactly DuckDB's naive-timestamp-as-UTC oracle semantics —
    * so downstream time arithmetic (unix_micros, watermarks,
    * range-frame windows) sees one timestamp type regardless of the
    * generator's encoding.
    *
    * documents/embeddings arrive as ONE small parquet split; a
    * round-robin repartition at load was tried and MEASURED SLOWER at
    * sf0.1 (q16 7s -> 10-24s, q14 1.0 -> 1.7s): at this data size the
    * extra shuffle plus 32-task scheduling overhead beats the
    * parallelism gain, and the map-heavy stages were not core-bound. On
    * a real multi-split corpus the layout is already parallel. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast("timestamp"))
      else acc
    }
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
