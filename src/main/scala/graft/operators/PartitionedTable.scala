package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Key-bucketed table layout for partition-scoped mutation — the
  * SURVEY §7.5 commitment ("design the commit as key-partitioned so
  * only touched partitions rewrite"): at 100 TB, a keyed UPDATE or
  * DELETE touching 0.1% of keys must not rewrite the other 99.9%.
  *
  * Layout: hive-style directories `__kb=<bucket>/part-*.parquet`,
  * bucket = pmod(hash(key), numBuckets) (Spark's murmur hash — stable
  * across runs/sessions for a given value, engine-internal is fine
  * because the bucket never leaves the storage layout).
  *
  * Mutation protocol: project the mutation set's touched buckets (a
  * tiny distinct aggregate), scan ONLY those buckets (partition
  * pruning — the other directories are never even listed), merge, and
  * commit with dynamic partition overwrite, which replaces exactly the
  * partitions present in the written frame. Untouched bucket
  * directories keep their files byte-identical (spec-asserted).
  * Commit atomicity is per-partition (the Hive dynamic-overwrite
  * contract); cross-partition atomicity needs a manifest table format
  * (Delta/Iceberg) — same note as ParquetTable.overwriteAtomic.
  */
object PartitionedTable {

  val BucketCol = "__kb"

  def bucketOf(key: org.apache.spark.sql.Column, numBuckets: Int)
      : org.apache.spark.sql.Column =
    pmod(hash(key), lit(numBuckets))

  /** Write `df` bucketed by `key` into `numBuckets` hive partitions. */
  def write(df: DataFrame, path: String, key: String,
      numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    df.withColumn(BucketCol, bucketOf(col(key), numBuckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(BucketCol)

  private def withDynamicOverwrite[T](spark: SparkSession)(f: => T): T = {
    val confKey = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "dynamic")
    try f
    finally saved match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  /** The touched-buckets-only mutation core: prune the base scan to the
    * buckets the mutation set hits, apply `op` to (prunedBase,
    * mutations), and dynamic-overwrite exactly those partitions. */
  private def mutateTouched(spark: SparkSession, path: String,
      mutations: DataFrame, key: String, numBuckets: Int)(
      op: (DataFrame, DataFrame) => DataFrame): Unit = {
    val keyed = mutations.withColumn(BucketCol,
      bucketOf(col(key), numBuckets))
    val touched = keyed.select(col(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val prunedBase = spark.read.parquet(path)
      .filter(col(BucketCol).isin(touched: _*))
    val result = op(prunedBase.drop(BucketCol), keyed.drop(BucketCol))
    withDynamicOverwrite(spark) {
      result.withColumn(BucketCol, bucketOf(col(key), numBuckets))
        .write.mode(SaveMode.Overwrite)
        .partitionBy(BucketCol)
        .parquet(path)
    }
  }

  /** Keyed MERGE rewriting ONLY the buckets containing updated keys.
    * Same semantics as UpdateJob.merge on the touched subset. */
  def mergeByKey(spark: SparkSession, path: String, updates: DataFrame,
      key: String, numBuckets: Int,
      orderCol: Option[String] = None): Unit =
    mutateTouched(spark, path, updates, key, numBuckets) { (base, upd) =>
      UpdateJob.merge(base, upd, Seq(key), orderCol)
    }

  /** Keyed DELETE rewriting ONLY the buckets containing deleted keys. */
  def deleteByKey(spark: SparkSession, path: String, keyDf: DataFrame,
      key: String, numBuckets: Int): Unit =
    mutateTouched(spark, path, keyDf, key, numBuckets) { (base, keys) =>
      DeleteJob.deleteByKeys(base, keys, Seq(key))
    }
}
