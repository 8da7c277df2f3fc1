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
  * tiny distinct aggregate), read ONLY those bucket directories —
  * addressed directly with basePath, so untouched directories are not
  * even listed (a filter-based prune would still pay a full-tree
  * partition-discovery listing) — merge, and commit with dynamic
  * partition overwrite, which replaces exactly the partitions present
  * in the written frame; buckets the mutation emptied are deleted
  * explicitly (dynamic overwrite cannot express "this partition is
  * now empty"). Untouched bucket directories keep their files
  * byte-identical (spec-asserted).
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

  /** The touched-buckets-only mutation core: read ONLY the touched
    * bucket directories (addressed directly via basePath — untouched
    * directories are not even listed), apply `op` to (prunedBase,
    * mutations), and dynamic-overwrite exactly those partitions.
    *
    * `mutations` is materialized (persist + the touched-bucket
    * collect) before use: it is consumed twice, and a nondeterministic
    * mutations plan re-evaluated in phase 2 could otherwise produce
    * keys outside the collected touched set — whose mutations would
    * silently not apply.
    *
    * Empty-bucket rule: dynamic overwrite only replaces partitions
    * PRESENT in the written frame, so a bucket whose rows are all
    * deleted would keep its old files and the deletion would silently
    * resurrect. Buckets touched but absent from the result are deleted
    * explicitly after the commit. */
  private def mutateTouched(spark: SparkSession, path: String,
      mutations: DataFrame, key: String, numBuckets: Int)(
      op: (DataFrame, DataFrame) => DataFrame): Unit = {
    val keyed = mutations.withColumn(BucketCol,
      bucketOf(col(key), numBuckets)).persist()
    try {
      val touched = keyed.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) return
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // buckets with no directory hold no rows — nothing to mutate there
      val touchedDirs = touched.map(b => s"$path/$BucketCol=$b")
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
      if (touchedDirs.isEmpty) return
      val prunedBase = spark.read.option("basePath", path)
        .parquet(touchedDirs: _*)
      val result = op(prunedBase.drop(BucketCol), keyed.drop(BucketCol))
        .withColumn(BucketCol, bucketOf(col(key), numBuckets))
        .persist()
      try {
        val kept = result.select(col(BucketCol)).distinct()
          .collect().map(_.getInt(0)).toSet
        withDynamicOverwrite(spark) {
          result.write.mode(SaveMode.Overwrite)
            .partitionBy(BucketCol)
            .parquet(path)
        }
        // remove buckets the mutation emptied entirely
        touched.filterNot(kept).foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/$BucketCol=$b"),
            true)
        }
        // fully-emptied table: no partition dirs remain, which would
        // leave nothing to infer a schema from — write a zero-row,
        // schema-bearing file so the table stays readable
        val anyBucketLeft = fs.listStatus(
          new org.apache.hadoop.fs.Path(path))
          .exists(_.getPath.getName.startsWith(s"$BucketCol="))
        if (!anyBucketLeft) {
          result.drop(BucketCol).limit(0).repartition(1)
            .write.mode(SaveMode.Append).parquet(path)
        }
      } finally result.unpersist()
    } finally keyed.unpersist()
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
