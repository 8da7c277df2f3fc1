package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment needs
  * beyond what AQE does automatically (SURVEY §4, ARCHITECTURE.md).
  *
  *  - Salting: a skewed aggregation key (one customer with 10^9 rows)
  *    makes one reducer the straggler. Two-phase salted aggregation
  *    splits each key across `saltFactor` sub-keys (map-side partials
  *    land on different reducers), then combines. AQE's skew handling
  *    covers joins; skewed AGGREGATIONS still need this.
  *  - Bucketing: two fact tables bucketed + sorted on the join key are
  *    co-located — the join runs with ZERO Exchange (verified by plan
  *    assertion in ScaleSpec). The 100 TB analog of the reference's
  *    "index your id column" advice (`README.md:148,167`).
  */
object Scale {

  /** Deterministic salt in [0, saltFactor): hashed from the partition
    * id plus the given columns. Salts feed shuffle keys, so they must
    * be stable under stage retry — `monotonically_increasing_id` (or
    * rand) is not: a re-executed map task would re-salt rows
    * differently from the copies surviving reducers already fetched,
    * duplicating or dropping rows. Content hashing is retry-stable.
    *
    * `cols` should be the columns the operator consumes anyway (so
    * column pruning survives — hashing EVERY column would force a
    * full-row scan) and must exclude map-typed columns (Spark's hash
    * rejects MapType); the map filter below enforces that. Degenerate
    * case: rows bit-identical in the hashed columns WITHIN a partition
    * share a salt — spanning partitions still spreads via the
    * partition-id term. */
  private def deterministicSalt(df: DataFrame, cols: Seq[String],
      saltFactor: Int): Column = {
    val hashable = cols.filterNot(c => df.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.MapType])
    pmod(abs(hash(spark_partition_id() +: hashable.map(col): _*)),
      lit(saltFactor))
  }

  /** Scale-adaptive input spread (guide §2.5, input skew): when a
    * relation's scan parallelism is BELOW the session's default
    * parallelism — the single-file / single-row-group fixture shape,
    * or one giant gzip member at production scale — round-robin
    * repartition it so downstream per-row-heavy compute (tokenize,
    * shingle, hash, decode, parse) uses every core instead of one.
    * No-op whenever the source already has enough splits (any real
    * multi-file table), so the extra exchange exists only where the
    * scan itself starves the job. Explicit-N repartition is exempt
    * from AQE partition coalescing, so the spread survives the tiny
    * byte sizes that motivate it.
    *
    * Place it AFTER source filters (so pushdown still reaches the
    * scan) and immediately BEFORE the heavy projection. Results are
    * unchanged: every consumer in this codebase is partitioning-
    * invariant by design (integer/decimal aggregates, sorted folds,
    * total-order windows — the cross-engine-oracle contract).
    *
    * CONTRACT (r12 VERDICT): the parallelism probe reads
    * `df.rdd.getNumPartitions`, and on an AQE plan with upstream
    * exchanges forcing the RDD MATERIALIZES those query stages —
    * executing part of the query before the caller's action. So the
    * probe only runs on SCAN-SHAPED inputs (narrow chains of
    * project/filter/generate/union over leaves: file scans,
    * checkpoints, local relations — where `.rdd` just compiles the
    * plan). Anything else returns unchanged: a post-exchange frame
    * already carries the session's shuffle parallelism, and callers
    * that need a specific layout use an explicit repartition. Enforced
    * structurally below, not by scaladoc alone (ScaleSpec pins the
    * no-op-without-execution behavior on a post-shuffle input). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (!scanShaped(df.queryExecution.logical)) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** True iff the plan is a narrow (exchange-free) chain over leaves,
    * so compiling its RDD cannot trigger eager stage execution. */
  private[graft] def scanShaped(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: Generate | _: SubqueryAlias |
          _: Union => plan.children.forall(scanShaped)
      case _ => false
    }
  }

  /** Two-phase salted sum/count aggregation. Results are EXACTLY equal
    * to the unsalted `df.groupBy(keys).agg(sum/count)` — only the
    * shuffle distribution changes. Extend with more partial-izable
    * aggregates as needed (min/max/sum/count all decompose). */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      sumCols: Seq[String], saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      deterministicSalt(df, keys ++ sumCols, saltFactor))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Write a table bucketed + sorted on `key` so future equi-joins and
    * aggregations on `key` skip the shuffle. Catalog-managed (bucket
    * metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. The plan contains no
    * Exchange when both sides share the bucket spec. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Skew-safe equi-join: the fact side's rows get a uniform salt in
    * [0, saltFactor); the dimension side is REPLICATED across every
    * salt value; the join keys on (key, salt). A hot key's rows spread
    * over saltFactor reducers instead of one straggler. Results are
    * EXACTLY the plain inner join's (ScaleSpec pins it). Use when
    * AQE's skew-join split doesn't apply (e.g. the skewed side feeds
    * a co-partitioned downstream op); cost = dim side × saltFactor. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = fact.withColumn("__salt",
      deterministicSalt(fact, fact.columns.toSeq, saltFactor))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Hive-style partitioned layout: one directory per value of
    * `partitionCols`. A filter on a partition column prunes whole
    * directories at PLANNING time (the scan's PartitionFilters — no
    * file even gets listed, let alone read), which is the first-order
    * I/O lever at 100 TB: a date-partitioned corpus turns a
    * one-day query into a one-directory scan. Keep partition
    * cardinality bounded (dates, categories — never ids): each value
    * is a directory and tiny files kill scan throughput. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
