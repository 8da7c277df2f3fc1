package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (incremental view maintenance for
  * distributive aggregates): keep a published aggregate table current
  * by merging the partial states of a new delta batch into it — the
  * base FACT table is never rescanned.
  *
  * Why this matters at 100 TB: a daily rollup over a 100 TB fact table
  * recomputed from scratch costs a full scan per refresh; merging a
  * delta costs one scan OF THE DELTA plus an aggregate-sized shuffle.
  * The trick is the same partial/final split Spark's own hash
  * aggregation uses — count/sum/min/max are re-aggregable states, so
  * "aggregate of (aggregate ⊎ delta-aggregate)" equals the full
  * recompute exactly (the equivalence the q96 oracle asserts by
  * recomputing from scratch). avg must be carried as (count, sum) and
  * derived at read time; exact count-distinct is NOT distributive —
  * carry a mergeable sketch (KMV/HLL, see Sketches) instead.
  */
object IncrementalAgg {

  /** Merge a delta of RAW rows into a base AGGREGATE table.
    *
    * Both frames must share `keys`; `base` carries the aggregate
    * columns listed in `counts`/`sums`/`mins`/`maxs` (delta carries the
    * raw columns of the same names). Count columns accumulate by sum;
    * sum columns by sum; min/max by min/max — the standard
    * re-aggregation of each state.
    *
    * New-in-delta keys appear with their delta-only aggregates;
    * untouched base keys pass through unchanged (their delta partial is
    * empty). */
  def mergeDelta(base: DataFrame, deltaRows: DataFrame, keys: Seq[String],
      counts: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(counts.nonEmpty || sums.nonEmpty || mins.nonEmpty || maxs.nonEmpty,
      "need at least one aggregate column")
    val aggCols = counts.map(c => count(lit(1)).as(c)) ++
      sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    val deltaAgg = deltaRows.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(base.columns.map(col): _*) // align column order with base
    val reAgg = counts.map(c => sum(col(c)).as(c)) ++
      sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    base.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(reAgg.head, reAgg.tail: _*)
  }

  /** Incremental maintenance under RETRACTIONS — the delta carries an
    * `opCol` of +1 (insert) / −1 (delete). Counts and sums are
    * self-maintainable under deletes (merge ±1 / ±value — exact
    * integers or decimals by the caller's contract); min/max are NOT
    * (deleting the current extremum needs the runner-up), so groups
    * touched by any delete recompute their min/max from `facts` —
    * the maintained post-delta fact table — scoped by a semi-join to
    * exactly the affected keys. That is the standard IVM split
    * (self-maintainable vs rescan-on-retract aggregates): refresh
    * cost is delta + affected-group rescan, never a full recompute.
    * Groups whose first count column reaches 0 are removed.
    *
    * At 100 TB the scoped rescan rides partition pruning/bucketing on
    * the keys — the semi-join keeps it at affected-partition cost. */
  def mergeDeltaWithRetractions(base: DataFrame, delta: DataFrame,
      facts: DataFrame, keys: Seq[String], opCol: String,
      counts: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    require(counts.nonEmpty,
      "retraction merge needs a count column to detect emptied groups")
    val keyCols = keys.map(col)
    val op = col(opCol).cast("long")
    val dAggCols =
      counts.map(c => sum(op).as(s"__d_$c")) ++
        sums.map(c => sum(op * col(c)).as(s"__d_$c")) ++
        mins.map(c => min(when(op > 0, col(c))).as(s"__ins_$c")) ++
        maxs.map(c => max(when(op > 0, col(c))).as(s"__ins_$c")) :+
        max(when(op < 0, 1).otherwise(0)).as("__has_del")
    val dAgg = delta.groupBy(keyCols: _*)
      .agg(dAggCols.head, dAggCols.tail: _*)
    val merged = base.join(dAgg, keys, "full")
    val nCol = coalesce(col(counts.head), lit(0L)) +
      coalesce(col(s"__d_${counts.head}"), lit(0L))
    val alive = merged.filter(nCol > 0)
      .withColumn("__has_del", coalesce(col("__has_del"), lit(0)))
    val rescanKeys = alive.filter(col("__has_del") === 1)
      .select(keyCols: _*)
    val rescanAggs = mins.map(c => min(col(c)).as(s"__re_$c")) ++
      maxs.map(c => max(col(c)).as(s"__re_$c"))
    val rescanned =
      if (rescanAggs.isEmpty) null
      else facts.join(rescanKeys, keys, "left_semi")
        .groupBy(keyCols: _*)
        .agg(rescanAggs.head, rescanAggs.tail: _*)
    val withRescan =
      if (rescanned == null) alive else alive.join(rescanned, keys, "left")
    val outCols = keyCols ++
      counts.map(c => (coalesce(col(c), lit(0L)) +
        coalesce(col(s"__d_$c"), lit(0L))).as(c)) ++
      sums.map(c => (coalesce(col(c), lit(0L)) +
        coalesce(col(s"__d_$c"), lit(0L))).as(c)) ++
      mins.map(c => when(col("__has_del") === 1, col(s"__re_$c"))
        .otherwise(least(col(c), col(s"__ins_$c"))).as(c)) ++
      maxs.map(c => when(col("__has_del") === 1, col(s"__re_$c"))
        .otherwise(greatest(col(c), col(s"__ins_$c"))).as(c))
    withRescan.select(outCols: _*)
  }

  // no "=" in the name: Spark's path filter KEEPS underscore-prefixed
  // names containing "=" (the partition-dir heuristic), and the parquet
  // reader would then try to parse the marker as data
  private val MarkerPrefix = "_applied_batch_"

  /** Highest batch id already merged into the published table, or -1.
    * The marker is an empty underscore-prefixed file (invisible to
    * parquet readers) committed IN the same directory swap as the data,
    * so marker and merge can never disagree. */
  def appliedBatchId(spark: org.apache.spark.sql.SparkSession,
      pubPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(pubPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)
      .foldLeft(-1L)(math.max)
  }

  /** An exactly-once foreachBatch refresher for Structured Streaming:
    * merges each micro-batch's rows into the published aggregate and
    * SKIPS batches whose id is already recorded in the table — the
    * marker file travels inside the atomic directory swap, so a batch
    * is applied iff its marker is visible. This closes the replay hole
    * in naive foreachBatch maintenance: Spark's foreachBatch contract
    * is at-least-once (after a crash between sink commit and offset
    * commit, the LAST batch re-runs), and an unguarded re-merge would
    * double-count it. Restart-safe end to end: offsets come from the
    * stream checkpoint, dedup comes from the marker.
    *
    * Empty batches still advance the marker (a skipped id must not be
    * mistaken for an unapplied one on the next restart). */
  def idempotentRefresher(spark: org.apache.spark.sql.SparkSession,
      pubPath: String, keys: Seq[String],
      counts: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    // a crash between the swap's two renames leaves the table (and its
    // markers) only in __old; restore before reading, or a restart
    // would see appliedBatchId = -1 and fail the base read
    ParquetTable.recoverInterrupted(spark, pubPath)
    val applied = appliedBatchId(spark, pubPath)
    if (batchId > applied) {
      val base = graft.operators.ParquetTable.read(spark, pubPath)
      val merged =
        if (batch.isEmpty) base
        else mergeDelta(base, batch, keys, counts, sums, mins, maxs)
      ParquetTable.overwriteAtomic(merged, pubPath,
        extraFiles = Seq(s"$MarkerPrefix$batchId"))
    }
  }
}
