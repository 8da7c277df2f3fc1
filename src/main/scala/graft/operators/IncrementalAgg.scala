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
}
