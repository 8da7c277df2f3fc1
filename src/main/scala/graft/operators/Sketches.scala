package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Sketch-based approximate aggregation (north-star extension): the
  * bounded-state summaries a 100 TB profiling pass runs instead of exact
  * aggregation — cardinality estimation (KMV bottom-k) and corpus-wide
  * heavy hitters (bounded-heap top-k over partial counts).
  *
  * Everything here is md5-derived and order-independent, so results are
  * bit-stable across partitionings AND reproducible in the DuckDB oracle
  * (same rule as the dedup sketches — no engine-specific hashing).
  */
object Sketches {

  /** Portable 60-bit hash: first 15 hex chars of md5 of the value's
    * string form, as a long uniform on [0, 2^60). Identical in DuckDB:
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Approximate COUNT(DISTINCT c) as a KMV sketch aggregate (see
    * KmvDistinctEstimate): k longs of state per group, ~1/sqrt(k-2)
    * relative error, deterministic for a given input set. Use in
    * `.agg(...)` like any aggregate column. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    ColumnBridge.column(
      graft.expressions.KmvDistinctEstimate(
        ColumnBridge.expression(md5Hash60(c)), k)
        .toAggregateExpression())

  /** Approximate COUNT(DISTINCT c) as a HyperLogLog sketch aggregate
    * (see HllDistinctEstimate): 2^p byte registers of state per group
    * (64 bytes at p = 6), ~1.04/sqrt(2^p) relative error, raw HLL
    * estimator (no range corrections — documented there), exactly
    * reproducible in the DuckDB oracle. Use in `.agg(...)`. */
  def hllDistinct(c: Column, p: Int = 6): Column =
    ColumnBridge.column(
      graft.expressions.HllDistinctEstimate(
        ColumnBridge.expression(md5Hash60(c)), p)
        .toAggregateExpression())

  /** Corpus-wide top-k most frequent items: partial+final hash-aggregate
    * counts, then ONE bounded-heap top-k (CollectTopK) over the count
    * table — never a global sort. Ties break by item descending (the
    * struct ordering), deterministically. Output: (rank, <itemName>,
    * cnt) with rank 1 = most frequent.
    *
    * Scale: the count aggregation shuffles one row per distinct item
    * (map-side partial); the top-k keeps k items per partition map-side
    * and k survive the final merge. A row_number-window form would
    * sort-shuffle the whole distinct-item table. */
  def heavyHitters(items: DataFrame, item: Column, k: Int,
      itemName: String = "item"): DataFrame = {
    val counts = items.select(item.as("__item"))
      .groupBy(col("__item")).agg(count(lit(1)).as("cnt"))
    val packed = struct(col("cnt"), col("__item"))
    counts
      .agg(ColumnBridge.collectTopK(packed, k, reverse = false).as("__tk"))
      .select(posexplode(col("__tk")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.__item").as(itemName), col("col.cnt").as("cnt"))
  }

  /** The d md5-derived bucket indices of an item for a depth-d, width-w
    * count-min sketch (row r hashes the string "r:<item>"). Pure column
    * math, identical in DuckDB:
    * `('0x' || substr(md5(r || ':' || CAST(x AS VARCHAR)), 1, 15))::BIGINT % w`.
    */
  def cmsBuckets(c: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      md5Hash60(concat(lit(s"$r:"), c.cast("string"))) % width
    }: _*)

  /** Count-min frequency sketch aggregate (see CountMinSketch): state is
    * depth*width longs per group; result is the flattened counter matrix
    * (row-major). Probe it with [[cmsEstimate]]. */
  def cmsSketch(c: Column, depth: Int = 4, width: Int = 512): Column =
    ColumnBridge.column(
      graft.expressions.CountMinSketch(
        ColumnBridge.expression(cmsBuckets(c, depth, width)), depth, width)
        .toAggregateExpression())

  /** Point-frequency estimate from a [[cmsSketch]] result: min over the
    * d counters at the item's bucket positions. Map-side column math —
    * probing never touches the aggregated data again. */
  def cmsEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    val buckets = cmsBuckets(item, depth, width)
    val counters = (0 until depth).map { r =>
      element_at(sketch, (lit(r * width) + element_at(buckets, r + 1) + 1)
        .cast("int"))
    }
    least(counters: _*)
  }
}
