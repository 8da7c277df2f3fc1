package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.expressions.{HilbertIndex, MortonInterleave}

/** Multi-dimensional data-layout clustering (z-order), the write-side
  * half of data skipping: sort the table by an interleaved-bit key so
  * parquet row-group min/max statistics stay TIGHT ON BOTH dimensions
  * at once. A single-column sort gives perfect pruning on that column
  * and none on any other; z-order trades a little of each for useful
  * pruning on all clustered columns — the same layout Delta/Iceberg
  * OPTIMIZE ZORDER BY produces.
  *
  * Scale design (100 TB): the cluster write is one range partition by
  * the z key (the skew-free primitive behind Spark's own global sort —
  * range bounds come from sampling) + an in-partition sort; downstream
  * scans prune row groups/files via plain min/max stats, no index
  * structure to maintain. Re-clustering after appends is
  * Maintenance.compact with this sort key.
  */
object Layout {

  /** z-order key column over two integral cell coordinates (each
    * truncated to `bits` low bits). Codegen'd bit interleave. */
  def zkey(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(MortonInterleave(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))

  /** Hilbert-curve key over two integral cell coordinates — the
    * locality-preserving alternative to [[zkey]]: consecutive key
    * values are always 4-adjacent cells (no Morton quadrant jumps),
    * so per-file min/max envelopes stay tighter on both dimensions
    * (the Delta liquid-clustering rationale). Codegen'd. */
  def hkey(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))

  /** [[zorderWrite]] with the Hilbert key. */
  def hilbertWrite(df: DataFrame, xCell: Column, yCell: Column, bits: Int,
      path: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val keyed = df.withColumn("__h", hkey(xCell, yCell, bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
    keyed.write.mode("overwrite").parquet(path)
    keyed
  }

  /** Cell coordinate for a double value: floor((v - min) / cellSize),
    * clamped to [0, 2^bits). Pair with zkey for continuous domains. */
  def cell(v: Column, min: Double, cellSize: Double, bits: Int): Column = {
    require(cellSize > 0, "cellSize must be positive")
    val c = floor((v - lit(min)) / lit(cellSize)).cast("long")
    greatest(lit(0L), least(c, lit((1L << bits) - 1L)))
  }

  /** Write `df` clustered by the z-order of (xCell, yCell) into
    * `numFiles` parquet files at `path`. Returns the frame as written
    * (with the transient z key dropped). */
  def zorderWrite(df: DataFrame, xCell: Column, yCell: Column, bits: Int,
      path: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val keyed = df.withColumn("__z", zkey(xCell, yCell, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    keyed.write.mode("overwrite").parquet(path)
    keyed
  }
}
