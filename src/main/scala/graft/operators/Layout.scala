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

  /** Decompose the inclusive cell box [x0,x1]×[y0,y1] into disjoint,
    * sorted, INCLUSIVE Hilbert-index ranges covering exactly the box —
    * the read-side half of Hilbert clustering: a 2-D window becomes a
    * 1-D range scan over the [[hkey]]-sorted layout. Quadtree descent:
    * an axis-aligned 2^k-quad is always a CONTIGUOUS 4^k-run of the
    * curve, so a fully-contained quad emits one range and only
    * boundary quads recurse — O(perimeter·bits) ranges before
    * coalescing. When more than `maxRanges` remain, the smallest gaps
    * merge first: the result is then a SUPERSET of the box's indices
    * (pair with the residual box predicate, exactly how every
    * space-filling-curve index is queried). Driver-side over literal
    * bounds; the scan work stays fully distributed. */
  def hilbertRanges(x0: Long, y0: Long, x1: Long, y1: Long, bits: Int,
      maxRanges: Int): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) out of [1, 31]")
    require(maxRanges >= 1, "maxRanges must be >= 1")
    require(x0 <= x1 && y0 <= y1, "empty box")
    val side = 1L << bits
    require(x0 >= 0 && y0 >= 0 && x1 < side && y1 < side,
      s"box exceeds the $bits-bit cell space")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def go(qx: Long, qy: Long, s: Long): Unit = {
      if (qx > x1 || qx + s - 1 < x0 || qy > y1 || qy + s - 1 < y0) ()
      else if (qx >= x0 && qx + s - 1 <= x1 &&
          qy >= y0 && qy + s - 1 <= y1) {
        val d = graft.expressions.HilbertUtil.index(qx, qy, bits)
        val size2 = s * s
        val start = d & ~(size2 - 1)
        out += ((start, start + size2 - 1))
      } else {
        val h = s / 2
        go(qx, qy, h); go(qx + h, qy, h)
        go(qx, qy + h, h); go(qx + h, qy + h, h)
      }
    }
    go(0L, 0L, side)
    val sorted = out.sortBy(_._1).toVector
    // coalesce touching ranges (free), then merge smallest gaps to cap
    val coalesced = sorted.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ ((a, b)), (c, d)) if c <= b + 1 =>
        acc :+ ((a, math.max(b, d)))
      case (acc, r) => acc :+ r
    }
    var rs = coalesced
    while (rs.length > maxRanges) {
      val gi = (1 until rs.length)
        .minBy(i => rs(i)._1 - rs(i - 1)._2)
      rs = (rs.take(gi - 1) :+ ((rs(gi - 1)._1, rs(gi)._2))) ++
        rs.drop(gi + 1)
    }
    rs
  }

  /** Filter predicate for [[hilbertRanges]] over a precomputed hkey
    * column plus the residual box check on the cell columns. */
  def hilbertBoxFilter(hkeyCol: Column, cx: Column, cy: Column,
      x0: Long, y0: Long, x1: Long, y1: Long, bits: Int,
      maxRanges: Int): Column = {
    val ranges = hilbertRanges(x0, y0, x1, y1, bits, maxRanges)
    val rangeOr = ranges.map { case (a, b) =>
      hkeyCol >= a && hkeyCol <= b
    }.reduce(_ || _)
    rangeOr && cx >= x0 && cx <= x1 && cy >= y0 && cy <= y1
  }
}
