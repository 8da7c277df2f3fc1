package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large×large interval overlap join via fixed-width binning.
  *
  * q26's range join broadcasts one side (a broadcast nested-loop — the
  * right physical plan when one side fits an executor). When BOTH
  * interval sets are large, a nested loop is quadratic and a broadcast
  * impossible; the scalable formulation maps each interval to the
  * fixed-width bins it covers and hash-joins on the bin — the classic
  * temporal/spatial binning scheme (same primitive as the q46 grid-cell
  * spatial join, in one dimension).
  *
  * De-duplication is plan-free: a pair overlapping across several shared
  * bins is emitted ONLY in the bin containing max(lStart, rStart) —
  * overlap guarantees both sides cover that bin, so each qualifying
  * pair appears exactly once and no distinct/shuffle is needed.
  *
  * Scale design (100 TB): the exchange carries each row once per bin it
  * covers (span/binWidth + 1 copies — pick binWidth near the median
  * interval length to keep replication O(1)); the join is a plain
  * hash-partitioned equi-join on the bin key, so AQE's skew handling
  * applies to hot bins. The exact overlap predicate runs post-join on
  * the ~binWidth-local candidates only.
  *
  * Intervals are CLOSED integer ranges [start, end] (epoch days, epoch
  * seconds — any integer domain): overlap means lStart <= rEnd AND
  * rStart <= lEnd. Column names of the two inputs must be disjoint.
  */
object IntervalJoin {

  def overlapJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth ($binWidth) must be >= 1")
    val common = left.columns.toSet.intersect(right.columns.toSet)
    require(common.isEmpty, s"column names must be disjoint, both have: $common")

    def bin(c: Column): Column = floor(c / binWidth).cast("long")

    val lb = left.withColumn("__lbin",
      explode(sequence(bin(col(lStart)), bin(col(lEnd)))))
    val rb = right.withColumn("__rbin",
      explode(sequence(bin(col(rStart)), bin(col(rEnd)))))

    lb.join(rb,
        col("__lbin") === col("__rbin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          col("__lbin") === bin(greatest(col(lStart), col(rStart))))
      .drop("__lbin", "__rbin")
  }
}
