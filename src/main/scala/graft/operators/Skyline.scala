package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** 2-D Pareto frontier (skyline, Börzsönyi et al. ICDE 2001): the rows
  * not dominated in (maximize x, maximize y) — the standard "best
  * trade-off set" query (price vs recency, quality vs length, score vs
  * cost) used to pick training data under two competing criteria.
  *
  * The sort-scan algorithm (frontier point ⇔ y strictly exceeds every
  * y at higher x) needs a running max over the x-descending order —
  * the textbook single-partition-window trap. Here it is the
  * distributed prefix scheme this repo uses everywhere (RowNumbers /
  * Packing): collapse to one (x, max y) row per distinct x, range-
  * partition by x desc, per-partition exclusive running-max window
  * (parallel), plus a driver-collected per-partition max table
  * (bounded by the partition count) giving each partition the
  * exclusive max of everything before it. Two narrow passes, no
  * global sort bottleneck; output is the frontier, typically tiny.
  *
  * Semantics pinned by the spec: duplicates of a frontier (x, y)
  * collapse (the grouping step); a row tied on x but lower on y is
  * dominated; equal-y-at-lower-x is dominated (strict >). */
object Skyline {

  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x")).agg(max(col(yCol)).as("y"))
    val ordered = pts
      .repartitionByRange(col("x").desc)
      .sortWithinPartitions(col("x").desc)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_ONLY)
    // exclusive prefix max ACROSS partitions: one row per partition —
    // a table bounded by the partition COUNT. The exclusive running
    // max over it is a triangle self-join (strictly-earlier pids),
    // which plans as a broadcast nested-loop over ≤ numPartitions²
    // constant-size rows — keeping the whole operator free of single-
    // partition exchanges and global windows (PlanAuditSpec's
    // registry-wide invariant), type-generic in y
    val pm = ordered.groupBy(col("__pid")).agg(max(col("y")).as("__m"))
    val prefixDf = pm.select(col("__pid"), col("__m"))
      .join(pm.select(col("__pid").as("__qid"), col("__m").as("__qm")),
        col("__qid") < col("__pid"), "left")
      .groupBy(col("__pid")).agg(max(col("__qm")).as("__poff"))
    // exclusive running max WITHIN each partition (parallel windows)
    val w = Window.partitionBy(col("__pid")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ordered.withColumn("__pm", max(col("y")).over(w))
      .join(broadcast(prefixDf), Seq("__pid"))
      .filter((col("__pm").isNull || col("y") > col("__pm")) &&
        (col("__poff").isNull || col("y") > col("__poff")))
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
