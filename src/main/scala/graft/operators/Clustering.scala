package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-density clustering — the distributed approximation family of
  * DBSCAN (cf. the cell-based variants surveyed around GriT-DBSCAN;
  * the classic MR-DBSCAN partitioning): density is evaluated per grid
  * CELL of side `cell`, not per point-neighborhood, so the whole
  * algorithm is hash-aggregates and bounded equi-joins — no distance
  * self-join anywhere.
  *
  * Semantics (deterministic, integer-exact):
  *   - a cell is CORE when it holds ≥ minPts points;
  *   - clusters are connected components of core cells under
  *     8-neighborhood adjacency, labeled by minimum cell id;
  *   - points in core cells take their cell's cluster; points in
  *     non-core cells take the MINIMUM cluster among their ≤9
  *     neighboring core cells (border points); all else is noise (-1).
  * This is the grid approximation of DBSCAN(eps≈cell, minPts): it
  * trades the exact eps-ball for cell resolution in exchange for a
  * plan with one grouping shuffle, a ≤9× bounded neighbor fan-out,
  * and the Dedup CC machinery — the trade every 100 TB deployment
  * makes.
  *
  * Coordinate budget: cell indices must fit |cx|,|cy| < 2³⁰ (the
  * packed cell id is cx·2³¹+cy on shifted non-negatives); points
  * beyond it are filtered out up front rather than wrapped into a
  * colliding id. */
object Clustering {

  private val Shift = 1L << 30
  private val Base = 1L << 31

  private def cellId(cx: Column, cy: Column): Column =
    (cx + Shift) * Base + (cy + Shift)

  /** @return one row per input point: (<idCol>, cx, cy, cluster) with
    *   cluster = min core-cell id of its component, or -1 for noise */
  def gridDbscan(points: DataFrame, idCol: String, xCol: String,
      yCol: String, cell: Double, minPts: Long): DataFrame = {
    require(cell > 0, "cell must be positive")
    require(minPts >= 1, "minPts must be >= 1")
    val pts = points.select(col(idCol),
        floor(col(xCol).cast("double") / lit(cell)).cast("long").as("cx"),
        floor(col(yCol).cast("double") / lit(cell)).cast("long").as("cy"))
      .filter(abs(col("cx")) < Shift && abs(col("cy")) < Shift)
    // eager checkpoint, not persist: the cell table is grid-sized and
    // feeds TEN downstream branches (8 probes + join targets) — a
    // persisted frame still ships the full groupBy lineage in every
    // task closure, and the bench showed task DESERIALIZATION
    // dominating wall time; a checkpoint makes each branch's plan a
    // leaf scan
    val cells = pts.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__cell", cellId(col("cx"), col("cy")))
      .localCheckpoint(true)
    val core = cells.filter(col("__n") >= minPts)
      .select(col("cx"), col("cy"), col("__cell"))

    // 8-neighborhood adjacency between core cells: each core cell
    // emits its ≤8 neighbor keys (bounded fan-out), equi-joined back
    // against the core set. Orientation u < v dedups pairs.
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    val probes = offsets.map { case (dx, dy) =>
      core.select((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"),
        col("__cell").as("__from"))
    }.reduce(_ unionAll _)
    val adj = probes
      .join(core.select(col("cx"), col("cy"), col("__cell").as("__to")),
        Seq("cx", "cy"))
      .filter(col("__from") < col("__to"))
      .select(col("__from").as("id1"), col("__to").as("id2"))

    // CC over core cells; isolated core cells keep their own id
    val comp = Dedup.connectedComponents(adj)
    // same lineage-cut rationale: 9 border-probe branches + the final
    // join all read this frame, and its plan otherwise embeds the
    // whole CC loop
    val coreLabeled = core
      .join(comp.withColumnRenamed("node", "__cell"), Seq("__cell"), "left")
      .select(col("cx"), col("cy"),
        coalesce(col("cluster"), col("__cell")).as("__cl"))
      .localCheckpoint(true)

    // border lookup: a non-core point probes its own + 8 neighbor
    // cells for core clusters, keeping the minimum label
    val borderProbes = (Seq((0, 0)) ++ offsets).map { case (dx, dy) =>
      coreLabeled.select((col("cx") + dx).as("cx"),
        (col("cy") + dy).as("cy"), col("__cl"))
    }.reduce(_ unionAll _)
      .groupBy(col("cx"), col("cy"))
      .agg(min(col("__cl")).as("__near"))

    pts
      .join(coreLabeled.withColumnRenamed("__cl", "__own"),
        Seq("cx", "cy"), "left")
      .join(borderProbes, Seq("cx", "cy"), "left")
      .select(col(idCol), col("cx"), col("cy"),
        coalesce(col("__own"), col("__near"), lit(-1L)).as("cluster"))
  }
}
