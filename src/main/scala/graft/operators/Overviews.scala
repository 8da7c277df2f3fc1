package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overview (level-of-detail) pyramid — the engine-side restatement of
  * CARTO's server-delegated `CDB_CreateOverviews` (reference
  * `etl/etl.py:166-173`, `README.md:169-194`): for each zoom level,
  * points are snapped to a web-mercator-style grid and aggregated, giving
  * a render-ready table whose row count is bounded by the grid, not the
  * data.
  *
  * Scale design: each level is ONE hash-aggregate over the base table
  * (map-side partial aggregation -> tiny shuffle keyed by cell id;
  * no sort, no window). Levels are independent jobs that can run
  * concurrently; at 100 TB the scan dominates, so `pyramid` builds all
  * levels from one cached/cheaply-rescanned projection of just
  * (x, y, value) — column pruning keeps the scan narrow.
  */
object Overviews {

  /** Cells per axis at a zoom level (2^z, the web map convention). */
  def cellsPerAxis(zoom: Int): Long = 1L << zoom

  /** Grid cell index for a lon/lat at a zoom level: the world spans
    * [-180,180] x [-90,90]; cell (cx, cy) with 2^z columns. */
  def cellX(lon: Column, zoom: Int): Column = {
    val n = lit(cellsPerAxis(zoom).toDouble)
    least(floor((lon + lit(180.0)) / lit(360.0) * n), lit(cellsPerAxis(zoom) - 1))
      .cast("long")
  }
  def cellY(lat: Column, zoom: Int): Column = {
    val n = lit(cellsPerAxis(zoom).toDouble)
    least(floor((lat + lit(90.0)) / lit(180.0) * n), lit(cellsPerAxis(zoom) - 1))
      .cast("long")
  }

  /** One LOD level: snap + aggregate. `valueCols` get sum/avg; every cell
    * carries its point count and centroid. */
  def level(points: DataFrame, lonCol: String, latCol: String,
      zoom: Int, valueCols: Seq[String] = Nil): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("n_points"),
        avg(col(lonCol)).as("centroid_lon"),
        avg(col(latCol)).as("centroid_lat")) ++
      valueCols.flatMap(v => Seq(
        sum(col(v)).as(s"sum_$v"), avg(col(v)).as(s"avg_$v")))
    points
      .filter(col(lonCol).isNotNull && col(latCol).isNotNull)
      .groupBy(
        cellX(col(lonCol), zoom).as("cell_x"),
        cellY(col(latCol), zoom).as("cell_y"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("zoom", lit(zoom))
  }

  /** Build every requested level. The input projection is narrowed first
    * so a cache (or repeated scan) only carries the needed columns. */
  def pyramid(points: DataFrame, lonCol: String, latCol: String,
      zooms: Seq[Int], valueCols: Seq[String] = Nil): Map[Int, DataFrame] = {
    val narrow = points.select((Seq(lonCol, latCol) ++ valueCols).map(col): _*)
    zooms.map(z => z -> level(narrow, lonCol, latCol, z, valueCols)).toMap
  }
}
