package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance-bounded spatial join — the CARTO-shaped operator the
  * reference delegates to PostGIS ("points within radius"): pair left
  * points with every right point closer than `radiusDeg` (planar
  * degrees; see haversineKm for metric distance).
  *
  * Scale design: never a cross join. Both sides are keyed into square
  * grid cells of side `radiusDeg`; the LEFT side additionally probes
  * its 3x3 cell neighborhood (9 keys per row — a bounded, left-only
  * fan-out, the same probe-side-expansion trick as multi-probe LSH),
  * so every true pair within the radius shares at least one key. The
  * join shuffles once on the cell key; per-bucket work is bounded by
  * point density, not corpus size. The exact distance predicate then
  * drops corner candidates.
  *
  * Determinism: cell arithmetic is floor over IEEE doubles and the
  * predicate is pure arithmetic + sqrt (correctly rounded per
  * IEEE 754) — bit-reproducible in any engine, so the DuckDB oracle
  * can verify with a naive formulation.
  */
object SpatialJoin {

  private def cell(c: Column, size: Double): Column =
    floor(c / size).cast("long")

  /** (left idL, right idR, dist) for every pair within `radiusDeg`.
    * Inputs need (id, lon, lat) columns named per the parameters. */
  def withinDistance(left: DataFrame, right: DataFrame,
      idL: String, idR: String,
      lonCol: String, latCol: String,
      radiusDeg: Double): DataFrame = {
    require(radiusDeg > 0, "radiusDeg must be positive")
    val probes = left.select(col(idL), col(lonCol).as("__llon"),
        col(latCol).as("__llat"))
      .withColumn("__dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__dy", explode(array(lit(-1), lit(0), lit(1))))
      .select(col(idL), col("__llon"), col("__llat"),
        (cell(col("__llon"), radiusDeg) + col("__dx")).as("__cx"),
        (cell(col("__llat"), radiusDeg) + col("__dy")).as("__cy"))
    val build = right.select(col(idR), col(lonCol).as("__rlon"),
        col(latCol).as("__rlat"),
        cell(col(lonCol), radiusDeg).as("__cx"),
        cell(col(latCol), radiusDeg).as("__cy"))
    val dx = col("__llon") - col("__rlon")
    val dy = col("__llat") - col("__rlat")
    val dist2 = dx * dx + dy * dy
    // no dedupe needed: a build row lives in exactly ONE cell and the 9
    // probe keys per left row are pairwise distinct, so each (left,
    // right) pair can meet through at most one shared key
    probes.join(build, Seq("__cx", "__cy"))
      .filter(dist2 <= lit(radiusDeg * radiusDeg))
      .select(col(idL), col(idR), sqrt(dist2).as("dist"))
  }

  /** Reference naive form (cross join + filter) for the equivalence
    * spec — do not use at scale. */
  private[graft] def withinDistanceNaive(left: DataFrame, right: DataFrame,
      idL: String, idR: String,
      lonCol: String, latCol: String,
      radiusDeg: Double): DataFrame = {
    val l = left.select(col(idL), col(lonCol).as("__llon"),
      col(latCol).as("__llat"))
    val r = right.select(col(idR), col(lonCol).as("__rlon"),
      col(latCol).as("__rlat"))
    val dx = col("__llon") - col("__rlon")
    val dy = col("__llat") - col("__rlat")
    val dist2 = dx * dx + dy * dy
    l.crossJoin(r).filter(dist2 <= lit(radiusDeg * radiusDeg))
      .select(col(idL), col(idR), sqrt(dist2).as("dist"))
  }

  /** Point-in-convex-polygon join — the PostGIS ST_Contains shape the
    * reference delegates ("which region does each point fall in").
    * Polygons arrive as an array<struct<x,y>> vertex column in CCW
    * order; a point is inside (boundary-inclusive) iff every edge's
    * cross product (b−a) × (p−a) is >= 0.
    *
    * Scale design: same never-a-cross-join scheme as withinDistance —
    * the POLYGON side explodes into its bbox's grid cells (bounded by
    * bbox area / cellSize²; size cells to the typical polygon), the
    * point side keys into its single cell, the join shuffles once on
    * the cell key, and the exact edge test runs on co-located
    * candidates only. A point's cell is unique, so no pair dedupe is
    * needed. Convex-only: concave polygons need a triangulation pass
    * upstream (each triangle is convex), which keeps the per-row test
    * branch-free — the right trade for codegen.
    *
    * Determinism: the edge test is the same multiply-subtract tree in
    * both engines over identical doubles — bit-reproducible, so the
    * oracle can brute-force cross join + the same sign tests. */
  def pointInPolygon(points: DataFrame, polys: DataFrame,
      idP: String, idG: String,
      lonCol: String, latCol: String, vertsCol: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val xs = transform(col(vertsCol), v => v("x"))
    val ys = transform(col(vertsCol), v => v("y"))
    val build = polys.select(col(idG), col(vertsCol),
        cell(array_min(xs), cellSize).as("__cx0"),
        cell(array_max(xs), cellSize).as("__cx1"),
        cell(array_min(ys), cellSize).as("__cy0"),
        cell(array_max(ys), cellSize).as("__cy1"))
      .withColumn("__cx", explode(sequence(col("__cx0"), col("__cx1"))))
      .withColumn("__cy", explode(sequence(col("__cy0"), col("__cy1"))))
      .select(col(idG), col(vertsCol), col("__cx"), col("__cy"))
    val probes = points.select(col(idP), col(lonCol).as("__px"),
      col(latCol).as("__py"),
      cell(col(lonCol), cellSize).as("__cx"),
      cell(col(latCol), cellSize).as("__cy"))
    val n = size(col(vertsCol))
    val inside = forall(sequence(lit(0), n - 1), i => {
      val a = element_at(col(vertsCol), i + 1)
      val b = element_at(col(vertsCol), pmod(i + 1, n) + 1)
      (b("x") - a("x")) * (col("__py") - a("y")) -
        (b("y") - a("y")) * (col("__px") - a("x")) >= 0
    })
    probes.join(build, Seq("__cx", "__cy"))
      .filter(inside)
      .select(col(idP), col(idG))
  }

  /** Great-circle distance in km (haversine, mean Earth radius).
    * Metric truth for geo use; NOT oracle-hashed (sin/cos are
    * libm-dependent) — pinned by spec against known city distances. */
  def haversineKm(lon1: Column, lat1: Column,
      lon2: Column, lat2: Column): Column = {
    val toRad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * toRad
    val dLon = (lon2 - lon1) * toRad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) * pow(sin(dLon / 2), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }
}
