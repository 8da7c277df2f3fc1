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
