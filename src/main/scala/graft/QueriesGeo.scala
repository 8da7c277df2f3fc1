package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.Projections
import graft.expressions.Projections.{AlbersEqualAreaConic, LambertAzimuthalEqualArea, LambertConformalConic2SP, TransverseMercator}
import graft.functions.GeomFunctions

/** Arbitrary-SRID reprojection gate coverage (r5 VERDICT "what's
  * missing" #3, now closed): a forward-projection matrix over every
  * EPSG code in [[Projections.registry]], checked against a DuckDB
  * oracle that restates the full math — generalized Krüger series,
  * ellipsoidal Lambert Conformal Conic, Lambert Azimuthal Equal-Area,
  * Albers Equal-Area Conic, geodetic↔geocentric, the position-vector
  * Helmert, and the 8-round geodetic-latitude fixpoint — with every
  * projection constant INTERPOLATED FROM THE ENGINE'S OWN REGISTRY
  * INSTANCES (forwardConstants), so oracle and engine cannot drift.
  *
  * Outputs are millimeter-scaled BIGINTs: the one float hazard is
  * cross-engine libm trig noise (~1e-15 relative → ~1e-6 mm at
  * projected magnitudes), six orders below the rounding granularity.
  * Inverse maps are pinned by ProjectionsSpec round-trips (an
  * engine-side identity needs no second engine). Map-only at any
  * scale — reprojection is a per-row scalar. */
object QueriesGeo {

  /** Deterministic in-range probe grid per SRID: 10 points derived
    * from k = 0..9 with double-literal arithmetic both engines share
    * bit for bit. */
  private val probes: Seq[(Int, Double, Double, Double, Double)] = Seq(
    // (srid, lon0, lonStep, lat0, latStep)
    (2154, -4.0, 1.1, 42.2, 0.9),   // Lambert-93 (LCC, GRS80)
    (2193, 167.0, 1.1, -46.0, 1.0), // NZTM (TM, GRS80)
    (3034, -8.0, 3.7, 37.0, 3.3),   // ETRS89 LCC Europe
    (5243, 6.3, 0.9, 47.3, 0.8),    // ETRS89 LCC Germany
    (25832, 6.1, 0.6, 47.2, 0.8),   // ETRS89 / UTM 32N (TM, GRS80)
    (27700, -6.0, 0.7, 50.2, 0.9),  // OSGB (TM, Airy 1830 + Helmert)
    (3035, -9.0, 3.9, 36.1, 3.2),   // ETRS89-LAEA Europe grid (GRS80)
    (3577, 116.0, 3.4, -38.0, 2.7)) // GDA94 Australian Albers (AEA)

  private def q165SridMatrix(s: SparkSession, dir: String): DataFrame = {
    val frames = probes.map { case (srid, lo0, loS, la0, laS) =>
      val k = col("id")
      val lon = lit(lo0) + k.cast("double") * lit(loS)
      val lat = lit(la0) + k.cast("double") * lit(laS)
      val geom = GeomFunctions.stTransform(
        GeomFunctions.stPoint(lon, lat, lit(4326)), lit(srid))
      s.range(10).select(
        lit(srid.toLong).as("srid"), k.as("k"),
        floor(geom("x") * 1000.0 + 0.5).cast("long").as("x_mm"),
        floor(geom("y") * 1000.0 + 0.5).cast("long").as("y_mm"))
    }
    frames.reduce(_ unionAll _).orderBy(col("srid"), col("k"))
  }

  // ------------------------------------------------- oracle generation

  private def d(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.contains("E")) s.replace("E", "e") else s
  }

  /** sinh/cosh via exp (DuckDB 1.0 has neither); atanh via ln. */
  private def sh(u: String) = s"((exp($u) - exp(-($u))) / 2.0)"
  private def ch(u: String) = s"((exp($u) + exp(-($u))) / 2.0)"
  private def ath(v: String) = s"(0.5 * ln((1.0 + $v) / (1.0 - $v)))"

  /** Krüger forward on a datum-local lon/lat relation
    * `src(k, lon, lat)` → SELECT k, x, y. */
  private def tmForwardSql(crs: TransverseMercator, src: String): String = {
    val (tsn, a1, a2, a3, kA, fe, fnEff, lon0) = crs.forwardConstants
    s"""SELECT k,
       |  ${d(fe)} + ${d(kA)} * (etap
       |    + ${d(a1)} * cos(2.0*xip) * ${sh("2.0*etap")}
       |    + ${d(a2)} * cos(4.0*xip) * ${sh("4.0*etap")}
       |    + ${d(a3)} * cos(6.0*xip) * ${sh("6.0*etap")}) AS x,
       |  ${d(fnEff)} + ${d(kA)} * (xip
       |    + ${d(a1)} * sin(2.0*xip) * ${ch("2.0*etap")}
       |    + ${d(a2)} * sin(4.0*xip) * ${ch("4.0*etap")}
       |    + ${d(a3)} * sin(6.0*xip) * ${ch("6.0*etap")}) AS y
       |FROM (
       |  SELECT k, atan2(t, cos(lam)) AS xip,
       |    ${ath(s"sin(lam) / sqrt(1.0 + t*t)")} AS etap
       |  FROM (
       |    SELECT k, lam, ${sh("u")} AS t
       |    FROM (
       |      SELECT k, radians(lon - ${d(lon0)}) AS lam,
       |        ${ath("sp")} - ${d(tsn)} * ${ath(s"${d(tsn)} * sp")} AS u
       |      FROM (SELECT k, lon, sin(radians(lat)) AS sp
       |            FROM $src))))""".stripMargin
  }

  /** Snyder LCC-2SP forward on `src(k, lon, lat)` → SELECT k, x, y. */
  private def lccForwardSql(crs: LambertConformalConic2SP,
      src: String): String = {
    val (nc, aF, rho0, e, lon0, fe, fn) = crs.forwardConstants
    s"""SELECT k,
       |  ${d(fe)} + rho * sin(th) AS x,
       |  ${d(fn)} + ${d(rho0)} - rho * cos(th) AS y
       |FROM (
       |  SELECT k, ${d(nc)} * radians(lon - ${d(lon0)}) AS th,
       |    ${d(aF)} * pow(
       |      tan(pi()/4.0 - radians(lat)/2.0)
       |        / pow((1.0 - ${d(e)} * sin(radians(lat)))
       |              / (1.0 + ${d(e)} * sin(radians(lat))), ${d(e)}/2.0),
       |      ${d(nc)}) AS rho
       |  FROM $src)""".stripMargin
  }

  /** Snyder LAEA forward on `src(k, lon, lat)` → SELECT k, x, y —
    * the same op tree as LambertAzimuthalEqualArea.forward, constants
    * exported from the instance. */
  private def laeaForwardSql(crs: LambertAzimuthalEqualArea,
      src: String): String = {
    val (e, e2, qp, sb1, cb1, rq, dd, lon0, fe, fn) = crs.forwardConstants
    s"""SELECT k,
       |  ${d(fe)} + b * ${d(dd)} * cos(beta) * sin(lam) AS x,
       |  ${d(fn)} + (b / ${d(dd)}) * (${d(cb1)} * sin(beta)
       |    - ${d(sb1)} * cos(beta) * cos(lam)) AS y
       |FROM (
       |  SELECT k, lam, beta,
       |    ${d(rq)} * sqrt(2.0 / (1.0 + ${d(sb1)} * sin(beta)
       |      + ${d(cb1)} * cos(beta) * cos(lam))) AS b
       |  FROM (
       |    SELECT k, radians(lon - ${d(lon0)}) AS lam,
       |      asin((1.0 - ${d(e2)}) * (sp / (1.0 - ${d(e2)} * sp * sp)
       |        - 1.0 / (2.0 * ${d(e)})
       |          * ln((1.0 - ${d(e)} * sp) / (1.0 + ${d(e)} * sp)))
       |        / ${d(qp)}) AS beta
       |    FROM (SELECT k, lon, sin(radians(lat)) AS sp FROM $src)))"""
      .stripMargin
  }

  /** Snyder Albers forward on `src(k, lon, lat)` → SELECT k, x, y —
    * the same op tree as AlbersEqualAreaConic.forward, constants
    * exported from the instance. Shares LAEA's authalic-q subexpression
    * and LCC's cone geometry (ρ·sinθ / ρ0 − ρ·cosθ). */
  private def aeaForwardSql(crs: AlbersEqualAreaConic,
      src: String): String = {
    val (e, e2, nc, bigC, rho0, a, lon0, fe, fn) = crs.forwardConstants
    s"""SELECT k,
       |  ${d(fe)} + rho * sin(theta) AS x,
       |  ${d(fn)} + ${d(rho0)} - rho * cos(theta) AS y
       |FROM (
       |  SELECT k,
       |    ${d(nc)} * radians(lon - ${d(lon0)}) AS theta,
       |    ${d(a)} * sqrt(${d(bigC)} - ${d(nc)}
       |      * ((1.0 - ${d(e2)}) * (sp / (1.0 - ${d(e2)} * sp * sp)
       |        - 1.0 / (2.0 * ${d(e)})
       |          * ln((1.0 - ${d(e)} * sp) / (1.0 + ${d(e)} * sp)))))
       |      / ${d(nc)} AS rho
       |  FROM (SELECT k, lon, sin(radians(lat)) AS sp FROM $src))"""
      .stripMargin
  }

  /** WGS84 lon/lat → datum-local lon/lat via geocentric + Helmert +
    * the 8-round geodetic-latitude fixpoint on the target ellipsoid
    * (mirrors Projections.geodeticToXyz/Helmert.forward/xyzToGeodetic
    * round for round). `src(k, lon, lat)` → SELECT k, lon, lat. */
  private def datumShiftSql(h: Projections.Helmert,
      ell: Projections.Ellipsoid, src: String): String = {
    val w = Projections.WGS84
    val s1 = d(1.0 + h.s)
    val iter = (1 to 8).foldLeft("phi0") { (prev, i) =>
      s"atan2(z2 + ${d(ell.e2)} * (${d(ell.a)} / sqrt(1.0 - ${d(ell.e2)} " +
        s"* sin($prev) * sin($prev))) * sin($prev), p)"
    }
    s"""SELECT k, degrees(atan2(y2, x2)) AS lon, degrees($iter) AS lat
       |FROM (
       |  SELECT k, x2, y2, z2, sqrt(x2*x2 + y2*y2) AS p,
       |    atan2(z2, sqrt(x2*x2 + y2*y2) * ${d(1.0 - ell.e2)}) AS phi0
       |  FROM (
       |    SELECT k,
       |      ${d(h.tx)} + $s1 * (gx - ${d(h.rz)} * gy + ${d(h.ry)} * gz) AS x2,
       |      ${d(h.ty)} + $s1 * (${d(h.rz)} * gx + gy - ${d(h.rx)} * gz) AS y2,
       |      ${d(h.tz)} + $s1 * (-(${d(h.ry)}) * gx + ${d(h.rx)} * gy + gz) AS z2
       |    FROM (
       |      SELECT k,
       |        nu * cos(radians(lat)) * cos(radians(lon)) AS gx,
       |        nu * cos(radians(lat)) * sin(radians(lon)) AS gy,
       |        nu * ${d(1.0 - w.e2)} * sin(radians(lat)) AS gz
       |      FROM (
       |        SELECT k, lon, lat,
       |          ${d(w.a)} / sqrt(1.0 - ${d(w.e2)} * sin(radians(lat))
       |            * sin(radians(lat))) AS nu
       |        FROM $src))))""".stripMargin
  }

  private val q165Sql: String = {
    val parts = probes.map { case (srid, lo0, loS, la0, laS) =>
      val pts =
        s"""(SELECT k, ${d(lo0)} + k * ${d(loS)} AS lon,
           |  ${d(la0)} + k * ${d(laS)} AS lat
           |FROM (SELECT CAST(range AS BIGINT) AS k FROM range(0, 10)))"""
          .stripMargin
      val crs = Projections.registry(srid)
      val local = crs.datum match {
        case None => pts
        case Some(h) => s"(${datumShiftSql(h, crs.ell, pts)})"
      }
      val proj = crs match {
        case tm: TransverseMercator => tmForwardSql(tm, local)
        case lcc: LambertConformalConic2SP => lccForwardSql(lcc, local)
        case laea: LambertAzimuthalEqualArea => laeaForwardSql(laea, local)
        case aea: AlbersEqualAreaConic => aeaForwardSql(aea, local)
      }
      s"""SELECT CAST($srid AS BIGINT) AS srid, k,
         |  CAST(floor(x * 1000.0 + 0.5) AS BIGINT) AS x_mm,
         |  CAST(floor(y * 1000.0 + 0.5) AS BIGINT) AS y_mm
         |FROM ($proj)""".stripMargin
    }
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY srid, k")
  }

  /** The fixed-point iteration above folds to a deeply nested atan2
    * chain; it is still one scalar expression per row. */

  // -------------------------------------------------------------- q188
  /** Geohash spatial bucketing (GeomFunctions.geohashEncode): per-
    * customer deterministic lat/lon (exact dyadic fractions — the
    * synthesis arithmetic is bit-identical cross-engine), encoded at
    * precision 5 and 7, plus the prefix-census that is the actual
    * 100 TB use (GROUP BY a geohash prefix = hierarchical spatial
    * partitioning with zero extra machinery). The oracle replays the
    * same binary-expansion bit assembly in SQL — both sides are
    * generated from one Scala loop, so engine and oracle cannot
    * drift. Map-only encode + one small-key census join. */
  private def q188Geohash(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val k = col("c_custkey")
    val lat = lit(-90.0) + (k % 180).cast("double") +
      (k % 64).cast("double") / lit(64.0)
    val lon = lit(-180.0) + ((k * 7) % 360).cast("double") +
      ((k * 31) % 128).cast("double") / lit(128.0)
    val enc = c.select(k.as("c_custkey"), lat.as("lat"), lon.as("lon"),
      GeomFunctions.geohashEncode(lat, lon, 5).as("gh5"),
      GeomFunctions.geohashEncode(lat, lon, 7).as("gh7"))
    val census = enc.groupBy(substring(col("gh5"), 1, 2).as("gh2"))
      .agg(count(lit(1)).as("cell_n"))
    enc.join(census, substring(col("gh5"), 1, 2) === census("gh2"))
      .select(col("c_custkey"), col("lat"), col("lon"), col("gh5"),
        col("gh7"), col("gh2"), col("cell_n"))
      .orderBy(col("c_custkey"))
  }

  /** SQL restatement of the bit assembly, generated by the same loop
    * shape as the engine's expression tree. `intsSql` scales the
    * coordinates to cell integers; `charsSql` assembles the base-32
    * chars from named integer columns. */
  private def geohashIntsSql(lat: String, lon: String, precision: Int,
      sfx: String): String = {
    val bits = precision * 5
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    s"""CAST(least(floor(($lon + 180.0) / 360.0 * ${1L << lonBits}.0),
       |      ${(1L << lonBits) - 1}.0) AS BIGINT) AS loni$sfx,
       |    CAST(least(floor(($lat + 90.0) / 180.0 * ${1L << latBits}.0),
       |      ${(1L << latBits) - 1}.0) AS BIGINT) AS lati$sfx""".stripMargin
  }

  private def geohashCharsSql(precision: Int, sfx: String): String = {
    val bits = precision * 5
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    (0 until precision).map { c =>
      val idx = (0 until 5).map { b =>
        val m = 5 * c + b
        if (m % 2 == 0)
          s"((loni$sfx >> ${lonBits - 1 - m / 2}) & 1) * ${1 << (4 - b)}"
        else
          s"((lati$sfx >> ${latBits - 1 - (m - 1) / 2}) & 1) * ${1 << (4 - b)}"
      }.mkString(" + ")
      s"substr('${GeomFunctions.GeohashAlphabet}', CAST(($idx) AS INT) + 1, 1)"
    }.mkString(" || ")
  }

  private val q188Sql: String = {
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    -90.0 + (c_custkey % 180) + (c_custkey % 64) / 64.0 AS lat,
       |    -180.0 + ((c_custkey * 7) % 360)
       |      + ((c_custkey * 31) % 128) / 128.0 AS lon
       |  FROM customer),
       |ints AS (
       |  SELECT c_custkey, lat, lon,
       |    ${geohashIntsSql("lat", "lon", 5, "5")},
       |    ${geohashIntsSql("lat", "lon", 7, "7")}
       |  FROM pts),
       |enc AS (
       |  SELECT c_custkey, lat, lon,
       |    ${geohashCharsSql(5, "5")} AS gh5,
       |    ${geohashCharsSql(7, "7")} AS gh7
       |  FROM ints),
       |census AS (
       |  SELECT substr(gh5, 1, 2) AS gh2, count(*) AS cell_n
       |  FROM enc GROUP BY 1)
       |SELECT c_custkey, lat, lon, gh5, gh7, gh2, cell_n
       |FROM enc JOIN census ON substr(enc.gh5, 1, 2) = census.gh2
       |ORDER BY c_custkey""".stripMargin
  }

  // -------------------------------------------------------------- q352
  /** Nearest-site assignment with EXACT integer geometry: events as
    * 2-D points (value cents × user id), eight literal sites,
    * assignment = argmin of SQUARED integer distance with ties to the
    * smaller site id — voronoi-cell counting with no sqrt, no float
    * compare, the k-assignment primitive (q32's centroid argmax) in
    * its exactly-decidable integer form. Sites broadcast; one map
    * pass + one aggregate. */
  private def q352NearestSite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sites = Seq((0L, 500L, 25L), (1L, 1500L, 25L), (2L, 2500L, 75L),
      (3L, 3500L, 75L), (4L, 500L, 125L), (5L, 1500L, 125L),
      (6L, 2500L, 25L), (7L, 3500L, 125L)).toDF("site", "sx", "sy")
    val pts = Tables.load(s, dir, "events")
      .select((col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("px"), (col("user_id") % 150).as("py"))
    val assigned = pts.crossJoin(broadcast(sites))
      .withColumn("d2",
        (col("px") - col("sx")) * (col("px") - col("sx")) +
          (col("py") - col("sy")) * (col("py") - col("sy")))
      .groupBy(col("px"), col("py"))
      .agg(min(struct(col("d2"), col("site"))).as("__m"))
      .select(col("__m.site").as("site"), col("__m.d2").as("d2"))
    assigned.groupBy(col("site"))
      .agg(count(lit(1)).as("n_points"), sum(col("d2")).as("sum_d2"),
        min(col("d2")).as("min_d2"))
      .orderBy(col("site"))
  }

  private val q352Sql =
    """WITH sites(site, sx, sy) AS (VALUES
      |  (CAST(0 AS BIGINT), CAST(500 AS BIGINT), CAST(25 AS BIGINT)),
      |  (1, 1500, 25), (2, 2500, 75), (3, 3500, 75), (4, 500, 125),
      |  (5, 1500, 125), (6, 2500, 25), (7, 3500, 125)),
      |pts AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS px,
      |    user_id % 150 AS py
      |  FROM events),
      |d AS (
      |  SELECT px, py, site,
      |    (px - sx) * (px - sx) + (py - sy) * (py - sy) AS d2
      |  FROM pts CROSS JOIN sites),
      |best AS (
      |  SELECT px, py, min(d2) AS md FROM d GROUP BY 1, 2),
      |asg AS (
      |  SELECT d.px, d.py, min(d.site) AS site, b.md AS d2
      |  FROM d JOIN best b ON b.px = d.px AND b.py = d.py
      |    AND d.d2 = b.md
      |  GROUP BY 1, 2, 4)
      |SELECT site, count(*) AS n_points,
      |  CAST(sum(d2) AS BIGINT) AS sum_d2, min(d2) AS min_d2
      |FROM asg GROUP BY 1 ORDER BY site""".stripMargin

  // -------------------------------------------------------------- q374
  /** Hex-WKB point decode (GeomFunctions.stPointFromWkbHex over the
    * codegen'd WkbPointExpression) — closes the `force_the_geom`
    * passthrough loop (quirk Q12): ingest-shaped hex blobs are
    * synthesized per row by WkbPointUtil.encodeHex from deterministic
    * customer-key coordinates, MIXING the layouts a real feed mixes —
    * even keys little-endian / odd big-endian, every 4th key EWKB
    * with an embedded SRID 3857 tag, the rest plain WKB adopting the
    * column default 4326 — then decoded back to st_x/st_y/st_srid.
    * The oracle recomputes the coordinates directly from c_custkey
    * (the encode→decode round trip is bit-lossless, so the doubles
    * match EXACTLY, no micro scaling); absolute byte layout (not just
    * encoder/decoder inverse-consistency) is pinned by WkbSpec's
    * published PostGIS test vectors. Map-only scalar at any scale. */
  private def q374WkbDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.load(s, dir, "customer")
      .select(col("c_custkey").cast("long"),
        (((col("c_custkey") * 7) % 3600 - 1800) / lit(10.0)),
        (((col("c_custkey") * 13) % 1700 - 850) / lit(10.0)))
      .as[(Long, Double, Double)]
    val hexed = pts.map { case (k, lon, lat) =>
      val srid = if (k % 4 == 0) 3857 else -1
      (k, graft.expressions.WkbPointUtil
        .encodeHex(lon, lat, srid, little = k % 2 == 0))
    }.toDF("c_custkey", "the_geom_hex")
    val g = GeomFunctions.stPointFromWkbHex(col("the_geom_hex"), 4326)
    hexed.select(col("c_custkey"),
        GeomFunctions.stX(g).as("x"), GeomFunctions.stY(g).as("y"),
        GeomFunctions.stSrid(g).as("srid"))
      .orderBy(col("c_custkey"))
  }

  private val q374Sql =
    """SELECT c_custkey,
      |  ((c_custkey * 7) % 3600 - 1800) / 10.0 AS x,
      |  ((c_custkey * 13) % 1700 - 850) / 10.0 AS y,
      |  CAST(CASE WHEN c_custkey % 4 = 0 THEN 3857 ELSE 4326 END
      |    AS INT) AS srid
      |FROM customer ORDER BY c_custkey""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q352_nearest_site" -> (q352NearestSite _),
    "q165_srid_matrix" -> (q165SridMatrix _),
    "q188_geohash" -> (q188Geohash _),
    "q374_wkb_decode" -> (q374WkbDecode _),
  )

  val oracles: Map[String, String] = Map(
    "q165_srid_matrix" -> q165Sql,
    "q188_geohash" -> q188Sql,
    "q352_nearest_site" -> q352Sql,
    "q374_wkb_decode" -> q374Sql,
  )
}
