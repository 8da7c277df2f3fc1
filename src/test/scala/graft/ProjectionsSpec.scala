package graft

import graft.expressions.{Projections, UtmProjection}
import graft.expressions.Projections._
import org.apache.spark.sql.functions._

/** The generalized projection engine, pinned WITHOUT memorized ground
  * truth — every assertion is a mathematical invariant of the
  * projection definitions themselves:
  *  - natural origins map exactly to (fe, fn) (definitional);
  *  - forward∘inverse is the identity to < 1e-9 deg over in-zone grids;
  *  - the generalized TM at UTM parameters agrees with the proven
  *    UtmProjection Krüger implementation to < 1e-6 m;
  *  - LCC scale factor is exactly 1 on both standard parallels
  *    (the defining property of the 2SP form);
  *  - Helmert forward∘inverse is the identity (exact algebraic
  *    inverse), geodetic↔geocentric round-trips close;
  *  - the Column-level stTransform dispatch reaches every registry
  *    code and round-trips through 4326.
  */
class ProjectionsSpec extends SparkSpec {

  private def approx(a: Double, b: Double, tol: Double): Unit =
    math.abs(a - b) should be < tol

  test("natural origins map exactly to false easting/northing") {
    // Lambert-93: (3E, 46.5N) -> (700000, 6600000) by definition
    val (xL, yL) = registry(2154).forward(3.0, 46.5)
    approx(xL, 700000.0, 1e-6); approx(yL, 6600000.0, 1e-6)
    // NZTM: (173E, 0N) -> (1600000, 10000000)
    val (xN, yN) = registry(2193).forward(173.0, 0.0)
    approx(xN, 1600000.0, 1e-6); approx(yN, 10000000.0, 1e-6)
    // OSGB (datum-local): (-2, 49) -> (400000, -100000)
    val (xO, yO) = registry(27700).forward(-2.0, 49.0)
    approx(xO, 400000.0, 1e-6); approx(yO, -100000.0, 1e-6)
    // ETRS89 LCC: (10E, 52N) -> (4000000, 2800000)
    val (xE, yE) = registry(3034).forward(10.0, 52.0)
    approx(xE, 4000000.0, 1e-6); approx(yE, 2800000.0, 1e-6)
    // ETRS89-LAEA: (10E, 52N) -> (4321000, 3210000) by definition
    val (xA, yA) = registry(3035).forward(10.0, 52.0)
    approx(xA, 4321000.0, 1e-6); approx(yA, 3210000.0, 1e-6)
  }

  test("LAEA reproduces the published EPSG/IOGP test vector " +
      "(Guidance Note 7-2, ETRS89-LAEA worked example)") {
    // 50°N 5°E -> E 3962799.45, N 2999718.85 (published to cm)
    val (x, y) = registry(3035).forward(5.0, 50.0)
    approx(x, 3962799.45, 0.01)
    approx(y, 2999718.85, 0.01)
    // and the inverse recovers the geodetic point
    val (lon, lat) = registry(3035).inverse(3962799.45, 2999718.85)
    approx(lon, 5.0, 1e-7); approx(lat, 50.0, 1e-7)
  }

  test("LAEA area scale is exactly 1 (the defining equal-area " +
      "invariant), checked against the ellipsoid's area element") {
    val crs = registry(3035)
    val a = crs.ell.a; val e2 = crs.ell.e2
    val h = 1e-4 // deg, central differences
    for ((lon, lat) <- Seq((10.0, 52.0), (25.0, 40.0), (-8.0, 62.0),
        (5.0, 50.0), (31.0, 68.0))) {
      val (xe, ye) = crs.forward(lon + h, lat)
      val (xw, yw) = crs.forward(lon - h, lat)
      val (xn, yn) = crs.forward(lon, lat + h)
      val (xs, ys) = crs.forward(lon, lat - h)
      val jac = math.abs(((xe - xw) * (yn - ys) - (xn - xs) * (ye - yw)) /
        (4.0 * h * h)) // map area per deg^2
      val s = math.sin(math.toRadians(lat))
      val ellArea = a * a * (1.0 - e2) * math.cos(math.toRadians(lat)) /
        math.pow(1.0 - e2 * s * s, 2.0) *
        math.pow(math.Pi / 180.0, 2.0)
      withClue(s"($lon,$lat): ") {
        math.abs(jac / ellArea - 1.0) should be < 1e-6
      }
    }
  }

  test("Albers (EPSG:3577): origin maps to FE/FN by definition, " +
      "k = 1 EXACTLY on both standard parallels") {
    val crs = registry(3577)
      .asInstanceOf[Projections.AlbersEqualAreaConic]
    // the natural origin (0S 132E) maps to (FE, FN) by construction
    val (x0, y0) = crs.forward(132.0, 0.0)
    approx(x0, 0.0, 1e-6); approx(y0, 0.0, 1e-6)
    // the cone touches the ellipsoid on the standard parallels:
    // parallel scale k is exactly 1 there (Snyder 14-16) and > 1
    // between never — k dips below 1 between the parallels
    approx(crs.scaleAt(-18.0), 1.0, 1e-12)
    approx(crs.scaleAt(-36.0), 1.0, 1e-12)
    crs.scaleAt(-27.0) should be < 1.0
    crs.scaleAt(-10.0) should be > 1.0
    crs.scaleAt(-43.0) should be > 1.0
  }

  test("Albers area scale is exactly 1 (the defining equal-area " +
      "invariant), checked against the ellipsoid's area element") {
    val crs = registry(3577)
    val a = crs.ell.a; val e2 = crs.ell.e2
    val h = 1e-4 // deg, central differences
    for ((lon, lat) <- Seq((132.0, -25.0), (116.0, -32.0),
        (146.0, -42.0), (142.0, -11.0), (153.0, -28.0))) {
      val (xe, ye) = crs.forward(lon + h, lat)
      val (xw, yw) = crs.forward(lon - h, lat)
      val (xn, yn) = crs.forward(lon, lat + h)
      val (xs, ys) = crs.forward(lon, lat - h)
      val jac = math.abs(((xe - xw) * (yn - ys) - (xn - xs) * (ye - yw)) /
        (4.0 * h * h))
      val s = math.sin(math.toRadians(lat))
      val ellArea = a * a * (1.0 - e2) * math.cos(math.toRadians(lat)) /
        math.pow(1.0 - e2 * s * s, 2.0) *
        math.pow(math.Pi / 180.0, 2.0)
      withClue(s"($lon,$lat): ") {
        math.abs(jac / ellArea - 1.0) should be < 1e-6
      }
    }
  }

  test("forward/inverse round-trips close over in-range grids") {
    val grids = Map(
      27700 -> (for (lo <- -7 to 1; la <- 50 to 60) yield (lo.toDouble, la.toDouble)),
      2154 -> (for (lo <- -4 to 8; la <- 42 to 51) yield (lo.toDouble, la.toDouble)),
      2193 -> (for (lo <- 167 to 178; la <- -46 to -35) yield (lo.toDouble, la.toDouble)),
      3034 -> (for (lo <- -10 to 30 by 4; la <- 36 to 70 by 4) yield (lo.toDouble, la.toDouble)),
      25832 -> (for (lo <- 6 to 12; la <- 47 to 55) yield (lo.toDouble, la.toDouble)),
      5243 -> (for (lo <- 6 to 15; la <- 47 to 55) yield (lo.toDouble, la.toDouble)),
      3035 -> (for (lo <- -10 to 30 by 4; la <- 35 to 70 by 5) yield (lo.toDouble, la.toDouble)),
      3577 -> (for (lo <- 113 to 154 by 4; la <- -44 to -9 by 4) yield (lo.toDouble, la.toDouble)))
    for ((srid, pts) <- grids; (lon, lat) <- pts) {
      val (x, y) = Projections.forward(lon, lat, srid)
      val (lon2, lat2) = Projections.inverse(x, y, srid)
      withClue(s"srid=$srid lon=$lon lat=$lat -> ($x,$y): ") {
        // 2e-8 deg ~ 2 mm: datum-shifted round trips discard the
        // ellipsoidal height the shift introduces (the geometry model
        // is 2D), which costs ~1 mm at OSGB's shift magnitude
        approx(lon2, lon, 2e-8)
        approx(lat2, lat, 2e-8)
      }
    }
  }

  test("generalized TM at UTM-32N parameters matches UtmProjection") {
    val tm = TransverseMercator(0.0, 9.0, 0.9996, 500000.0, 0.0, WGS84)
    for (lon <- 6 to 12; lat <- -60 to 80 by 10) {
      val (x, y) = tm.forward(lon.toDouble, lat.toDouble)
      val ref = UtmProjection.forward(lon.toDouble, lat.toDouble, 32632)
      withClue(s"($lon,$lat): ") {
        approx(x, ref.getDouble(0), 1e-6)
        approx(y, ref.getDouble(1), 1e-6)
      }
    }
  }

  test("LCC scale factor is 1 exactly on both standard parallels") {
    val l93 = registry(2154).asInstanceOf[LambertConformalConic2SP]
    approx(l93.scaleAt(49.0), 1.0, 1e-12)
    approx(l93.scaleAt(44.0), 1.0, 1e-12)
    // and > 1 outside / < 1 between (conic distortion signature)
    l93.scaleAt(46.5) should be < 1.0
    l93.scaleAt(52.0) should be > 1.0
    l93.scaleAt(41.0) should be > 1.0
  }

  test("Helmert forward∘inverse is the identity; geodetic↔geocentric closes") {
    val h = registry(27700).datum.get
    for ((x, y, z) <- Seq((3980000.0, -100000.0, 4970000.0),
        (3875000.0, 116000.0, 5040000.0))) {
      val (fx, fy, fz) = h.forward(x, y, z)
      val (bx, by, bz) = h.inverse(fx, fy, fz)
      approx(bx, x, 1e-6); approx(by, y, 1e-6); approx(bz, z, 1e-6)
    }
    for ((lon, lat) <- Seq((-1.5, 52.0), (174.0, -41.0), (3.0, 46.5))) {
      val (x, y, z) = geodeticToXyz(lon, lat, WGS84)
      val (lon2, lat2) = xyzToGeodetic(x, y, z, WGS84)
      approx(lon2, lon, 1e-11); approx(lat2, lat, 1e-11)
    }
  }

  test("OSGB datum shift moves coordinates by the expected ~100 m class") {
    // same lon/lat interpreted WGS84 vs OSGB36 differs by ~50-120 m in
    // Great Britain — the datum shift must be present and bounded
    val withDatum = Projections.forward(-1.5, 52.5, 27700)
    val noDatum = registry(27700).forward(-1.5, 52.5)
    val d = math.hypot(withDatum._1 - noDatum._1, withDatum._2 - noDatum._2)
    d should be > 30.0
    d should be < 300.0
  }

  test("stTransform dispatches every registry SRID and round-trips") {
    import graft.functions.GeomFunctions._
    val s = spark
    import s.implicits._
    val pts = Seq((-1.5, 52.5, 27700), (2.35, 48.85, 2154),
      (174.78, -41.29, 2193), (10.0, 50.0, 3034), (9.5, 51.0, 25832),
      (10.5, 51.0, 5243))
    val df = pts.toDF("lon", "lat", "srid")
      .withColumn("g", stPoint(col("lon"), col("lat"), lit(4326)))
      .withColumn("p", stTransform(col("g"), col("srid")))
      .withColumn("back", stTransform(col("p"), lit(4326)))
    val rows = df.select(col("lon"), col("lat"),
      col("p")("srid"), col("back")("x"), col("back")("y")).collect()
    rows.foreach { r =>
      r.getInt(2) should be > 0 // projected, not NULL
      approx(r.getDouble(3), r.getDouble(0), 2e-8)
      approx(r.getDouble(4), r.getDouble(1), 2e-8)
    }
    // unknown SRID still NULLs out
    val unk = Seq((1.0, 1.0)).toDF("lon", "lat")
      .select(stTransform(stPoint(col("lon"), col("lat")), lit(999999))
        .as("g")).head()
    unk.isNullAt(0) shouldBe true
  }
}
