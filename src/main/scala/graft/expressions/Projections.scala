package graft.expressions

/** Generalized map-projection engine — the "arbitrary SRID" extension
  * beyond the 4326/3857/UTM set (reference analogue: the server-side
  * `st_transform(..., srid)` the reference delegates for ANY srid,
  * /root/reference/etl/etl.py:190-192). Public formulations only:
  * Snyder, "Map Projections: A Working Manual" (USGS PP 1395) for the
  * ellipsoidal Lambert Conformal Conic; Karney 2011 / the standard
  * 3rd-order Krüger series for Transverse Mercator (the same series
  * UtmProjection uses, generalized to any ellipsoid + natural-origin
  * offset); the EPSG position-vector 7-parameter Helmert for datum
  * shifts.
  *
  * Everything is pure scalar math over doubles — map-only at any
  * scale, codegen-friendly (invoked from GeomPivotExpression's
  * generated code), no state. Accuracy: TM < 0.1 mm in-zone (3rd-order
  * n-series, n ≤ 0.0017 for all registered ellipsoids); LCC is closed
  * form apart from the 6-round inverse-latitude fixpoint (< 1e-12 rad
  * after 6 rounds); Helmert-based datum shifts carry the usual few-m
  * regional error of single-set Helmert parameters (documented per
  * entry — grid-shift files are out of scope).
  */
object Projections {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    val n: Double = f / (2.0 - f)
  }

  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val GRS80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)

  /** EPSG position-vector 7-parameter Helmert, WGS84 -> local datum
    * (translations m, rotations arc-seconds, scale ppm). */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, ppm: Double) {
    private val SecToRad = math.Pi / (180.0 * 3600.0)
    val rx: Double = rxSec * SecToRad
    val ry: Double = rySec * SecToRad
    val rz: Double = rzSec * SecToRad
    val s: Double = ppm * 1e-6

    /** position-vector forward (WGS84 geocentric -> datum geocentric) */
    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      tx + (1.0 + s) * (x - rz * y + ry * z),
      ty + (1.0 + s) * (rz * x + y - rx * z),
      tz + (1.0 + s) * (-ry * x + rx * y + z))

    /** exact algebraic inverse of `forward` (not the sign-flip
      * approximation): undo translation, then invert the small
      * rotation+scale matrix exactly via Cramer's rule. */
    def inverse(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val ux = (x - tx) / (1.0 + s)
      val uy = (y - ty) / (1.0 + s)
      val uz = (z - tz) / (1.0 + s)
      // solve R v = u with R = [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]
      val det = 1.0 + rx * rx + ry * ry + rz * rz
      val vx = ((1.0 + rx * rx) * ux + (rz + rx * ry) * uy +
        (rx * rz - ry) * uz) / det
      val vy = ((rx * ry - rz) * ux + (1.0 + ry * ry) * uy +
        (ry * rz + rx) * uz) / det
      val vz = ((ry + rx * rz) * ux + (ry * rz - rx) * uy +
        (1.0 + rz * rz) * uz) / det
      (vx, vy, vz)
    }
  }

  /** geodetic (lon/lat deg, h=0) -> geocentric XYZ on `ell` */
  def geodeticToXyz(lonDeg: Double, latDeg: Double,
      ell: Ellipsoid): (Double, Double, Double) = {
    val lam = math.toRadians(lonDeg)
    val phi = math.toRadians(latDeg)
    val sinP = math.sin(phi)
    val nu = ell.a / math.sqrt(1.0 - ell.e2 * sinP * sinP)
    (nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1.0 - ell.e2) * sinP)
  }

  /** geocentric XYZ -> geodetic lon/lat deg on `ell` (h discarded);
    * plain fixed-point latitude iteration, 8 rounds (< 1e-12 rad for
    * surface points). */
  def xyzToGeodetic(x: Double, y: Double, z: Double,
      ell: Ellipsoid): (Double, Double) = {
    val lam = math.atan2(y, x)
    val p = math.sqrt(x * x + y * y)
    var phi = math.atan2(z, p * (1.0 - ell.e2))
    var i = 0
    while (i < 8) {
      val sinP = math.sin(phi)
      val nu = ell.a / math.sqrt(1.0 - ell.e2 * sinP * sinP)
      phi = math.atan2(z + ell.e2 * nu * sinP, p)
      i += 1
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** A projected CRS: datum-local geodetic <-> projected planar.
    * `datum` is the WGS84->local Helmert (None = datum is WGS84 or
    * WGS84-equivalent at this accuracy class: GRS80-based ETRS89 /
    * RGF93 / NZGD2000). */
  sealed trait Crs {
    def ell: Ellipsoid
    def datum: Option[Helmert]
    /** datum-local lon/lat deg -> (x, y) projected */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    /** (x, y) projected -> datum-local lon/lat deg */
    def inverse(x: Double, y: Double): (Double, Double)
  }

  /** Transverse Mercator on the 3rd-order Krüger series, any ellipsoid,
    * natural origin (lat0, lon0), scale k0, false easting/northing.
    * Identical machinery to UtmProjection, generalized: the natural
    * origin's meridian-arc northing is subtracted so lat0 maps to fn. */
  final case class TransverseMercator(lat0Deg: Double, lon0Deg: Double,
      k0: Double, fe: Double, fn: Double, ell: Ellipsoid,
      datum: Option[Helmert] = None) extends Crs {
    private val nn = ell.n
    private val rectA = ell.a / (1.0 + nn) *
      (1.0 + nn * nn / 4.0 + nn * nn * nn * nn / 64.0)
    private val alpha = Array(
      nn / 2.0 - 2.0 / 3.0 * nn * nn + 5.0 / 16.0 * nn * nn * nn,
      13.0 / 48.0 * nn * nn - 3.0 / 5.0 * nn * nn * nn,
      61.0 / 240.0 * nn * nn * nn)
    private val beta = Array(
      nn / 2.0 - 2.0 / 3.0 * nn * nn + 37.0 / 96.0 * nn * nn * nn,
      nn * nn / 48.0 + nn * nn * nn / 15.0,
      17.0 / 480.0 * nn * nn * nn)
    private val delta = Array(
      2.0 * nn - 2.0 / 3.0 * nn * nn - 2.0 * nn * nn * nn,
      7.0 / 3.0 * nn * nn - 8.0 / 5.0 * nn * nn * nn,
      56.0 / 15.0 * nn * nn * nn)
    private val twoSqrtN = 2.0 * math.sqrt(nn) / (1.0 + nn)
    private def atanh(v: Double): Double =
      0.5 * math.log((1.0 + v) / (1.0 - v))

    /** rectified northing coordinate xi of latitude `phi` on the
      * central meridian (lam = 0) */
    private def xiOf(phi: Double): Double = {
      val sinPhi = math.sin(phi)
      val t = math.sinh(atanh(sinPhi) - twoSqrtN * atanh(twoSqrtN * sinPhi))
      val xiP = math.atan(t)
      var xi = xiP
      var j = 1
      while (j <= 3) { xi += alpha(j - 1) * math.sin(2.0 * j * xiP); j += 1 }
      xi
    }
    private val m0 = k0 * rectA * xiOf(math.toRadians(lat0Deg))

    /** Constants an external (SQL) restatement of the forward map
      * needs, derived from THIS instance so the oracle can never
      * drift from the engine: (2√n/(1+n), α1, α2, α3, k0·A,
      * fe, fn − m0, lon0 deg). */
    private[graft] def forwardConstants: (Double, Double, Double, Double,
        Double, Double, Double, Double) =
      (twoSqrtN, alpha(0), alpha(1), alpha(2), k0 * rectA, fe, fn - m0,
        lon0Deg)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg - lon0Deg)
      val sinPhi = math.sin(phi)
      val t = math.sinh(atanh(sinPhi) - twoSqrtN * atanh(twoSqrtN * sinPhi))
      val xiP = math.atan2(t, math.cos(lam))
      val etaP = atanh(math.sin(lam) / math.sqrt(1.0 + t * t))
      var xi = xiP
      var eta = etaP
      var j = 1
      while (j <= 3) {
        xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
        eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
        j += 1
      }
      (fe + k0 * rectA * eta, fn - m0 + k0 * rectA * xi)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - fn + m0) / (k0 * rectA)
      val eta = (x - fe) / (k0 * rectA)
      var xiP = xi
      var etaP = eta
      var j = 1
      while (j <= 3) {
        xiP -= beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
        etaP -= beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 3) { phi += delta(j - 1) * math.sin(2.0 * j * chi); j += 1 }
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      (math.toDegrees(lam) + lon0Deg, math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Lambert Conformal Conic, 2 standard parallels
    * (Snyder 1987 §15, eqs 15-1..15-11 / 14-1,14-2). */
  final case class LambertConformalConic2SP(lat0Deg: Double,
      lon0Deg: Double, lat1Deg: Double, lat2Deg: Double,
      fe: Double, fn: Double, ell: Ellipsoid,
      datum: Option[Helmert] = None) extends Crs {
    private val e = ell.e
    private def mOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - ell.e2 * s * s)
    }
    private def tOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
    }
    private val phi0 = math.toRadians(lat0Deg)
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val nCone =
      (math.log(mOf(phi1)) - math.log(mOf(phi2))) /
        (math.log(tOf(phi1)) - math.log(tOf(phi2)))
    private val bigF = mOf(phi1) / (nCone * math.pow(tOf(phi1), nCone))
    private val rho0 = ell.a * bigF * math.pow(tOf(phi0), nCone)

    /** Forward-map constants for an external (SQL) restatement,
      * derived from this instance: (n, a·F, ρ0, e, lon0 deg, fe, fn). */
    private[graft] def forwardConstants: (Double, Double, Double, Double,
        Double, Double, Double) =
      (nCone, ell.a * bigF, rho0, e, lon0Deg, fe, fn)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val theta = nCone * math.toRadians(lonDeg - lon0Deg)
      val rho = ell.a * bigF * math.pow(tOf(phi), nCone)
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sign = if (nCone >= 0) 1.0 else -1.0
      val rho = sign * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sign * dx, sign * dy)
      val tP = math.pow(rho / (ell.a * bigF), 1.0 / nCone)
      var phi = math.Pi / 2.0 - 2.0 * math.atan(tP)
      var i = 0
      while (i < 6) {
        val s = math.sin(phi)
        phi = math.Pi / 2.0 - 2.0 * math.atan(
          tP * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        i += 1
      }
      (math.toDegrees(theta / nCone) + lon0Deg, math.toDegrees(phi))
    }

    /** projection scale factor at latitude `latDeg` (k = 1 exactly on
      * the standard parallels — the spec's no-fixture invariant). */
    def scaleAt(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      val rho = ell.a * bigF * math.pow(tOf(phi), nCone)
      rho * nCone / (ell.a * mOf(phi))
    }
  }

  /** Ellipsoidal Lambert Azimuthal Equal-Area, oblique aspect
    * (Snyder 1987 §24, eqs 24-2..24-21 with 3-11/3-12/3-16/3-18) —
    * the equal-area projection statistical offices use for density
    * grids (ETRS89-LAEA "Europe grid", EPSG:3035). Unlike TM/LCC
    * (conformal), its defining invariant is unit AREA scale, which
    * the spec checks against the ellipsoid's area element with no
    * fixture at all. */
  final case class LambertAzimuthalEqualArea(lat0Deg: Double,
      lon0Deg: Double, fe: Double, fn: Double, ell: Ellipsoid,
      datum: Option[Helmert] = None) extends Crs {
    private val e = ell.e
    private val e2 = ell.e2
    /** Snyder 3-12: authalic q of latitude phi. */
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        1.0 / (2.0 * e) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    private val qp = qOf(math.Pi / 2.0)
    private val phi1 = math.toRadians(lat0Deg)
    private val q1 = qOf(phi1)
    private val beta1 = math.asin(q1 / qp)
    private val rq = ell.a * math.sqrt(qp / 2.0)
    private val m1 = {
      val s = math.sin(phi1)
      math.cos(phi1) / math.sqrt(1.0 - e2 * s * s)
    }
    private val dd = ell.a * m1 / (rq * math.cos(beta1))

    /** Forward-map constants for an external (SQL) restatement,
      * derived from this instance so the oracle can never drift:
      * (e, e2, qp, sin β1, cos β1, Rq, D, lon0 deg, fe, fn). */
    private[graft] def forwardConstants: (Double, Double, Double, Double,
        Double, Double, Double, Double, Double, Double) =
      (e, e2, qp, math.sin(beta1), math.cos(beta1), rq, dd, lon0Deg,
        fe, fn)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(lonDeg - lon0Deg)
      val beta = math.asin(qOf(phi) / qp)
      val b = rq * math.sqrt(2.0 / (1.0 + math.sin(beta1) * math.sin(beta)
        + math.cos(beta1) * math.cos(beta) * math.cos(lam)))
      (fe + b * dd * math.cos(beta) * math.sin(lam),
        fn + (b / dd) * (math.cos(beta1) * math.sin(beta) -
          math.sin(beta1) * math.cos(beta) * math.cos(lam)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = (x - fe) / dd
      val dy = (y - fn) * dd
      val rho = math.sqrt(dx * dx + dy * dy)
      if (rho == 0.0) return (lon0Deg, lat0Deg)
      val ce = 2.0 * math.asin(rho / (2.0 * rq))
      val q = qp * (math.cos(ce) * math.sin(beta1) +
        dy * math.sin(ce) * math.cos(beta1) / rho)
      val lam = math.atan2((x - fe) * math.sin(ce),
        dd * rho * math.cos(beta1) * math.cos(ce) -
          dd * dd * (y - fn) * math.sin(beta1) * math.sin(ce))
      // Snyder 3-16: iterate phi from the authalic latitude
      var phi = math.asin(q / 2.0)
      var i = 0
      while (i < 8) {
        val s = math.sin(phi)
        val om = 1.0 - e2 * s * s
        phi += om * om / (2.0 * math.cos(phi)) *
          (q / (1.0 - e2) - s / om +
            1.0 / (2.0 * e) * math.log((1.0 - e * s) / (1.0 + e * s)))
        i += 1
      }
      (math.toDegrees(lam) + lon0Deg, math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Albers Equal-Area Conic, 2 standard parallels
    * (Snyder 1987 §14, eqs 14-1..14-12 with 3-11/3-12/3-16) — the
    * equal-area CONIC continental-statistics projections use
    * (Australian Albers EPSG:3577, NLCD conus Albers). Shares LAEA's
    * authalic-latitude machinery (q of Snyder 3-12) but maps onto a
    * cone like LCC; its defining invariants are unit area scale
    * everywhere and k = 1 exactly ON both standard parallels, which
    * the spec checks with no external fixture. */
  final case class AlbersEqualAreaConic(lat0Deg: Double, lon0Deg: Double,
      lat1Deg: Double, lat2Deg: Double, fe: Double, fn: Double,
      ell: Ellipsoid, datum: Option[Helmert] = None) extends Crs {
    private val e = ell.e
    private val e2 = ell.e2
    /** Snyder 3-12: authalic q of latitude phi. */
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        1.0 / (2.0 * e) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    private def mOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
    }
    private val phi0 = math.toRadians(lat0Deg)
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val m1 = mOf(phi1)
    private val m2 = mOf(phi2)
    private val q0 = qOf(phi0)
    private val q1 = qOf(phi1)
    private val q2 = qOf(phi2)
    private val nCone = (m1 * m1 - m2 * m2) / (q2 - q1) // Snyder 14-14
    private val bigC = m1 * m1 + nCone * q1              // Snyder 14-13
    private def rhoOf(q: Double): Double =
      ell.a * math.sqrt(bigC - nCone * q) / nCone        // Snyder 14-12
    private val rho0 = rhoOf(q0)

    /** Forward-map constants for an external (SQL) restatement,
      * derived from this instance so the oracle can never drift:
      * (e, e2, n, C, ρ0, a, lon0 deg, fe, fn). */
    private[graft] def forwardConstants: (Double, Double, Double, Double,
        Double, Double, Double, Double, Double) =
      (e, e2, nCone, bigC, rho0, ell.a, lon0Deg, fe, fn)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val theta = nCone * math.toRadians(lonDeg - lon0Deg) // 14-4
      val rho = rhoOf(qOf(phi))
      (fe + rho * math.sin(theta),                          // 14-1
        fn + rho0 - rho * math.cos(theta))                  // 14-2
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val sign = if (nCone >= 0) 1.0 else -1.0
      val rho = sign * math.sqrt(dx * dx + dy * dy)         // 14-10
      val theta = math.atan2(sign * dx, sign * dy)          // 14-11
      val q = (bigC - rho * rho * nCone * nCone /
        (ell.a * ell.a)) / nCone                            // 14-19
      // Snyder 3-16: iterate phi from the authalic latitude
      var phi = math.asin(q / 2.0)
      var i = 0
      while (i < 8) {
        val s = math.sin(phi)
        val om = 1.0 - e2 * s * s
        phi += om * om / (2.0 * math.cos(phi)) *
          (q / (1.0 - e2) - s / om +
            1.0 / (2.0 * e) * math.log((1.0 - e * s) / (1.0 + e * s)))
        i += 1
      }
      (math.toDegrees(theta / nCone) + lon0Deg, math.toDegrees(phi))
    }

    /** scale factor ALONG parallels at `latDeg` (k = ρn/(a·m),
      * Snyder 14-16) — exactly 1 on both standard parallels; the
      * meridian scale is its reciprocal (equal-area: h·k = 1). */
    def scaleAt(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      rhoOf(qOf(phi)) * nCone / (ell.a * mOf(phi))
    }
  }

  /** EPSG registry beyond the native 4326/3857/UTM set. Datumless
    * entries (GRS80 frames: ETRS89, RGF93, NZGD2000) treat their frame
    * as WGS84-coincident — the standard sub-dm assumption; 27700
    * carries the single-set OSGB36 Helmert (few-m regional accuracy,
    * the documented non-grid-shift trade). */
  val registry: Map[Int, Crs] = Map(
    // Great Britain: OSGB36 National Grid (Airy 1830, TM) — EPSG:27700
    27700 -> TransverseMercator(49.0, -2.0, 0.9996012717,
      400000.0, -100000.0, Airy1830,
      Some(Helmert(-446.448, 125.157, -542.060,
        -0.1502, -0.2470, -0.8421, 20.4894))),
    // France: RGF93 / Lambert-93 (GRS80, LCC-2SP) — EPSG:2154
    2154 -> LambertConformalConic2SP(46.5, 3.0, 49.0, 44.0,
      700000.0, 6600000.0, GRS80),
    // New Zealand: NZGD2000 / NZTM2000 (GRS80, TM) — EPSG:2193
    2193 -> TransverseMercator(0.0, 173.0, 0.9996,
      1600000.0, 10000000.0, GRS80),
    // Europe: ETRS89 / LCC (GRS80) — EPSG:3034
    3034 -> LambertConformalConic2SP(52.0, 10.0, 35.0, 65.0,
      4000000.0, 2800000.0, GRS80),
    // Germany et al.: ETRS89 / UTM 32N on GRS80 — EPSG:25832
    25832 -> TransverseMercator(0.0, 9.0, 0.9996,
      500000.0, 0.0, GRS80),
    // Conus-style LCC example: ETRS89 / LCC Germany — EPSG:5243
    5243 -> LambertConformalConic2SP(51.0, 10.5, 48.666666666666664,
      53.666666666666664, 0.0, 0.0, GRS80),
    // Europe statistical grid: ETRS89-extended / LAEA (GRS80) —
    // EPSG:3035; origin 52N 10E maps to FE/FN by definition
    3035 -> LambertAzimuthalEqualArea(52.0, 10.0,
      4321000.0, 3210000.0, GRS80),
    // Australia: GDA94 / Australian Albers (GRS80, AEA-2SP) —
    // EPSG:3577; the continental equal-area grid (GDA94 is
    // WGS84-coincident at this accuracy class, so datumless)
    3577 -> AlbersEqualAreaConic(0.0, 132.0, -18.0, -36.0,
      0.0, 0.0, GRS80),
  )

  def isRegistered(srid: Int): Boolean = registry.contains(srid)

  /** WGS84 lon/lat -> projected coords of `srid` (datum shift
    * included when the CRS carries one). */
  def forward(lonDeg: Double, latDeg: Double, srid: Int): (Double, Double) = {
    val crs = registry(srid)
    val (lon, lat) = crs.datum match {
      case None => (lonDeg, latDeg)
      case Some(h) =>
        val (x, y, z) = geodeticToXyz(lonDeg, latDeg, WGS84)
        val (x2, y2, z2) = h.forward(x, y, z)
        xyzToGeodetic(x2, y2, z2, crs.ell)
    }
    crs.forward(lon, lat)
  }

  /** projected coords of `srid` -> WGS84 lon/lat. */
  def inverse(x: Double, y: Double, srid: Int): (Double, Double) = {
    val crs = registry(srid)
    val (lon, lat) = crs.inverse(x, y)
    crs.datum match {
      case None => (lon, lat)
      case Some(h) =>
        val (gx, gy, gz) = geodeticToXyz(lon, lat, crs.ell)
        val (x2, y2, z2) = h.inverse(gx, gy, gz)
        xyzToGeodetic(x2, y2, z2, WGS84)
    }
  }
}
