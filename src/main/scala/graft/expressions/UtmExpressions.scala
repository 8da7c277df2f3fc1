package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** WGS84 <-> UTM (Universal Transverse Mercator) on the Krüger series —
  * the public formulation used by every mapping library (Snyder, "Map
  * Projections: A Working Manual"; Karney 2011; the coefficients below
  * are the standard 3rd-order-in-n expansion, error < 0.1 mm inside a
  * zone). Zones are addressed by EPSG srid: 32601-32660 = zones 1-60
  * north (false northing 0), 32701-32760 = south (false northing
  * 10,000,000 m); central meridian of zone z = 6z - 183 degrees,
  * k0 = 0.9996, false easting 500,000 m.
  *
  * Scalar math lives here (shared by interpreted eval and generated
  * code); the Catalyst expressions below keep the call codegen'd so
  * geometry projections stay inside whole-stage codegen. */
object UtmProjection {
  private val A0 = 6378137.0                 // WGS84 semi-major axis
  private val F = 1.0 / 298.257223563        // WGS84 flattening
  private val N = F / (2.0 - F)              // third flattening
  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0
  // rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + ...)
  private val RectA = A0 / (1.0 + N) * (1.0 + N * N / 4.0 +
    N * N * N * N / 64.0)
  // forward series (alpha), inverse series (beta), latitude series (delta)
  private val Alpha = Array(
    N / 2.0 - 2.0 / 3.0 * N * N + 5.0 / 16.0 * N * N * N,
    13.0 / 48.0 * N * N - 3.0 / 5.0 * N * N * N,
    61.0 / 240.0 * N * N * N)
  private val Beta = Array(
    N / 2.0 - 2.0 / 3.0 * N * N + 37.0 / 96.0 * N * N * N,
    N * N / 48.0 + N * N * N / 15.0,
    17.0 / 480.0 * N * N * N)
  private val Delta = Array(
    2.0 * N - 2.0 / 3.0 * N * N - 2.0 * N * N * N,
    7.0 / 3.0 * N * N - 8.0 / 5.0 * N * N * N,
    56.0 / 15.0 * N * N * N)
  private val TwoSqrtNOver1PlusN = 2.0 * math.sqrt(N) / (1.0 + N)

  def isUtmSrid(srid: Int): Boolean =
    (srid >= 32601 && srid <= 32660) || (srid >= 32701 && srid <= 32760)

  private def zoneCentralMeridianRad(srid: Int): Double = {
    val zone = if (srid >= 32701) srid - 32700 else srid - 32600
    math.toRadians(6.0 * zone - 183.0)
  }

  /** (easting, northing) of a WGS84 lon/lat in the zone `srid` names. */
  def forward(lon: Double, lat: Double, srid: Int): ArrayData = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon) - zoneCentralMeridianRad(srid)
    val sinPhi = math.sin(phi)
    val t = math.sinh(atanh(sinPhi) -
      TwoSqrtNOver1PlusN * atanh(TwoSqrtNOver1PlusN * sinPhi))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = atanh(math.sin(lam) / math.sqrt(1.0 + t * t))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 3) {
      xi += Alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += Alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    val e = FalseEasting + K0 * RectA * eta
    val nn = (if (srid >= 32701) FalseNorthingSouth else 0.0) +
      K0 * RectA * xi
    new GenericArrayData(Array(e, nn))
  }

  /** (lon, lat) WGS84 of an (easting, northing) in the zone `srid`
    * names. */
  def inverse(easting: Double, northing: Double, srid: Int): ArrayData = {
    val n0 = if (srid >= 32701) FalseNorthingSouth else 0.0
    val xi = (northing - n0) / (K0 * RectA)
    val eta = (easting - FalseEasting) / (K0 * RectA)
    var xiP = xi
    var etaP = eta
    var j = 1
    while (j <= 3) {
      xiP -= Beta(j - 1) * math.sin(2.0 * j * xi) * math.cosh(2.0 * j * eta)
      etaP -= Beta(j - 1) * math.cos(2.0 * j * xi) * math.sinh(2.0 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 3) {
      phi += Delta(j - 1) * math.sin(2.0 * j * chi)
      j += 1
    }
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    new GenericArrayData(Array(
      math.toDegrees(lam + zoneCentralMeridianRad(srid)),
      math.toDegrees(phi)))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  private val EarthR = 6378137.0
  private val Rad = math.Pi / 180.0

  /** Full reprojection pivot src -> WGS84 -> target over the supported
    * SRID set (4326 / 3857 / UTM zones), as ONE scalar call. Kept
    * single-node on the Catalyst side deliberately: a Column-level
    * composition of the same dispatch duplicates the pivot subtree at
    * every struct-field reference, which grows multiplicatively when
    * transforms nest (st_transform(st_transform(...)) — measured as an
    * optimizer hang in GeomFunctionsSpec's round-trip cases). Callers
    * guard src/target support; unsupported pairs here would throw. */
  def pivot(x: Double, y: Double, src: Int, target: Int): ArrayData = {
    if (src == target) return new GenericArrayData(Array(x, y))
    val (lon, lat) =
      if (src == 4326) (x, y)
      else if (src == 3857)
        (x / EarthR / Rad,
          (math.atan(math.exp(y / EarthR)) - math.Pi / 4.0) * 2.0 / Rad)
      else if (isUtmSrid(src)) {
        val arr = inverse(x, y, src)
        (arr.getDouble(0), arr.getDouble(1))
      } else Projections.inverse(x, y, src) // registry CRS (27700, 2154, …)
    if (target == 4326) new GenericArrayData(Array(lon, lat))
    else if (target == 3857)
      new GenericArrayData(Array(lon * Rad * EarthR,
        math.log(math.tan(math.Pi / 4.0 + lat * Rad / 2.0)) * EarthR))
    else if (isUtmSrid(target)) forward(lon, lat, target)
    else {
      val (px, py) = Projections.forward(lon, lat, target)
      new GenericArrayData(Array(px, py))
    }
  }
}

/** array(x', y') of (x, y, srcSrid, targetSrid) over the supported SRID
  * matrix — the single-node reprojection pivot (see
  * UtmProjection.pivot's note on why this must not be a Column
  * composition). */
case class GeomPivotExpression(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_geom_pivot"

  override protected def nullSafeEval(x: Any, y: Any, src: Any,
      target: Any): Any =
    UtmProjection.pivot(x.asInstanceOf[Double], y.asInstanceOf[Double],
      src.asInstanceOf[Int], target.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, s, t) =>
      s"graft.expressions.UtmProjection.pivot($x, $y, $s, $t)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): GeomPivotExpression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

