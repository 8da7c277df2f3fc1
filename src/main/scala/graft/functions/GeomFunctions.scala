package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Point-geometry synthesis, restating the reference's generated PostGIS
  * calls (`etl/etl.py:175-192`: `st_transform(st_setsrid(st_makepoint(x,y),
  * srid), 4326)`) as Spark built-in expressions over a simple geometry
  * model: `struct(x double, y double, srid int)`.
  *
  * Bounds validation mirrors `etl/etl.py:13-14,236-262`:
  * abs(lon) > 180 or abs(lat) > 90 -> NULL geometry. (The reference's
  * quirk Q9 — coord 0.0 treated as missing — is deliberately NOT
  * inherited; Null Island rows survive here.)
  */
object GeomFunctions {
  val MaxLon = 180.0
  val MaxLat = 90.0

  /** Build a point with an SRID tag. NULL if either coordinate is NULL. */
  def stPoint(x: Column, y: Column, srid: Column): Column =
    when(x.isNotNull && y.isNotNull,
      struct(x.as("x"), y.as("y"), srid.cast("int").as("srid")))

  def stPoint(x: Column, y: Column): Column = stPoint(x, y, lit(4326))

  /** Re-tag SRID without transforming (PostGIS st_setsrid). */
  def stSetSrid(geom: Column, srid: Column): Column =
    when(geom.isNotNull,
      struct(geom("x").as("x"), geom("y").as("y"),
        srid.cast("int").as("srid")))

  def stX(geom: Column): Column = geom("x")
  def stY(geom: Column): Column = geom("y")
  def stSrid(geom: Column): Column = geom("srid")

  /** Decode a hex-WKB/EWKB point string into the engine's geometry
    * struct — the interpretation half of the `force_the_geom`
    * passthrough (quirk Q12, CsvIngest): the reference stores the hex
    * verbatim and lets PostGIS read it (`etl/etl.py:303-304`); this
    * lets passthrough geometries feed st_x/st_y/st_transform/overviews
    * directly. EWKB SRID wins when present; `defaultSrid` tags plain
    * WKB (PostGIS semantics: untagged geometry adopts the column
    * SRID). Malformed hex throws with the offending field named; NULL
    * passes through as NULL geometry. Map-only scalar — codegen'd
    * expression, no UDF. */
  def stPointFromWkbHex(hex: Column, defaultSrid: Int = 4326): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => CB, expression => E}
    val arr = CB(graft.expressions.WkbPointExpression(E(hex)))
    when(hex.isNotNull,
      struct(element_at(arr, 1).as("x"), element_at(arr, 2).as("y"),
        when(element_at(arr, 3) >= 0.0, element_at(arr, 3))
          .otherwise(lit(defaultSrid.toDouble)).cast("int").as("srid")))
  }

  /** Reproject between the SRIDs the engine supports natively: 4326
    * (WGS84 lon/lat), 3857 (web mercator meters), the WGS84 UTM
    * zones 32601-32660 (north) / 32701-32760 (south) via the standard
    * Krüger series (expressions/UtmExpressions — < 0.1 mm in-zone),
    * and every EPSG code in [[graft.expressions.Projections.registry]]
    * (parameterized Transverse Mercator + Lambert Conformal Conic on
    * any ellipsoid with optional Helmert datum shift, plus the
    * equal-area pair LAEA 3035 and Albers 3577 — OSGB 27700,
    * Lambert-93 2154, NZTM 2193, ETRS89 LCC 3034, ETRS89/UTM 25832,
    * …). Identity when source == target (the reference only ever needs
    * 4326 -> 4326, `etl/etl.py:21,190-192`; the rest is the scale
    * extension used by the overview/LOD pipeline). Unknown SRID
    * pairs -> NULL geometry.
    *
    * Dispatch shape: the two hot pairs (4326<->3857) keep their direct
    * closed forms; any pair involving a UTM zone pivots through WGS84
    * (src -> lon/lat -> target), the same composition every projection
    * library performs. */
  def stTransform(geom: Column, target: Column): Column =
    stTransformImpl(geom, target)

  /** Literal-aware overload: when source and target SRID are statically
    * equal (the reference's only case — 4326 -> 4326), skip the runtime
    * branch entirely instead of emitting a trivially-true predicate. */
  def stTransform(geom: Column, target: Int, source: Int): Column =
    if (target == source) geom
    else stTransformImpl(geom, lit(target))

  private def isUtm(srid: Column): Column =
    (srid >= 32601 && srid <= 32660) || (srid >= 32701 && srid <= 32760)

  private val registeredSrids: Seq[Int] =
    graft.expressions.Projections.registry.keys.toSeq.sorted

  private def supportedSrid(srid: Column): Column =
    srid === 4326 || srid === 3857 || isUtm(srid) ||
      srid.isin(registeredSrids.map(Integer.valueOf): _*)

  private def stTransformImpl(geom: Column, target: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => CB, expression => E}
    val src = geom("srid")
    val x = geom("x")
    val y = geom("y")
    val R = lit(6378137.0)
    val toRad = lit(math.Pi / 180.0)
    // 4326 -> 3857
    val mercX = x * toRad * R
    val mercY = log(tan(lit(math.Pi / 4.0) + y * toRad / lit(2.0))) * R
    // 3857 -> 4326
    val lonX = x / R / toRad
    val latY = (atan(exp(y / R)) - lit(math.Pi / 4.0)) * lit(2.0) / toRad
    // general path (reached only when a UTM zone is involved — the
    // direct branches below win otherwise): the whole src -> WGS84 ->
    // target pivot is ONE expression node. A Column-level composition
    // of the same dispatch duplicates the pivot subtree at every
    // field/array reference, which grows multiplicatively when
    // transforms nest — measured as an optimizer hang on nested
    // round-trips.
    val piv = CB(graft.expressions.GeomPivotExpression(E(x), E(y),
      E(src.cast("int")), E(target.cast("int"))))
    when(geom.isNull, lit(null))
      .when(src === target, geom)
      .when(src === 4326 && target === 3857,
        struct(mercX.as("x"), mercY.as("y"), target.cast("int").as("srid")))
      .when(src === 3857 && target === 4326,
        struct(lonX.as("x"), latY.as("y"), target.cast("int").as("srid")))
      .when(supportedSrid(src) && supportedSrid(target),
        struct(piv.getItem(0).as("x"), piv.getItem(1).as("y"),
          target.cast("int").as("srid")))
      .otherwise(lit(null))
  }

  /** WGS84 bounds validation: out-of-range coordinate -> NULL. */
  def validLonLat(lon: Column, lat: Column): Column =
    lon.isNotNull && lat.isNotNull &&
      abs(lon) <= MaxLon && abs(lat) <= MaxLat

  /** The reference's full geometry-synthesis pipeline (T4): parse coords
    * from string columns, bounds-check, build point at `srid`, reproject
    * to 4326. `etl/etl.py:175-192`.
    *
    * `zeroCoordAsMissing` opts into reference quirk Q9
    * (`etl/etl.py:255-262`: Python `or` makes 0.0 falsy, so a 0.0
    * coordinate falls back to "missing" -> NULL geometry). Default keeps
    * Null Island points valid. */
  def synthesizePoint(
      lonRaw: Column,
      latRaw: Column,
      srid: Int = 4326,
      decimalSep: String = ".",
      thousandSep: String = ",",
      zeroCoordAsMissing: Boolean = false): Column = {
    val lon = TypeCascade.parseLocaleFloat(lonRaw, decimalSep, thousandSep)
    val lat = TypeCascade.parseLocaleFloat(latRaw, decimalSep, thousandSep)
    val valid =
      if (zeroCoordAsMissing)
        validLonLat(lon, lat) && lon =!= 0.0 && lat =!= 0.0
      else validLonLat(lon, lat)
    when(valid, stTransform(stPoint(lon, lat, lit(srid)), 4326, srid))
  }

  /** WKT rendering (POINT only — the reference's only geometry kind). */
  def stAsText(geom: Column): Column =
    when(geom.isNotNull,
      concat(lit("POINT("), geom("x").cast("string"), lit(" "),
        geom("y").cast("string"), lit(")")))

  /** Snap a coordinate to a grid cell index at a given cell size — the
    * building block of the overview/LOD pyramid (S8). */
  def gridCell(coord: Column, cellSize: Column): Column =
    floor(coord / cellSize)

  // ------------------------------------------------------------ geohash

  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash base-32 cell code (Niemeyer 2008) — the standard
    * hierarchical spatial bucketing key: a prefix IS a containing
    * cell, so `substr(gh, 1, p)` gives coarse-to-fine partition/
    * cluster keys for free (geohash prefixes are the spatial analogue
    * of q75/q174's Z-order/Hilbert file layout, in an
    * interchange-friendly string form).
    *
    * Bit trick that keeps it oracle-exact: the interleaved geohash
    * bits are nothing but the binary expansions of the unit-scaled
    * coordinates, so instead of the textbook interval-halving LOOP we
    * compute two integers
    *   lonI = floor((lon+180)/360 * 2^ceil(bits/2))
    *   latI = floor((lat+90)/180 * 2^floor(bits/2))
    * and assemble each output char from (lonI,latI) bit shifts —
    * straight-line integer arithmetic after two identically-rounded
    * IEEE multiplies, bit-reproducible across engines and fully
    * codegen'd (no HOF fold, no struct accumulator). */
  def geohashEncode(lat: Column, lon: Column, precision: Int = 5): Column = {
    require(precision >= 1 && precision <= 12,
      s"geohash precision must be in [1,12] (got $precision)")
    val bits = precision * 5
    val lonBits = (bits + 1) / 2 // even bit positions, lon leads
    val latBits = bits / 2
    val lonI = least(
      floor((lon + lit(180.0)) / lit(360.0) * lit((1L << lonBits).toDouble)),
      lit(((1L << lonBits) - 1).toDouble)).cast("long")
    val latI = least(
      floor((lat + lit(90.0)) / lit(180.0) * lit((1L << latBits).toDouble)),
      lit(((1L << latBits) - 1).toDouble)).cast("long")
    val chars = (0 until precision).map { c =>
      val idx = (0 until 5).map { b =>
        val m = 5 * c + b // global bit index, msb-first
        val bit =
          if (m % 2 == 0) shiftright(lonI, lonBits - 1 - m / 2) % 2
          else shiftright(latI, latBits - 1 - (m - 1) / 2) % 2
        bit * lit((1 << (4 - b)).toLong)
      }.reduce(_ + _)
      lit(GeohashAlphabet).substr(idx.cast("int") + lit(1), lit(1))
    }
    concat(chars: _*)
  }

  /** Driver-side decode of a geohash cell to its (lat, lon) center —
    * the spec-side inverse for round-trip checks (decode is a scalar
    * utility; the distributed hot path only ever ENCODES to get
    * bucket keys). */
  def geohashDecodeCenter(gh: String): (Double, Double) = {
    var laLo = -90.0; var laHi = 90.0
    var loLo = -180.0; var loHi = 180.0
    var even = true
    gh.foreach { ch =>
      val v = GeohashAlphabet.indexOf(ch)
      require(v >= 0, s"invalid geohash char '$ch'")
      (4 to 0 by -1).foreach { b =>
        val bit = (v >> b) & 1
        if (even) {
          val mid = (loLo + loHi) / 2
          if (bit == 1) loLo = mid else loHi = mid
        } else {
          val mid = (laLo + laHi) / 2
          if (bit == 1) laLo = mid else laHi = mid
        }
        even = !even
      }
    }
    ((laLo + laHi) / 2, (loLo + loHi) / 2)
  }
}
