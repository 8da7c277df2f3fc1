package graft

import graft.expressions.WkbPointUtil
import graft.functions.GeomFunctions
import org.apache.spark.sql.functions._

/** WKB/EWKB point decode: published PostGIS test vectors pin the
  * ABSOLUTE byte layout (an encoder/decoder pair could otherwise agree
  * on a mirrored layout and still round-trip), plus strict-parser
  * rejection paths and the DataFrame-level plumbing through
  * GeomFunctions.stPointFromWkbHex. */
class WkbSpec extends SparkSpec {
  import spark.implicits._

  private def xyz(hex: String): (Double, Double, Double) = {
    val a = WkbPointUtil.parseHex(
      org.apache.spark.unsafe.types.UTF8String.fromString(hex))
    (a.getDouble(0), a.getDouble(1), a.getDouble(2))
  }

  test("published PostGIS vectors decode: little/big endian, EWKB SRID") {
    // PostGIS: ST_AsBinary of POINT(1 2), NDR (little-endian)
    xyz("0101000000000000000000F03F0000000000000040") shouldBe
      ((1.0, 2.0, -1.0))
    // same point, XDR (big-endian)
    xyz("00000000013FF00000000000004000000000000000") shouldBe
      ((1.0, 2.0, -1.0))
    // PostGIS: ST_AsEWKB of SRID=4326;POINT(1 2) — SRID flag 0x20000000
    xyz("0101000020E6100000000000000000F03F0000000000000040") shouldBe
      ((1.0, 2.0, 4326.0))
    // lowercase hex accepted (feeds are inconsistent about case)
    xyz("0101000020e6100000000000000000f03f0000000000000040") shouldBe
      ((1.0, 2.0, 4326.0))
  }

  test("encodeHex reproduces the published layouts exactly") {
    WkbPointUtil.encodeHex(1.0, 2.0, 4326, little = true) shouldBe
      "0101000020E6100000000000000000F03F0000000000000040"
    WkbPointUtil.encodeHex(1.0, 2.0, -1, little = true) shouldBe
      "0101000000000000000000F03F0000000000000040"
    WkbPointUtil.encodeHex(1.0, 2.0, -1, little = false) shouldBe
      "00000000013FF00000000000004000000000000000"
  }

  test("round trip is bit-lossless including -0.0 and denormals") {
    val vals = Seq(0.0, -0.0, 1.5e-310, -179.99999999, 2.2250738585072014e-308,
      math.Pi, -85.05112877980659)
    for (x <- vals; little <- Seq(true, false)) {
      val (rx, ry, _) = xyz(WkbPointUtil.encodeHex(x, -x, 3857, little))
      java.lang.Double.doubleToRawLongBits(rx) shouldBe
        java.lang.Double.doubleToRawLongBits(x)
      java.lang.Double.doubleToRawLongBits(ry) shouldBe
        java.lang.Double.doubleToRawLongBits(-x)
    }
  }

  test("malformed blobs fail loudly with the offending field named") {
    val good = "0101000000000000000000F03F0000000000000040"
    an[IllegalArgumentException] should be thrownBy xyz(good.drop(1)) // odd
    an[IllegalArgumentException] should be thrownBy
      xyz(good.replace('4', 'Z')) // non-hex
    an[IllegalArgumentException] should be thrownBy
      xyz("02" + good.drop(2)) // bad byte-order marker
    an[IllegalArgumentException] should be thrownBy
      xyz("0102000000" + good.drop(10)) // linestring, not a point
    an[IllegalArgumentException] should be thrownBy
      xyz("0101000080" + good.drop(10)) // Z flag: 3-D unsupported
    an[IllegalArgumentException] should be thrownBy
      xyz(good.take(30)) // truncated coordinates
    an[IllegalArgumentException] should be thrownBy
      xyz(good + "00") // trailing bytes: layout must spell exactly a point
    // EWKB srid 0 is invalid
    an[IllegalArgumentException] should be thrownBy
      xyz("010100002000000000000000000000F03F0000000000000040")
  }

  test("stPointFromWkbHex: EWKB SRID wins, plain WKB adopts the " +
      "default, NULL passes through") {
    val df = Seq(
      (1L, Some(WkbPointUtil.encodeHex(3.5, -7.25, 27700, little = true))),
      (2L, Some(WkbPointUtil.encodeHex(3.5, -7.25, -1, little = false))),
      (3L, None)).toDF("id", "hex")
    val g = GeomFunctions.stPointFromWkbHex(col("hex"), defaultSrid = 4326)
    val rows = df.select(col("id"), GeomFunctions.stX(g).as("x"),
        GeomFunctions.stY(g).as("y"), GeomFunctions.stSrid(g).as("srid"))
      .orderBy(col("id")).collect()
    (rows(0).getDouble(1), rows(0).getDouble(2), rows(0).getInt(3)) shouldBe
      ((3.5, -7.25, 27700))
    (rows(1).getDouble(1), rows(1).getDouble(2), rows(1).getInt(3)) shouldBe
      ((3.5, -7.25, 4326))
    rows(2).isNullAt(1) shouldBe true
    rows(2).isNullAt(3) shouldBe true
  }

  test("expression participates in whole-stage codegen (no fallback) " +
      "and is SQL-callable as st_point_from_wkb_hex") {
    // non-foldable input over a codegen'd scan: '*(n)' marks fusion
    val df = spark.range(2)
      .select(GeomFunctions.stPointFromWkbHex(
        // id 0 -> POINT(1 2) little, id 1 -> POINT(1 2) big: a
        // runtime-varying hex column, not a constant-folded literal
        when(col("id") === 0,
          lit("0101000000000000000000F03F0000000000000040"))
          .otherwise(lit("00000000013FF00000000000004000000000000000")))
        .as("g"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include ("*(1) Project")
    plan should include ("graft_st_point_from_wkb_hex")
    df.collect().map(r =>
      (r.getStruct(0).getDouble(0), r.getStruct(0).getDouble(1))).toSeq
      .distinct shouldBe Seq((1.0, 2.0))
    // SQL surface
    graft.expressions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT st_x(g) AS x, st_y(g) AS y, g.srid AS srid FROM (
        |  SELECT st_point_from_wkb_hex(
        |    '0101000020E6100000000000000000F03F0000000000000040') AS g)"""
        .stripMargin).head()
    (r.getDouble(0), r.getDouble(1), r.getInt(2)) shouldBe ((1.0, 2.0, 4326))
  }

  test("decoded passthrough geometry feeds st_transform (the " +
      "force_the_geom loop, closed)") {
    // a 4326 EWKB point reprojects to web mercator like a native point
    val hex = WkbPointUtil.encodeHex(0.0, 0.0, 4326, little = true)
    val g = GeomFunctions.stPointFromWkbHex(lit(hex))
    val m = GeomFunctions.stTransform(g, lit(3857))
    val r = spark.range(1).select(GeomFunctions.stX(m).as("x"),
      GeomFunctions.stY(m).as("y")).head()
    math.abs(r.getDouble(0)) should be < 1e-9
    math.abs(r.getDouble(1)) should be < 1e-9
  }
}
