package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{GeomFunctions => G}

/** Port of the reference's geometry tests (`tests/test_etl.py:22-32,52-62`)
  * over the struct(x,y,srid) geometry model. */
class GeomFunctionsSpec extends SparkSpec {

  // test_get_longitude / test_get_latitude: "1"/"2" parse to 1.0/2.0
  test("coordinate strings parse to doubles inside the point") {
    val g = G.synthesizePoint(lit("1"), lit("2"))
    val r = eval(G.stX(g), G.stY(g), G.stSrid(g))
    r.getDouble(0) shouldBe 1.0
    r.getDouble(1) shouldBe 2.0
    r.getInt(2) shouldBe 4326
  }

  // test_wrong_longitude/latitude: 181/91 out of bounds -> NULL geometry
  test("out-of-range coords null the geometry") {
    isNull(G.synthesizePoint(lit("181"), lit("2"))) shouldBe true
    isNull(G.synthesizePoint(lit("1"), lit("91"))) shouldBe true
    isNull(G.synthesizePoint(lit("-181"), lit("2"))) shouldBe true
  }

  // boundary values are valid (abs(lon) > 180 is the reject condition)
  test("boundary coords 180/90 are valid") {
    isNull(G.synthesizePoint(lit("180"), lit("-90"))) shouldBe false
  }

  // quirk Q9 consciously fixed: 0.0 coords survive (Null Island)
  test("zero coords produce a valid point (quirk Q9 fixed)") {
    val g = G.synthesizePoint(lit("0"), lit("0"))
    eval(G.stX(g)).getDouble(0) shouldBe 0.0
  }

  // compat flag restores reference quirk Q9 (etl.py:255-262: 0.0 falsy)
  test("zeroCoordAsMissing compat flag nulls zero-coord geometry") {
    isNull(G.synthesizePoint(lit("0"), lit("0"),
      zeroCoordAsMissing = true)) shouldBe true
    isNull(G.synthesizePoint(lit("1"), lit("0"),
      zeroCoordAsMissing = true)) shouldBe true
    // non-zero coords unaffected by the flag
    isNull(G.synthesizePoint(lit("1"), lit("2"),
      zeroCoordAsMissing = true)) shouldBe false
  }

  test("missing/unparseable coord -> NULL geometry") {
    isNull(G.synthesizePoint(lit(""), lit("2"))) shouldBe true
    isNull(G.synthesizePoint(lit("abc"), lit("2"))) shouldBe true
  }

  test("wkt rendering") {
    evalOne[String](G.stAsText(G.stPoint(lit(1.0), lit(2.0)))) shouldBe
      "POINT(1.0 2.0)"
  }

  test("st_setsrid retags without transforming") {
    val g = G.stSetSrid(G.stPoint(lit(1.0), lit(2.0)), lit(3857))
    val r = eval(G.stX(g), G.stSrid(g))
    r.getDouble(0) shouldBe 1.0
    r.getInt(1) shouldBe 3857
  }

  test("st_transform 4326->3857->4326 round-trips") {
    val p = G.stPoint(lit(10.0), lit(45.0))
    val merc = G.stTransform(p, lit(3857))
    val back = G.stTransform(merc, lit(4326))
    val r = eval(G.stX(merc), G.stY(merc), G.stX(back), G.stY(back))
    r.getDouble(0) shouldBe 1113194.9079 +- 0.001 // 10 deg lon in meters
    r.getDouble(1) shouldBe 5621521.486 +- 0.01
    r.getDouble(2) shouldBe 10.0 +- 1e-9
    r.getDouble(3) shouldBe 45.0 +- 1e-9
  }

  test("st_transform identity when srids equal; unknown pair -> NULL") {
    val p = G.stPoint(lit(1.0), lit(2.0), lit(4326))
    eval(G.stTransform(p, lit(4326))).getStruct(0).getDouble(0) shouldBe 1.0
    val weird = G.stPoint(lit(1.0), lit(2.0), lit(27700))
    isNull(G.stTransform(weird, lit(3857))) shouldBe true
  }

  test("grid snap") {
    evalOne[Long](G.gridCell(lit(12.34), lit(0.5))) shouldBe 24L
    evalOne[Long](G.gridCell(lit(-12.34), lit(0.5))) shouldBe -25L
  }
}
