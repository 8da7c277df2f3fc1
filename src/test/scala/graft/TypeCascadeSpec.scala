package graft

import org.apache.spark.sql.functions._
import graft.functions.TypeCascade

/** Port of the reference's value-cascade unit tests
  * (`tests/test_etl.py` + the 18-field `record` fixture in
  * `tests/conftest.py:195-215`), restated over Column transforms.
  *
  * Reference config: datetime_format "%d/%m/%Y %H:%M:%S", date_format
  * "%d/%m/%Y" (`tests/conftest.py:20-21`) → Java patterns below. The
  * reference renders SQL literal text; we assert the typed values that
  * text denotes.
  */
class TypeCascadeSpec extends SparkSpec {
  private val dtFmt = "d/M/yyyy H:mm:ss"
  private val dFmt = "d/M/yyyy"

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  private def parseDate(v: String) =
    evalOne[java.sql.Timestamp](TypeCascade.parseDate(lit(v), dtFmt, dFmt))

  private def parseFloat(v: String,
      dec: String = ".", thou: String = ","): java.lang.Double =
    eval(TypeCascade.parseLocaleFloat(lit(v), dec, thou))
      .getAs[java.lang.Double](0)

  // -- escaping (test_escape_single_quote / test_escape_value) ----------
  test("escape doubles single quotes") {
    evalOne[String](TypeCascade.escapeSqlQuotes(lit("t'est"))) shouldBe "t''est"
    evalOne[String](TypeCascade.escapeSqlQuotes(lit("a"))) shouldBe "a"
  }

  // -- CPython str(float) rendering (valueLevelRender fidelity) ---------
  test("value-level rendering matches CPython str(float) in every regime") {
    // expected strings generated with CPython repr() — positional
    // digits in [1e-4, 1e16), scientific outside, shortest round-trip
    val cases = Seq(
      "0" -> "0.0", "1" -> "1.0", "17" -> "17.0", "2.5" -> "2.5",
      "0.1" -> "0.1", "12345678" -> "12345678.0",
      "0.0001" -> "0.0001", "-0.0001" -> "-0.0001",
      // the |x| < 1e-4 exponent switch the r2/r3 ADVICE flagged
      "0.00001" -> "1e-05", "0.000015" -> "1.5e-05",
      "-0.000025" -> "-2.5e-05", "1e-7" -> "1e-07",
      "0.000012345678901234567" -> "1.2345678901234568e-05",
      "1e-100" -> "1e-100", "5e-324" -> "5e-324",
      "2.5e-10" -> "2.5e-10",
      // >= 1e16 goes scientific with an explicit '+'
      "10000000000000000" -> "1e+16", "15000000000000000" -> "1.5e+16",
      "1e22" -> "1e+22", "1.7976931348623157e308" -> "1.7976931348623157e+308",
      // just under the switch stays positional
      "1000000000000000" -> "1000000000000000.0",
      "123456789012345.6" -> "123456789012345.6",
      "9999999999999998" -> "9999999999999998.0",
      // shortest-repr classics
      "0.30000000000000004" -> "0.30000000000000004",
      "3.141592653589793" -> "3.141592653589793")
    cases.foreach { case (in, expected) =>
      withClue(s"render($in): ") {
        evalOne[String](TypeCascade.valueLevelRender(lit(in))) shouldBe expected
      }
    }
    // non-float text passes through raw; blank -> NULL (unchanged)
    evalOne[String](TypeCascade.valueLevelRender(lit("abc"))) shouldBe "abc"
    eval(TypeCascade.valueLevelRender(lit(" "))).isNullAt(0) shouldBe true
    // European separators still feed the same renderer
    evalOne[String](TypeCascade.valueLevelRender(lit("2,5"),
      decimalSep = ",", thousandSep = ".")) shouldBe "2.5"
  }

  // -- numeric cascade (test_parse_int/float/float_comma_column) --------
  test("int renders as double 1.0 (reference quirk Q5)") {
    parseFloat("1") shouldBe 1.0
  }
  test("float parses") { parseFloat("1.0") shouldBe 1.0 }
  test("comma-decimal float parses with European separators") {
    parseFloat("1,5", dec = ",", thou = ".") shouldBe 1.5
  }
  test("thousand separators are stripped") {
    parseFloat("1.234.567,89", dec = ",", thou = ".") shouldBe 1234567.89
    parseFloat("1,234,567.89") shouldBe 1234567.89
  }
  test("non-numeric text -> NULL on the float branch") {
    parseFloat("a") shouldBe null
  }

  // -- INFINITY family forbidden (test_parse_forbidden_float_column) ----
  test("INFINITY is forbidden as a number but fine as a string") {
    parseFloat("INFINITY") shouldBe null
    parseFloat("infinity") shouldBe null
    parseFloat("-Inf") shouldBe null
    parseFloat("NaN") shouldBe null
    // the same cell survives as a string value (quirk Q6)
    evalOne[String](TypeCascade.blankToNull(lit("INFINITY"))) shouldBe "INFINITY"
  }

  // -- blank/missing -> NULL (test_parse_non_existent_column etc.) ------
  test("empty and whitespace-only -> NULL") {
    isNull(TypeCascade.blankToNull(lit(""))) shouldBe true
    isNull(TypeCascade.blankToNull(lit("  "))) shouldBe true
    parseFloat("   ") shouldBe null
  }

  // -- dates (test_parse_date .. test_parse_wrong_date2) ----------------
  test("datetime-format value parses (01/09/2017 2:47:25)") {
    parseDate("01/09/2017 2:47:25") shouldBe ts("2017-09-01 02:47:25")
  }
  test("date-format fallback (01/09/2017 -> midnight)") {
    parseDate("01/09/2017") shouldBe ts("2017-09-01 00:00:00")
  }
  test("two-digit hour (01/09/2017 22:47:25)") {
    parseDate("01/09/2017 22:47:25") shouldBe ts("2017-09-01 22:47:25")
  }
  test("wrong-separator date -> NULL (reference raises then NULLs)") {
    parseDate("01-09-2017 2:47:25") shouldBe null
  }
  test("garbage and empty dates -> NULL") {
    parseDate("zzz") shouldBe null
    parseDate("") shouldBe null
  }
  test("canonical render matches CARTO format %Y-%m-%d %H:%M:%S+00") {
    val c = date_format(
      TypeCascade.parseDate(lit("01/09/2017 2:47:25"), dtFmt, dFmt),
      "yyyy-MM-dd HH:mm:ss'+00'")
    evalOne[String](c) shouldBe "2017-09-01 02:47:25+00"
  }

  // -- header normalization (InsensitiveDictReader) ---------------------
  test("headers are trimmed + lowercased, collisions disambiguated") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF(" Lon ", "LAT", "lat ")
    TypeCascade.normalizeHeaders(df).columns.toSeq shouldBe
      Seq("lon", "lat", "lat_1")
  }
}
