package graft

import graft.sources.IniConfig

/** INI config bootstrap (T18): section flattening, strptime
  * translation, reference defaults. */
class IniConfigSpec extends SparkSpec {

  private val ini =
    """# reference-shaped etl.conf
      |[carto]
      |table_name =mytable
      |delimiter =|
      |columns=name, amount ,when
      |date_columns=when
      |
      |[etl]
      |chunk_size =500
      |file_encoding =ISO-8859-1
      |force_no_geometry =false
      |date_format =%d/%m/%Y
      |datetime_format =%d/%m/%Y %H:%M:%S
      |float_comma_separator =,
      |float_thousand_separator =.
      |x_column =lon
      |y_column =lat
      |srid =4326
      |
      |[log]
      |file =etl.log
      |level =30
      |""".stripMargin

  test("sections flatten, keys lowercase, values trimmed") {
    val kv = IniConfig.parse(ini)
    kv("table_name") shouldBe "mytable"
    kv("chunk_size") shouldBe "500"
    kv("level") shouldBe "30"
  }

  test("strptime patterns translate to Java patterns") {
    IniConfig.strptimeToJava("%d/%m/%Y %H:%M:%S") shouldBe "dd/MM/yyyy H:mm:ss"
    IniConfig.strptimeToJava("%Y-%m-%d") shouldBe "yyyy-MM-dd"
  }

  test("reference config file builds a working IngestConfig") {
    val cfg = IniConfig.toIngestConfig(IniConfig.parse(ini))
    cfg.tableName shouldBe "mytable"
    cfg.delimiter shouldBe "|"
    cfg.normColumns shouldBe Seq("name", "amount", "when")
    cfg.normDateColumns shouldBe Seq("when")
    cfg.chunkSize shouldBe 500
    cfg.encoding shouldBe "ISO-8859-1"
    cfg.floatDecimalSeparator shouldBe ","
    cfg.floatThousandSeparator shouldBe "."
    cfg.xColumn shouldBe "lon"
    cfg.datetimeFormat shouldBe "dd/MM/yyyy H:mm:ss"
    // the translated formats parse the reference's fixture dates
    import org.apache.spark.sql.functions._
    import graft.functions.TypeCascade
    evalOne[java.sql.Timestamp](TypeCascade.parseDate(
      lit("01/09/2017 2:47:25"), cfg.datetimeFormat, cfg.dateFormat))
      .toString shouldBe "2017-09-01 02:47:25.0"
  }

  test("defaults match the reference when keys are absent") {
    val cfg = IniConfig.toIngestConfig(Map.empty)
    cfg.delimiter shouldBe ","
    cfg.chunkSize shouldBe 1000
    cfg.srid shouldBe 4326
    cfg.forceNoGeometry shouldBe false
    cfg.idColumn shouldBe None
  }
}
