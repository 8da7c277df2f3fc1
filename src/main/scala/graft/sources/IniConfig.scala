package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** INI-file configuration loader — the reference's `etl.conf` bootstrap
  * (carto-etl `etl.conf.example:1-35`, flattened section->kwargs in
  * `sample01/run_etl.py:40-48`). Sections are flattened exactly like
  * `flatten()`: later sections win on key collisions; keys are
  * normalized to lowercase.
  *
  * Python strptime date formats (%d/%m/%Y %H:%M:%S) are translated to
  * the Java patterns the engine uses, so a reference config file works
  * unmodified.
  */
object IniConfig {

  def parse(text: String): Map[String, String] = {
    var out = Map.empty[String, String]
    for (line0 <- text.linesIterator) {
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")
          && !line.startsWith("[")) {
        val idx = line.indexOf('=')
        if (idx > 0) {
          val key = line.substring(0, idx).trim.toLowerCase
          val value = line.substring(idx + 1).trim
          out += key -> value
        }
      }
    }
    out
  }

  def load(path: String): Map[String, String] =
    parse(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  /** Python strptime -> Java DateTimeFormatter pattern (the directives
    * the reference's configs use). */
  def strptimeToJava(fmt: String): String = {
    val subs = Seq(
      "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
      "%H" -> "H", "%M" -> "mm", "%S" -> "ss", "%f" -> "SSSSSS",
      "%z" -> "XX", "%%" -> "%")
    subs.foldLeft(fmt) { case (acc, (py, java)) => acc.replace(py, java) }
  }

  private def boolOf(v: String): Boolean =
    v.equalsIgnoreCase("true") || v == "1"

  /** Build an IngestConfig from flattened INI keys, defaults matching
    * the reference (`etl/etl.py:110-125`). Empty-string values mean
    * unset, like the reference's falsy checks. */
  def toIngestConfig(kv: Map[String, String]): IngestConfig = {
    def get(k: String): Option[String] = kv.get(k).map(_.trim).filter(_.nonEmpty)
    def list(k: String): Seq[String] =
      get(k).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    IngestConfig(
      tableName = get("table_name").getOrElse(""),
      delimiter = get("delimiter").getOrElse(","),
      encoding = get("file_encoding").getOrElse("UTF-8"),
      columns = list("columns"),
      dateColumns = list("date_columns"),
      datetimeFormat = get("datetime_format").map(strptimeToJava)
        .getOrElse("d/M/yyyy H:mm:ss"),
      dateFormat = get("date_format").map(strptimeToJava)
        .getOrElse("d/M/yyyy"),
      xColumn = get("x_column").getOrElse("longitude"),
      yColumn = get("y_column").getOrElse("latitude"),
      srid = get("srid").map(_.toInt).getOrElse(4326),
      forceNoGeometry = get("force_no_geometry").exists(boolOf),
      forceTheGeom = get("force_the_geom"),
      floatDecimalSeparator = get("float_comma_separator").getOrElse("."),
      floatThousandSeparator = get("float_thousand_separator").getOrElse(","),
      chunkSize = get("chunk_size").map(_.toInt).getOrElse(1000),
      idColumn = get("id_column"),
      maxAttempts = get("max_attempts").map(_.toInt).getOrElse(3),
      // graft extensions (not in the reference key set): opt-in compat /
      // fixed-mode toggles
      zeroCoordAsMissing = get("zero_coord_as_missing").exists(boolOf),
      inferIntegers = get("infer_integers").exists(boolOf))
  }

  def loadIngestConfig(path: String): IngestConfig =
    toIngestConfig(load(path))
}
