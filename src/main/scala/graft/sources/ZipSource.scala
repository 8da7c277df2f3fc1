package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Zip-archive ingestion — the reference moves geocoding inputs/results
  * as zip files and rewrites member CSVs (`etl/geocoding.py:88-116,
  * 168-172`). Spark has no zip codec for text sources, so archives are
  * read as whole binary files and expanded per-partition.
  *
  * Scale: one task per archive (binaryFile splits at file granularity);
  * fine for the many-medium-archives shape. A single giant zip does not
  * parallelize — repack such inputs, or use a splittable codec.
  */
object ZipSource {

  /** (archive_path, member_name, text) for every member of every zip
    * under `path`. */
  def readMembers(spark: SparkSession, path: String,
      encoding: String = "UTF-8"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (archive, bytes) =>
        val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map { entry =>
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = zis.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = zis.read(buf) }
            (archive, entry.getName, new String(out.toByteArray, encoding))
          }.toVector
      }
      .toDF("archive_path", "member_name", "text")
  }

  /** Parse one member (CSV with header) of the archives into a typed
    * scan, header-normalized like CsvIngest.
    *
    * `outputColumns` (when non-empty) fits the result to exactly those
    * columns in that order, filling columns the member lacks with the
    * empty string and dropping extras — the reference's result-zip
    * cleaning for HERE `_out.txt`/`_err.txt` members
    * (`etl/geocoding.py:100-129`: `__get_row__` emits '' for missing
    * output columns). */
  def readZipCsv(spark: SparkSession, path: String, memberSuffix: String,
      cfg: IngestConfig, outputColumns: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val lines = readMembers(spark, path, cfg.encoding)
      .filter(col("member_name").endsWith(memberSuffix))
      .select(explode(split(col("text"), "\r?\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .as[String]
    val df = spark.read
      .option("header", "true")
      .option("delimiter", cfg.delimiter)
      .option("inferSchema", "false")
      .csv(lines)
    val normalized = graft.functions.TypeCascade.normalizeHeaders(df)
    if (outputColumns.isEmpty) normalized
    else {
      val present = normalized.columns.toSet
      normalized.select(outputColumns.map { c0 =>
        val c = c0.trim.toLowerCase
        if (present.contains(c)) col(c).as(c) else lit("").as(c)
      }: _*)
    }
  }
}
