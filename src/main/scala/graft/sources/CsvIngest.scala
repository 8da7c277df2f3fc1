package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GeomFunctions, TypeCascade}

/** Job configuration mirroring the reference's `etl.conf` key set
  * (carto-etl `etl.conf.example:1-35`, kwarg coercion `etl/etl.py:87-125`).
  * Date/datetime formats are Java `DateTimeFormatter` patterns (the
  * reference uses Python strptime patterns — callers translate once at
  * config time, not per row).
  */
case class IngestConfig(
    tableName: String,
    delimiter: String = ",",
    encoding: String = "UTF-8",
    /** Columns to emit, in order; empty = every CSV column. Normalized to
      * trim+lowercase like the reference (`etl/etl.py:302`). */
    columns: Seq[String] = Nil,
    dateColumns: Seq[String] = Nil,
    datetimeFormat: String = "d/M/yyyy H:mm:ss",
    dateFormat: String = "d/M/yyyy",
    xColumn: String = "longitude",
    yColumn: String = "latitude",
    srid: Int = 4326,
    forceNoGeometry: Boolean = false,
    forceTheGeom: Option[String] = None,
    /** European-style floats: decimal comma + thousand dot when set.
      * Reference `float_comma_separator`/`float_thousand_separator`. */
    floatDecimalSeparator: String = ".",
    floatThousandSeparator: String = ",",
    /** Reference `chunk_size` — becomes the ingest write-partition row
      * target, the unit of retry/atomic append (`etl/etl.py:22,37-56`). */
    chunkSize: Int = 1000,
    idColumn: Option[String] = None,
    /** Reference `max_attempts` (`etl/etl.py:23`): per-batch write retry
      * budget; an exhausted budget reports `error` and the run continues
      * (`etl/etl.py:273-293`). */
    maxAttempts: Int = 3,
    /** Compat Q9 (`etl/etl.py:255-262`: Python `or` treats 0.0 as falsy):
      * when true, an exact-0.0 coordinate counts as missing -> NULL
      * geometry. Default false — Null Island rows keep their point. */
    zeroCoordAsMissing: Boolean = false,
    /** Fixed-mode alternative to reference quirk Q5 (`etl/etl.py:264-271`
      * renders every numeric as a float): when true, columns whose every
      * non-blank value is integral type as long instead of double.
      * Default false — reference-faithful all-floats typing. */
    inferIntegers: Boolean = false,
    /** Reference per-VALUE typing (`etl/etl.py:194-217`): each value
      * renders independently (float-parseable -> "1.0", else raw text)
      * into a string column — a mixed column keeps its numeric values
      * numeric-rendered instead of the column-vote downgrade to string.
      * Default false — column-vote typing. */
    valueLevelTypes: Boolean = false) {

  def normColumns: Seq[String] = columns.map(_.trim.toLowerCase)
  def normDateColumns: Seq[String] = dateColumns.map(_.trim.toLowerCase)
}

/** CSV scan + typing + geometry pipeline (reference operators T1-T5).
  *
  * The reference types each *value* independently at SQL-render time
  * (`etl/etl.py:194-217`); Spark columns are monotyped, so typing is
  * decided per *column* in a single aggregate pass over the data
  * (`inferColumnKinds`): a column whose every non-blank value
  * float-parses becomes `double`, date-config columns become
  * `timestamp`, everything else stays `string`. This is the set-oriented
  * restatement of the same cascade - float > date > string > NULL.
  */
object CsvIngest {

  sealed trait ColKind
  case object NumericCol extends ColKind
  case object IntegerCol extends ColKind
  case object DateCol extends ColKind
  case object StringCol extends ColKind

  val CorruptCol = "__corrupt_record"

  /** T1+T2: raw scan — all columns string-typed, headers normalized. */
  def scan(spark: SparkSession, path: String, cfg: IngestConfig): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("delimiter", cfg.delimiter)
      .option("encoding", cfg.encoding)
      .option("inferSchema", "false")
      // reference raises the csv field-size limit to max (etl/etl.py:127-139)
      .option("maxCharsPerColumn", "-1")
      .csv(path)
    TypeCascade.normalizeHeaders(df)
  }

  /** Scan in PERMISSIVE mode with a corrupt-record column so malformed
    * lines survive as rejectable rows instead of failing the load
    * (reference quirk Q4: continue-on-failure). */
  def scanWithCorrupt(spark: SparkSession, path: String,
      cfg: IngestConfig): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val header = scan(spark, path, cfg).schema.fieldNames
    val schema = StructType(
      header.map(StructField(_, StringType)) :+ StructField(CorruptCol, StringType))
    val df = spark.read
      .option("header", "true")
      .option("delimiter", cfg.delimiter)
      .option("encoding", cfg.encoding)
      .option("maxCharsPerColumn", "-1")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema)
      .csv(path)
    df
  }

  /** Decide each requested column's kind in ONE distributed aggregate pass
    * (no driver-side row loop; scales to any row count — the map-side
    * partial aggregation makes this a single scan + tiny shuffle). */
  def inferColumnKinds(df: DataFrame, cfg: IngestConfig): Map[String, ColKind] = {
    val candidates = (if (cfg.normColumns.nonEmpty) cfg.normColumns
                      else df.columns.toSeq)
      .filter(df.columns.contains)
    val dateSet = cfg.normDateColumns.toSet
    val (dateCols, rest) = candidates.partition(dateSet.contains)
    if (rest.isEmpty)
      return (dateCols.map(_ -> DateCol)).toMap
    val aggs = rest.flatMap { c =>
      val parsed = TypeCascade.parseLocaleFloat(col(c),
        cfg.floatDecimalSeparator, cfg.floatThousandSeparator)
      val parsedInt = TypeCascade.parseLocaleLong(col(c),
        cfg.floatDecimalSeparator, cfg.floatThousandSeparator)
      val nonBlank = trim(col(c)).isNotNull && trim(col(c)) =!= ""
      Seq(
        count(when(nonBlank, 1)).as(s"nb_$c"),
        count(when(nonBlank && parsed.isNull, 1)).as(s"bad_$c"),
        count(when(nonBlank && parsedInt.isNull, 1)).as(s"badint_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val kinds = rest.map { c =>
      val nonBlank = row.getAs[Long](s"nb_$c")
      val unparseable = row.getAs[Long](s"bad_$c")
      val unparseableInt = row.getAs[Long](s"badint_$c")
      c -> (if (nonBlank == 0 || unparseable > 0) StringCol
            else if (cfg.inferIntegers && unparseableInt == 0) IntegerCol
            else NumericCol)
    }
    (kinds ++ dateCols.map(_ -> DateCol)).toMap
  }

  /** T3+T4+T5: typed projection in config order, `the_geom` first (the
    * reference's insert column order, `etl/etl.py:303-304`). */
  def typedProjection(df: DataFrame, cfg: IngestConfig,
      kinds: Map[String, ColKind],
      passthrough: Seq[String] = Nil): DataFrame = {
    val outCols = (if (cfg.normColumns.nonEmpty) cfg.normColumns
                   else df.columns.toSeq
      .filterNot(c => c == cfg.xColumn.toLowerCase || c == cfg.yColumn.toLowerCase))
      .filterNot(passthrough.contains)
    val geom: Column =
      if (cfg.forceNoGeometry) lit(null).as("the_geom")
      else cfg.forceTheGeom match {
        // passthrough: raw hex-WKB string, never float-parsed (quirk Q12)
        case Some(g) => col(g.trim.toLowerCase).as("the_geom")
        case None => GeomFunctions.synthesizePoint(
          col(cfg.xColumn.trim.toLowerCase), col(cfg.yColumn.trim.toLowerCase),
          cfg.srid, cfg.floatDecimalSeparator, cfg.floatThousandSeparator,
          cfg.zeroCoordAsMissing)
          .as("the_geom")
      }
    val typed = outCols.map { c =>
      kinds.getOrElse(c, StringCol) match {
        case DateCol => TypeCascade.parseDate(col(c),
          cfg.datetimeFormat, cfg.dateFormat).as(c)
        case _ if cfg.valueLevelTypes => TypeCascade.valueLevelRender(
          col(c), cfg.floatDecimalSeparator, cfg.floatThousandSeparator).as(c)
        case NumericCol => TypeCascade.parseLocaleFloat(col(c),
          cfg.floatDecimalSeparator, cfg.floatThousandSeparator).as(c)
        case IntegerCol => TypeCascade.parseLocaleLong(col(c),
          cfg.floatDecimalSeparator, cfg.floatThousandSeparator).as(c)
        case StringCol => TypeCascade.blankToNull(col(c)).as(c)
      }
    }
    df.select((geom +: typed) ++ passthrough.map(col): _*)
  }

  /** Full pipeline: scan -> infer -> typed projection. */
  def ingest(spark: SparkSession, path: String, cfg: IngestConfig): DataFrame = {
    val raw = scan(spark, path, cfg)
    typedProjection(raw, cfg, inferColumnKinds(raw, cfg))
  }
}
