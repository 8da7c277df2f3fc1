package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-value type-inference cascade, restated as pure
  * `Column` transforms (whole-stage-codegen friendly, no UDFs).
  *
  * Reference semantics (carto-etl `etl/etl.py:194-271`):
  *   - missing / empty / whitespace-only value -> NULL
  *   - column listed in `date_columns`         -> timestamp (datetime fmt,
  *     then date fmt; unparseable -> NULL)     (`etl/etl.py:219-231`)
  *   - float-parseable (locale separators stripped; the literal INFINITY
  *     is forbidden as a number)               -> double (`etl/etl.py:264-271`)
  *   - otherwise                               -> string (quotes escaped at
  *     the SQL-rendering edge only)            (`etl/etl.py:233-234`)
  *
  * All functions operate on string-typed input columns and are null-safe.
  */
object TypeCascade {

  /** Header normalization: trim + lowercase every column name.
    * Reference: `etl/etl.py:70-83` (InsensitiveDictReader/InsensitiveDict). */
  def normalizeHeaders(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Set[String]()
    val names = df.columns.map { c =>
      var n = c.trim.toLowerCase
      // disambiguate collisions deterministically (a_1, a_2, ...)
      if (seen.contains(n)) {
        var i = 1
        while (seen.contains(s"${n}_$i")) i += 1
        n = s"${n}_$i"
      }
      seen += n
      n
    }
    df.toDF(names.toIndexedSeq: _*)
  }

  /** Empty / whitespace-only string -> NULL (`etl/etl.py:195-205`). */
  def blankToNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(c)

  /** Locale-aware float parse. Strips `thousandSep`, replaces `decimalSep`
    * with '.', rejects the INFINITY family and NaN (reference forbids them
    * as numbers, `etl/etl.py:32,264-271`), then try-casts to double.
    * Returns NULL where the value is not numeric. */
  def parseLocaleFloat(
      c: Column,
      decimalSep: String = ".",
      thousandSep: String = ","): Column = {
    val noThousand =
      if (thousandSep.isEmpty) c
      else regexp_replace(c, java.util.regex.Pattern.quote(thousandSep), "")
    val normalized =
      if (decimalSep == ".") noThousand
      else regexp_replace(noThousand,
        java.util.regex.Pattern.quote(decimalSep), ".")
    val t = trim(normalized)
    val forbidden = upper(t).isin("INFINITY", "-INFINITY", "+INFINITY",
      "INF", "-INF", "+INF", "NAN")
    when(forbidden, lit(null).cast("double"))
      .otherwise(t.try_cast("double"))
  }

  /** Locale-aware integral parse: same separator normalization as
    * parseLocaleFloat, then try-cast to long — "1.5" (or any
    * non-integral text) is NULL. Used by the opt-in integer inference
    * (IngestConfig.inferIntegers, the fixed-mode alternative to
    * reference quirk Q5). */
  def parseLocaleLong(
      c: Column,
      decimalSep: String = ".",
      thousandSep: String = ","): Column = {
    val noThousand =
      if (thousandSep.isEmpty) c
      else regexp_replace(c, java.util.regex.Pattern.quote(thousandSep), "")
    val normalized =
      if (decimalSep == ".") noThousand
      else regexp_replace(noThousand,
        java.util.regex.Pattern.quote(decimalSep), ".")
    trim(normalized).try_cast("long")
  }

  /** Dual-format date parse: try datetimeFmt, then dateFmt; unparseable ->
    * NULL. Reference renders to UTC second precision (`etl/etl.py:16,219-231`).
    * Formats are Java DateTimeFormatter patterns. */
  def parseDate(c: Column, datetimeFmt: String, dateFmt: String): Column =
    coalesce(
      try_to_timestamp(blankToNull(c), lit(datetimeFmt)),
      try_to_timestamp(blankToNull(c), lit(dateFmt)))

  /** Full cascade for one column given job config: date column -> timestamp;
    * numeric-looking -> double; else trimmed-empty->NULL string. The output
    * type is the union shape the reference renders: we keep three typed
    * variants and the caller picks per column (schema-per-column, not
    * per-value — Spark columns are monotyped, so the *inferred* column type
    * is decided by majority at ingest, see CsvIngest.inferColumnType). */
  def typedColumn(
      c: Column,
      isDateColumn: Boolean,
      datetimeFmt: String,
      dateFmt: String,
      decimalSep: String = ".",
      thousandSep: String = ","): Column =
    if (isDateColumn) parseDate(c, datetimeFmt, dateFmt)
    else {
      val asFloat = parseLocaleFloat(c, decimalSep, thousandSep)
      // value-level cascade: float if parseable else string. A Spark column
      // must be monotyped, so the engine exposes both forms; ingest decides.
      asFloat
    }

  /** Per-VALUE cascade rendering — the reference's literal typing
    * (`etl/etl.py:194-217`): each value independently renders as a float
    * if it parses ("1" -> "1.0") and as raw text otherwise, blank ->
    * NULL. A Spark column is monotyped, so the faithful restatement is a
    * string column holding the rendered literals (exactly what the
    * reference interpolates into SQL text). Opt-in via
    * IngestConfig.valueLevelTypes.
    *
    * Rendering is CPython str(float) via the codegen'd
    * [[graft.expressions.PyFloatReprExpression]]: positional digits for
    * decimal exponents in [-4, 16), Python-style scientific notation
    * ("1e-05", "1.5e+16") outside — including the |x| < 1e-4 and
    * >= 1e16 ranges where the previous scale-17 decimal rendering
    * diverged from the reference. */
  def valueLevelRender(
      c: Column,
      decimalSep: String = ".",
      thousandSep: String = ","): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => CB, expression => E}
    val f = parseLocaleFloat(c, decimalSep, thousandSep)
    when(trim(c) === "" || c.isNull, lit(null).cast("string"))
      .when(f.isNotNull, CB(graft.expressions.PyFloatReprExpression(E(f))))
      .otherwise(c)
  }

  /** SQL string escaping (reference `etl/etl.py:233-234`): ' -> ''.
    * Only needed at a SQL-text-generating edge (e.g. JDBC passthrough). */
  def escapeSqlQuotes(c: Column): Column = regexp_replace(c, "'", "''")
}
