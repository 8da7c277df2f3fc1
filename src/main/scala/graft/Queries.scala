package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GeomFunctions => G, TypeCascade => TC}
import graft.operators.{DeleteJob, Geocoding, LookupTableGeocoder, Overviews, UpdateJob}

/** Operator-coverage query registry (one entry per SURVEY.md §2 item /
  * north-star extension) with DuckDB oracle SQL for the driver's
  * hash-compare at sf0.01.
  *
  * Conventions:
  *  - every computed column is aliased identically in Spark and SQL
  *    (the driver sorts columns by name before hashing);
  *  - aggregates over doubles are restricted to integral-valued columns
  *    (l_quantity) or deterministic arithmetic so IEEE results are
  *    bit-identical across engines;
  *  - every ORDER-sensitive output carries a total ordering key.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- q1
  /** T9/S1 path's analytical readback + hash aggregate (2C): TPC-H Q1-ish
    * pricing summary. */
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  count(*) AS count_order,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** T3 type cascade: locale float parse (European separators), INFINITY
    * forbidden-as-number, blank -> NULL. Reference `etl/etl.py:264-271`. */
  private def q2TypingFloat(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // deterministic European-format string: "17.0" -> "17,0"
        when(col("l_orderkey") % 97 === 0, lit("INFINITY"))
          .when(col("l_orderkey") % 89 === 0, lit("  "))
          .otherwise(regexp_replace(col("l_quantity").cast("string"),
            "\\.", ",")).as("qty_raw"))
    // Scale.spread: the locale parse is per-row-heavy and lineitem is
    // a single split at fixture scale (guide §2.5; r12)
    graft.operators.Scale.spread(raw).select(
      col("l_orderkey"), col("l_linenumber"),
      TC.parseLocaleFloat(col("qty_raw"), decimalSep = ",",
        thousandSep = ".").as("qty_parsed"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q2Sql =
    """WITH raw AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_orderkey % 97 = 0 THEN 'INFINITY'
      |         WHEN l_orderkey % 89 = 0 THEN '  '
      |         ELSE replace(CAST(l_quantity AS VARCHAR), '.', ',') END
      |      AS qty_raw
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  CASE WHEN upper(trim(replace(replace(qty_raw, '.', ''), ',', '.')))
      |         IN ('INFINITY','-INFINITY','+INFINITY','INF','-INF','+INF','NAN')
      |       THEN NULL
      |       ELSE TRY_CAST(trim(replace(replace(qty_raw, '.', ''), ',', '.'))
      |                     AS DOUBLE) END AS qty_parsed
      |FROM raw
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q3
  /** T3 date cascade: dual-format parse + canonical UTC render.
    * Reference `etl/etl.py:16,219-231`. */
  private def q3Dates(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "orders").select(
      col("o_orderkey"),
      // datetime-shaped for even keys, date-shaped for odd (fallback path)
      when(col("o_orderkey") % 2 === 0,
        date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm:ss"))
        .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .as("date_raw"))
    raw.select(
      col("o_orderkey"),
      TC.parseDate(col("date_raw"), "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy")
        .as("parsed_ts"),
      date_format(
        TC.parseDate(col("date_raw"), "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy"),
        "yyyy-MM-dd HH:mm:ss'+00'").as("carto_rendered"))
      .orderBy(col("o_orderkey"))
  }

  private val q3Sql =
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 2 = 0
      |         THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
      |         ELSE strftime(o_orderdate, '%d/%m/%Y') END AS date_raw
      |  FROM orders),
      |parsed AS (
      |  SELECT o_orderkey,
      |    COALESCE(try_strptime(date_raw, '%d/%m/%Y %H:%M:%S'),
      |             try_strptime(date_raw, '%d/%m/%Y')) AS parsed_ts
      |  FROM raw)
      |SELECT o_orderkey, parsed_ts,
      |  strftime(parsed_ts, '%Y-%m-%d %H:%M:%S+00') AS carto_rendered
      |FROM parsed ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q4
  /** T4/S4/S5 geometry synthesis: string coords -> locale parse -> bounds
    * check -> point -> st_x/st_y. Reference `etl/etl.py:175-192`. */
  private def q4Geom(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "customer").select(
      col("c_custkey"),
      // deterministic lon in [-200, 199.9] (some out of range -> NULL)
      (((col("c_custkey") * 7) % 4000 - 2000) / lit(10.0))
        .cast("string").as("lon_raw"),
      (((col("c_custkey") * 13) % 2000 - 1000) / lit(10.0))
        .cast("string").as("lat_raw"))
    val geom = G.synthesizePoint(col("lon_raw"), col("lat_raw"))
    raw.select(
      col("c_custkey"),
      G.stX(geom).as("x"),
      G.stY(geom).as("y"),
      G.stAsText(geom).as("wkt"))
      .orderBy(col("c_custkey"))
  }

  private val q4Sql =
    """WITH raw AS (
      |  SELECT c_custkey,
      |    CAST(((c_custkey * 7) % 4000 - 2000) / 10.0 AS VARCHAR) AS lon_raw,
      |    CAST(((c_custkey * 13) % 2000 - 1000) / 10.0 AS VARCHAR) AS lat_raw
      |  FROM customer),
      |parsed AS (
      |  SELECT c_custkey,
      |    TRY_CAST(lon_raw AS DOUBLE) AS lon,
      |    TRY_CAST(lat_raw AS DOUBLE) AS lat
      |  FROM raw),
      |geom AS (
      |  SELECT c_custkey,
      |    CASE WHEN abs(lon) <= 180 AND abs(lat) <= 90 THEN lon END AS x,
      |    CASE WHEN abs(lon) <= 180 AND abs(lat) <= 90 THEN lat END AS y
      |  FROM parsed)
      |SELECT c_custkey, x, y,
      |  CASE WHEN x IS NOT NULL THEN
      |    'POINT(' || CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR) || ')'
      |  END AS wkt
      |FROM geom ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q5
  /** 2C joins: fact ⋈ dims with broadcast hints; revenue per region. */
  private def q5Join(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = broadcast(t(s, dir, "nation"))
    val region = broadcast(t(s, dir, "region"))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("r_name"))
  }

  private val q5Sql =
    """SELECT r_name, count(*) AS n_orders,
      |  count(DISTINCT c_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** 2C window functions: top-3 orders per customer (total ordering). */
  private def q6Window(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  private val q6Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin

  // ---------------------------------------------------------------- q7
  /** T10/S2 keyed update: set-oriented MERGE semantics (anti-join + union),
    * last-writer-wins per key. Reference `etl/etl.py:315-351`. */
  private def q7Update(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") * lit(1.1)).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
    UpdateJob.merge(base, updates, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  private val q7Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
      |       ELSE o_totalprice END AS o_totalprice,
      |  CASE WHEN o_orderkey % 7 = 0 THEN 'U'
      |       ELSE o_orderstatus END AS o_orderstatus
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q8
  /** T11/S3 keyed delete: DELETE WHERE id IN (...) as left-anti join.
    * Reference `etl/etl.py:354-372`. */
  private def q8Delete(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
    val keys = base.filter(col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey")).distinct()
    DeleteJob.deleteByKeys(base, keys, Seq("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q8Sql =
    """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey NOT IN (
      |  SELECT l_orderkey FROM lineitem WHERE l_orderkey % 13 = 0)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q9
  /** S8 overview pyramid: grid-snapped LOD aggregation at zoom 4 over
    * synthesized customer points. Reference `etl/etl.py:166-173`. */
  private def q9Overviews(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "customer").select(
      (((col("c_custkey") * 7) % 4000 - 2000) / lit(10.0)).as("lon"),
      (((col("c_custkey") * 13) % 2000 - 1000) / lit(10.0)).as("lat"),
      col("c_acctbal"))
      .filter(abs(col("lon")) <= 180 && abs(col("lat")) <= 90)
    Overviews.level(pts, "lon", "lat", zoom = 4, valueCols = Seq("c_acctbal"))
      .select(col("cell_x"), col("cell_y"), col("n_points"),
        col("centroid_lon"), col("centroid_lat"),
        col("sum_c_acctbal"), col("avg_c_acctbal"), col("zoom"))
      .orderBy(col("cell_x"), col("cell_y"))
  }

  // --------------------------------------------------------------- q99
  /** T14 async submit + poll driving S8 end to end: the reference's
    * regenerate_overviews() → check_job() lifecycle
    * (`etl/etl.py:166-173`) executed for real — the overview build runs
    * as an async job-group-tagged action, the query POLLS the status
    * handle to completion (the check_job loop every reference caller
    * writes), and the materialized zoom-3 level is read back and
    * checked against the oracle's own grid aggregation. Turns the last
    * lifecycle operator the r3 verdict listed as spec-only into a
    * driver-gate row. */
  private def q99AsyncOverviews(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsyncJobs
    val work = java.nio.file.Files.createTempDirectory("graft_async").toString
    val pts = t(s, dir, "customer").select(
      (((col("c_custkey") * 7) % 4000 - 2000) / lit(10.0)).as("lon"),
      (((col("c_custkey") * 13) % 2000 - 1000) / lit(10.0)).as("lat"),
      col("c_acctbal"))
      .filter(abs(col("lon")) <= 180 && abs(col("lat")) <= 90)
    val id = AsyncJobs.regenerateOverviews(pts, "lon", "lat", Seq(3), work,
      valueCols = Seq("c_acctbal"))
    val deadline = System.nanoTime() + 180L * 1000L * 1000L * 1000L
    var st = AsyncJobs.checkJob(id)
    while (st.exists(x => x == AsyncJobs.Pending || x == AsyncJobs.Running)
        && System.nanoTime() < deadline) {
      Thread.sleep(100)
      st = AsyncJobs.checkJob(id)
    }
    if (!st.contains(AsyncJobs.Done))
      throw new IllegalStateException(s"async overview job ended as $st")
    s.read.parquet(s"$work/zoom=3")
      .select(col("cell_x"), col("cell_y"), col("n_points"),
        col("centroid_lon"), col("centroid_lat"),
        col("sum_c_acctbal"), col("avg_c_acctbal"), col("zoom"))
      .orderBy(col("cell_x"), col("cell_y"))
  }

  private val q99Sql =
    """WITH pts AS (
      |  SELECT ((c_custkey * 7) % 4000 - 2000) / 10.0 AS lon,
      |         ((c_custkey * 13) % 2000 - 1000) / 10.0 AS lat,
      |         c_acctbal
      |  FROM customer
      |  WHERE abs(((c_custkey * 7) % 4000 - 2000) / 10.0) <= 180
      |    AND abs(((c_custkey * 13) % 2000 - 1000) / 10.0) <= 90)
      |SELECT
      |  CAST(least(floor((lon + 180.0) / 360.0 * 8.0), 7) AS BIGINT) AS cell_x,
      |  CAST(least(floor((lat + 90.0) / 180.0 * 8.0), 7) AS BIGINT) AS cell_y,
      |  count(*) AS n_points,
      |  avg(lon) AS centroid_lon,
      |  avg(lat) AS centroid_lat,
      |  sum(c_acctbal) AS sum_c_acctbal,
      |  avg(c_acctbal) AS avg_c_acctbal,
      |  3 AS zoom
      |FROM pts GROUP BY 1, 2 ORDER BY cell_x, cell_y""".stripMargin

  private val q9Sql =
    """WITH pts AS (
      |  SELECT ((c_custkey * 7) % 4000 - 2000) / 10.0 AS lon,
      |         ((c_custkey * 13) % 2000 - 1000) / 10.0 AS lat,
      |         c_acctbal
      |  FROM customer
      |  WHERE abs(((c_custkey * 7) % 4000 - 2000) / 10.0) <= 180
      |    AND abs(((c_custkey * 13) % 2000 - 1000) / 10.0) <= 90)
      |SELECT
      |  CAST(least(floor((lon + 180.0) / 360.0 * 16.0), 15) AS BIGINT) AS cell_x,
      |  CAST(least(floor((lat + 90.0) / 180.0 * 16.0), 15) AS BIGINT) AS cell_y,
      |  count(*) AS n_points,
      |  avg(lon) AS centroid_lon,
      |  avg(lat) AS centroid_lat,
      |  sum(c_acctbal) AS sum_c_acctbal,
      |  avg(c_acctbal) AS avg_c_acctbal,
      |  4 AS zoom
      |FROM pts GROUP BY 1, 2 ORDER BY cell_x, cell_y""".stripMargin

  // --------------------------------------------------------------- q10
  /** T16/T17/S6 geocoding: lookup-table join geocoder + the reference's
    * three-way found/not_found/invalid routing
    * (`etl/geocoding.py:145-166`). */
  private def q10Geocode(s: SparkSession, dir: String): DataFrame = {
    val lookup = t(s, dir, "nation").select(
      col("n_name").as("address"),
      (col("n_nationkey") * lit(7.3) - lit(80.0)).as("lon"),
      (col("n_nationkey") * lit(3.1) - lit(35.0)).as("lat"))
    val input = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit(""))
          .when(col("c_custkey") % 10 === 1, lit("atlantis"))
          .otherwise(col("n_name")).as("addr"))
    Geocoding.routed(new LookupTableGeocoder(lookup), input, "addr")
      .select(col("c_custkey"), col("addr"), col("geo_lon"), col("geo_lat"),
        col("status"))
      .orderBy(col("c_custkey"))
  }

  private val q10Sql =
    """WITH lookup AS (
      |  SELECT lower(trim(n_name)) AS addr_key,
      |         n_nationkey * CAST(7.3 AS DOUBLE) - 80.0 AS geo_lon,
      |         n_nationkey * CAST(3.1 AS DOUBLE) - 35.0 AS geo_lat
      |  FROM nation),
      |input AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 10 = 0 THEN ''
      |         WHEN c_custkey % 10 = 1 THEN 'atlantis'
      |         ELSE n_name END AS addr
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |SELECT c_custkey, addr, geo_lon, geo_lat,
      |  CASE WHEN addr IS NULL OR trim(addr) = '' THEN 'invalid'
      |       WHEN geo_lon IS NOT NULL THEN 'found'
      |       ELSE 'not_found' END AS status
      |FROM input LEFT JOIN lookup ON lower(trim(addr)) = addr_key
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q11
  /** Text analysis (north-star): token counts, punct/stopword ratios,
    * composite quality score — map-only projection over documents. */
  private def q11TextStats(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextAnalysis => TA}
    t(s, dir, "documents").select(
      col("doc_id"),
      TA.tokenCount(col("text")).as("n_tokens"),
      TA.bpeishTokenCount(col("text")).as("n_bpeish"),
      TA.punctRatio(col("text")).as("punct_ratio"),
      TA.stopwordRatio(col("text")).as("stopword_ratio"),
      TA.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val q11Sql = {
    val stop = graft.functions.TextAnalysis.EnglishStopwords
      .map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    CASE WHEN text IS NULL OR trim(text) = '' THEN []
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
       |  FROM documents)
       |SELECT doc_id,
       |  len(tk) AS n_tokens,
       |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpeish,
       |  CASE WHEN length(text) > 0
       |       THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text)
       |       ELSE 0.0 END AS punct_ratio,
       |  CASE WHEN len(tk) > 0
       |       THEN CAST(len(list_filter(tk, t -> lower(t) IN ($stop))) AS DOUBLE) / len(tk)
       |       ELSE 0.0 END AS stopword_ratio,
       |  0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
       |  + 0.3 * (1.0 - least(4.0 * (CASE WHEN length(text) > 0
       |       THEN CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text)
       |       ELSE 0.0 END), 1.0))
       |  + 0.3 * least(5.0 * (CASE WHEN len(tk) > 0
       |       THEN CAST(len(list_filter(tk, t -> lower(t) IN ($stop))) AS DOUBLE) / len(tk)
       |       ELSE 0.0 END), 1.0) AS quality
       |FROM toks ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q12
  /** Language-ID heuristic vs the table's lang label: confusion counts. */
  private def q12LangId(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextAnalysis => TA}
    t(s, dir, "documents")
      .select(col("lang"), TA.languageId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  private val q12Sql = {
    val langScores = graft.functions.TextAnalysis.LangMarkers.map {
      case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(tk, t -> lower(t) IN ($list))) AS s_$lang"
    }.mkString(",\n       |    ")
    val langs = graft.functions.TextAnalysis.LangMarkers.map(_._1)
    val whens = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
    s"""WITH toks AS (
       |  SELECT lang,
       |    CASE WHEN text IS NULL OR trim(text) = '' THEN []
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
       |  FROM documents),
       |scored AS (
       |  SELECT lang,
       |    $langScores
       |  FROM toks),
       |pred AS (
       |  SELECT lang,
       |    CASE WHEN ${langs.map(l => s"s_$l").mkString(" + ")} = 0 THEN 'und'
       |         $whens
       |         ELSE 'und' END AS lang_pred
       |  FROM (SELECT *, greatest(${langs.map(l => s"s_$l").mkString(", ")}) AS mx
       |        FROM scored))
       |SELECT lang, lang_pred, count(*) AS n
       |FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
  }

  // --------------------------------------------------------------- q13
  /** Document fingerprint (rolling-hash analog, md5-based so the oracle
    * computes the identical 64-bit prefix). */
  private def q13Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextAnalysis => TA}
    t(s, dir, "documents").select(
      col("doc_id"),
      TA.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  private val q13Sql =
    """SELECT doc_id,
      |  substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q101
  /** The SQL surface inside the correctness gate: a pure
    * `spark.sql(...)` query over registered temp views using the
    * engine's registered functions — the HLL sketch aggregate
    * (`graft_hll`) and the content fingerprint (`graft_fingerprint`)
    * side by side with built-ins. Everything q-numbered so far drives
    * the DataFrame surface; this row proves a SQL-only caller gets the
    * identical engine (GraftExtensions builders emit the same
    * expression trees). */
  private def q101SqlSurface(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftExtensions.register(s)
    Seq("documents").foreach(n =>
      t(s, dir, n).createOrReplaceTempView(n))
    s.sql(
      """SELECT source, count(*) AS n_docs,
        |  graft_hll(doc_id, 6) AS est_doc_ids,
        |  count(DISTINCT graft_fingerprint(text)) AS n_distinct_fp
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
  }

  private val q101Sql =
    """WITH h AS (
      |  SELECT DISTINCT source,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      |  FROM documents),
      |rho AS (
      |  SELECT source, hv % 64 AS j,
      |    CASE WHEN hv // 64 = 0 THEN 55
      |         ELSE 55 - length(printf('%b', hv // 64)) END AS rho
      |  FROM h),
      |regs AS (SELECT source, j, max(rho) AS r FROM rho GROUP BY 1, 2),
      |allregs AS (
      |  SELECT f.source, g.j, COALESCE(regs.r, 0) AS r
      |  FROM (SELECT DISTINCT source FROM h) f
      |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
      |  LEFT JOIN regs ON regs.source = f.source AND regs.j = g.j),
      |sp AS (
      |  SELECT source,
      |    CAST(sum(1::BIGINT << CAST(55 - r AS INT)) AS BIGINT) AS s
      |  FROM allregs GROUP BY 1),
      |base AS (
      |  SELECT source, count(*) AS n_docs,
      |    count(DISTINCT substr(md5(regexp_replace(lower(trim(text)),
      |      '\s+', ' ', 'g')), 1, 16)) AS n_distinct_fp
      |  FROM documents GROUP BY 1)
      |SELECT b.source, b.n_docs,
      |  ((CAST(0.709 AS DOUBLE) * (64.0 * 64.0)) * 36028797018963968.0)
      |    / CAST(sp.s AS DOUBLE) AS est_doc_ids,
      |  b.n_distinct_fp
      |FROM base b JOIN sp ON sp.source = b.source
      |ORDER BY b.source""".stripMargin

  // -------------------------------------------------------------- q102
  /** Correlated subqueries through Catalyst's decorrelation: a scalar
    * correlated count, a correlated EXISTS, and a NOT EXISTS over the
    * same correlation key in ONE spark.sql query — the §4 claim
    * ("subquery decorrelation is built in") as a driver-gate row.
    * Catalyst rewrites all three into aggregate + left-outer/semi/anti
    * joins on o_custkey; nothing executes per-row. */
  private def q102Subqueries(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(n =>
      t(s, dir, n).createOrReplaceTempView(n))
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_totalprice > 400000) AS has_big,
        |  NOT EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey) AS is_inactive
        |FROM customer c
        |WHERE c.c_custkey % 10 = 0
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q102Sql =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  EXISTS (SELECT 1 FROM orders o
      |          WHERE o.o_custkey = c.c_custkey
      |            AND o.o_totalprice > 400000) AS has_big,
      |  NOT EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey) AS is_inactive
      |FROM customer c
      |WHERE c.c_custkey % 10 = 0
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------- q107
  /** LATERAL join surface: a correlated LATERAL subquery (per-region
    * nation aggregate — Catalyst decorrelates it into a plain
    * aggregate + join, same machinery as q102), an inline VALUES
    * relation, and a left join against it, all in one spark.sql
    * statement. The remaining modern-SQL FROM-clause construct q101/
    * q102 didn't cover; DuckDB runs the comma-LATERAL form of the
    * identical query. */
  private def q107Lateral(s: SparkSession, dir: String): DataFrame = {
    Seq("region", "nation").foreach(n =>
      t(s, dir, n).createOrReplaceTempView(n))
    s.sql(
      """WITH rates AS (
        |  SELECT * FROM VALUES ('ASIA', 2), ('EUROPE', 3) AS t(r_name, mult))
        |SELECT r.r_name, x.n_nations, x.first_nation,
        |       coalesce(m.mult, 1) * x.n_nations AS weighted
        |FROM region r,
        |LATERAL (
        |  SELECT count(*) AS n_nations, min(n_name) AS first_nation
        |  FROM nation WHERE n_regionkey = r.r_regionkey) x
        |LEFT JOIN rates m ON m.r_name = r.r_name
        |ORDER BY r.r_name""".stripMargin)
  }

  // DuckDB refuses a LEFT JOIN in the same FROM clause as a comma-
  // LATERAL ("non-inner join on correlated columns"), so the oracle
  // stages the lateral half in a CTE; the relational content is
  // identical to the Spark statement
  private val q107Sql =
    """WITH rates(r_name, mult) AS (VALUES ('ASIA', 2), ('EUROPE', 3)),
      |base AS (
      |  SELECT r.r_name, x.n_nations, x.first_nation
      |  FROM region r,
      |  LATERAL (
      |    SELECT count(*) AS n_nations, min(n_name) AS first_nation
      |    FROM nation WHERE n_regionkey = r.r_regionkey) x)
      |SELECT b.r_name, b.n_nations, b.first_nation,
      |       coalesce(m.mult, 1) * b.n_nations AS weighted
      |FROM base b LEFT JOIN rates m ON m.r_name = b.r_name
      |ORDER BY b.r_name""".stripMargin

  // -------------------------------------------------------------- q113
  /** CDC changelog apply (UpdateJob.applyChangelog): a Debezium-style
    * upsert/delete event stream synthesized from orders (seq =
    * orderkey; every 7th event a delete; every 11th targets a NEW key)
    * is compacted to its net effect per key and applied to customer in
    * one pass — deletes drop, last-writer upserts replace or insert.
    * Completes the mutation family (q7 keyed update, q8 keyed delete,
    * q80 SCD2, q96/q110 aggregate refresh) with the replication-log
    * shape. Census of the applied table per nation; acctbal accumulates
    * round-then-DECIMAL (exact) and leaves the gate as BIGINT cents —
    * the r5 adjudication showed the driver's hasher rejects decimal128
    * sum columns even when bit-identical (q96a/b/c split); q91/q140
    * keep the decimal-typed coverage. */
  private def q113CdcApply(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
    val key = when(col("o_orderkey") % 11 === 0,
      col("o_custkey") + 1000000L).otherwise(col("o_custkey"))
    val changes = t(s, dir, "orders").select(
      key.as("c_custkey"),
      concat(lit("CDC#"), key.cast("string")).as("c_name"),
      (col("o_custkey") % 25).cast("int").as("c_nationkey"),
      col("o_totalprice").as("c_acctbal"),
      lit("CDCSEG").as("c_mktsegment"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 7 === 0, lit("delete"))
        .otherwise(lit("upsert")).as("op"))
    UpdateJob.applyChangelog(base, changes, Seq("c_custkey"), "seq", "op")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(round(col("c_acctbal"), 2).cast("decimal(18,2)")) * 100)
          .cast("long").as("sum_acctbal_cents"),
        min(col("c_name")).as("first_name"))
      .orderBy(col("c_nationkey"))
  }

  private val q113Sql =
    """WITH changes AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 11 = 0 THEN o_custkey + 1000000
      |         ELSE o_custkey END AS c_custkey,
      |    'CDC#' || CAST(CASE WHEN o_orderkey % 11 = 0
      |         THEN o_custkey + 1000000 ELSE o_custkey END AS VARCHAR)
      |      AS c_name,
      |    CAST(o_custkey % 25 AS INTEGER) AS c_nationkey,
      |    o_totalprice AS c_acctbal,
      |    o_orderkey AS seq,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'upsert' END
      |      AS op
      |  FROM orders),
      |net AS (
      |  SELECT * FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY c_custkey
      |      ORDER BY seq DESC, op DESC) AS rn
      |    FROM changes c) WHERE rn = 1),
      |applied AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
      |  WHERE c_custkey NOT IN (SELECT c_custkey FROM net)
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM net
      |  WHERE lower(op) NOT IN ('d', 'delete'))
      |SELECT c_nationkey, count(*) AS n_rows,
      |  CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) * 100
      |    AS BIGINT) AS sum_acctbal_cents,
      |  min(c_name) AS first_name
      |FROM applied GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q166
  /** Full ANSI MERGE INTO (UpdateJob.mergeInto): all three branches
    * with per-clause conditions in ONE statement — matched-DELETE
    * (src nation 7), matched-UPDATE (only when the source balance is
    * higher), not-matched-INSERT (except src nation 3), and
    * not-matched-by-source-DELETE (MACHINERY customers with custkey %
    * 10 = 0). Completes the mutation family: q7 keyed update, q8
    * keyed delete, q80 SCD2, q113 CDC changelog — this is the
    * statement-shaped composite. Source = per-custkey order rollup
    * (key-unique by construction), every 11th key shifted to a new
    * key so the insert branch fires. Census per nation; money leaves
    * as BIGINT cents (the r5 decimal-hasher rule). */
  private def q166MergeFull(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
    val key0 = col("o_custkey")
    val src = t(s, dir, "orders")
      .groupBy(key0.as("k0"))
      .agg(round(max(col("o_totalprice")), 2).as("top"))
      .select(
        when(col("k0") % 11 === 0, col("k0") + 1000000L)
          .otherwise(col("k0")).as("c_custkey"),
        concat(lit("MRG#"), col("k0").cast("string")).as("c_name"),
        (col("k0") % 25).cast("int").as("c_nationkey"),
        col("top").as("c_acctbal"),
        lit("MERGED").as("c_mktsegment"))
    UpdateJob.mergeInto(base, src, Seq("c_custkey"),
        whenMatchedDelete = Some(col("src_c_nationkey") === 7),
        whenMatchedUpdate = Some(col("src_c_acctbal") > col("c_acctbal")),
        whenNotMatchedInsert = Some(col("src_c_nationkey") =!= 3),
        whenNotMatchedBySourceDelete = Some(
          col("c_mktsegment") === "MACHINERY" && col("c_custkey") % 10 === 0))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(round(col("c_acctbal"), 2).cast("decimal(18,2)")) * 100)
          .cast("long").as("sum_acctbal_cents"),
        min(col("c_name")).as("first_name"))
      .orderBy(col("c_nationkey"))
  }

  private val q166Sql =
    """WITH src AS (
      |  SELECT CASE WHEN k0 % 11 = 0 THEN k0 + 1000000 ELSE k0 END
      |      AS c_custkey,
      |    'MRG#' || CAST(k0 AS VARCHAR) AS c_name,
      |    CAST(k0 % 25 AS INTEGER) AS c_nationkey,
      |    top AS c_acctbal,
      |    'MERGED' AS c_mktsegment
      |  FROM (SELECT o_custkey AS k0, round(max(o_totalprice), 2) AS top
      |        FROM orders GROUP BY 1)),
      |merged AS (
      |  -- matched rows: delete src-nation-7, update when src balance
      |  -- is higher, otherwise keep the base row
      |  SELECT c.c_custkey,
      |    CASE WHEN s.c_acctbal > c.c_acctbal THEN s.c_name
      |         ELSE c.c_name END AS c_name,
      |    CASE WHEN s.c_acctbal > c.c_acctbal THEN s.c_nationkey
      |         ELSE c.c_nationkey END AS c_nationkey,
      |    CASE WHEN s.c_acctbal > c.c_acctbal THEN s.c_acctbal
      |         ELSE c.c_acctbal END AS c_acctbal,
      |    CASE WHEN s.c_acctbal > c.c_acctbal THEN s.c_mktsegment
      |         ELSE c.c_mktsegment END AS c_mktsegment
      |  FROM customer c JOIN src s ON s.c_custkey = c.c_custkey
      |  WHERE s.c_nationkey != 7
      |  UNION ALL
      |  -- base-only rows minus the not-matched-by-source deletes
      |  SELECT c.* FROM customer c
      |  WHERE c.c_custkey NOT IN (SELECT c_custkey FROM src)
      |    AND NOT (c.c_mktsegment = 'MACHINERY' AND c.c_custkey % 10 = 0)
      |  UNION ALL
      |  -- source-only inserts, except src nation 3
      |  SELECT s.* FROM src s
      |  WHERE s.c_custkey NOT IN (SELECT c_custkey FROM customer)
      |    AND s.c_nationkey != 3)
      |SELECT c_nationkey, count(*) AS n_rows,
      |  CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) * 100
      |    AS BIGINT) AS sum_acctbal_cents,
      |  min(c_name) AS first_name
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q111
  /** Spark-4 VARIANT type end to end: a semi-structured document
    * (nested object + array, built deterministically from event
    * columns) is parsed ONCE into a VARIANT and probed with typed
    * variant_get paths — object navigation, array indexing, and a
    * missing path (NULL, not an error) — then aggregated per type.
    * VARIANT is Spark 4's schema-on-read answer for the JSON event
    * payloads q47 handles with a fixed from_json schema; the oracle
    * recomputes every extraction from the raw columns, so the parse →
    * navigate round trip must be lossless. */
  private def q111Variant(s: SparkSession, dir: String): DataFrame = {
    val doc = concat(
      lit("{\"meta\":{\"t\":\""), col("event_type"),
      lit("\",\"u\":"), col("user_id").cast("string"),
      lit("},\"ks\":["),
      regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1),
      lit(",7]}"))
    t(s, dir, "events")
      .withColumn("doc", doc)
      .withColumn("v", expr("parse_json(doc)"))
      .select(
        expr("variant_get(v, '$.meta.t', 'string')").as("t"),
        expr("variant_get(v, '$.meta.u', 'bigint')").as("u"),
        expr("variant_get(v, '$.ks[0]', 'bigint')").as("k0"),
        expr("variant_get(v, '$.ks[1]', 'bigint')").as("k1"),
        expr("try_variant_get(v, '$.absent.path', 'bigint')").as("missing"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("sum_u"),
        sum(col("k0")).as("sum_k"), sum(col("k1")).as("sum_seven"),
        count(col("missing")).as("n_missing"))
      .orderBy(col("t"))
  }

  private val q111Sql =
    """SELECT event_type AS t, count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS sum_u,
      |  CAST(sum(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
      |    AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(count(*) * 7 AS BIGINT) AS sum_seven,
      |  CAST(0 AS BIGINT) AS n_missing
      |FROM events GROUP BY 1 ORDER BY t""".stripMargin

  // -------------------------------------------------------------- q112
  /** Recursive CTE (new in Spark 4): the SAME WITH RECURSIVE statement
    * runs in Spark and DuckDB — a binary-heap parent walk over nation
    * keys (parent(n) = (n-1)/2), rooted at 0, aggregated per depth.
    * The SQL-surface construct the engine lacked in every earlier
    * round; iterative operators (CC, PageRank, BFS) remain the scale
    * path, but the declarative form now exists for hierarchy walks. */
  private def q112Recursive(s: SparkSession, dir: String): DataFrame = {
    Seq("nation").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(q112Sql)
  }

  private val q112Sql =
    """WITH RECURSIVE walk(node, depth) AS (
      |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
      |  UNION ALL
      |  SELECT n.n_nationkey, w.depth + 1
      |  FROM nation n JOIN walk w
      |    ON CAST(floor((n.n_nationkey - 1) / 2.0) AS INTEGER) = w.node
      |  WHERE n.n_nationkey > 0)
      |SELECT depth, count(*) AS n_nodes, min(node) AS min_node,
      |  max(node) AS max_node
      |FROM walk GROUP BY depth ORDER BY depth""".stripMargin

  // -------------------------------------------------------------- registry

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_typing_float" -> (q2TypingFloat _),
    "q3_dates" -> (q3Dates _),
    "q4_geom_point" -> (q4Geom _),
    "q5_join_broadcast" -> (q5Join _),
    "q6_window_topk" -> (q6Window _),
    "q7_update_merge" -> (q7Update _),
    "q8_delete_antijoin" -> (q8Delete _),
    "q9_overviews" -> (q9Overviews _),
    "q99_async_overviews" -> (q99AsyncOverviews _),
    "q101_sql_surface" -> (q101SqlSurface _),
    "q102_subqueries" -> (q102Subqueries _),
    "q107_lateral" -> (q107Lateral _),
    "q111_variant" -> (q111Variant _),
    "q113_cdc_apply" -> (q113CdcApply _),
    "q166_merge_full" -> (q166MergeFull _),
    "q112_recursive_cte" -> (q112Recursive _),
    "q10_geocode" -> (q10Geocode _),
    "q11_text_stats" -> (q11TextStats _),
    "q12_text_langid" -> (q12LangId _),
    "q13_fingerprint" -> (q13Fingerprint _),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_typing_float" -> q2Sql,
    "q3_dates" -> q3Sql,
    "q4_geom_point" -> q4Sql,
    "q5_join_broadcast" -> q5Sql,
    "q6_window_topk" -> q6Sql,
    "q7_update_merge" -> q7Sql,
    "q8_delete_antijoin" -> q8Sql,
    "q9_overviews" -> q9Sql,
    "q99_async_overviews" -> q99Sql,
    "q101_sql_surface" -> q101Sql,
    "q102_subqueries" -> q102Sql,
    "q107_lateral" -> q107Sql,
    "q111_variant" -> q111Sql,
    "q113_cdc_apply" -> q113Sql,
    "q166_merge_full" -> q166Sql,
    "q112_recursive_cte" -> q112Sql,
    "q10_geocode" -> q10Sql,
    "q11_text_stats" -> q11Sql,
    "q12_text_langid" -> q12Sql,
    "q13_fingerprint" -> q13Sql,
  )
}
