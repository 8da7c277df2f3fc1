package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GeomFunctions => G, TypeCascade => TC}
import graft.operators.RowNumbers
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

  // -------------------------------------------------------------- export

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_row_slice" -> (q33RowSlice _),
    "q34_header_norm" -> (q34HeaderNorm _),
    "q35_projection" -> (q35Projection _),
    "q36_cte" -> (q36Cte _),
  )

  val oracles: Map[String, String] = Map(
    "q33_row_slice" -> q33Sql,
    "q34_header_norm" -> q34Sql,
    "q35_projection" -> q35Sql,
    "q36_cte" -> q36Sql,
  )
}
