package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * pattern): a suite of named constraints evaluated over a table in ONE
  * aggregation pass, each yielding an exact satisfaction fraction and a
  * pass/fail verdict. The validation gate an ingestion pipeline runs
  * before publishing a 100 TB drop — and the complement of the Profiler
  * (which describes; this asserts).
  *
  * Every scalar expectation compiles to one conditional-count aggregate
  * column, so N expectations are ONE scan + ONE partial+final aggregate
  * — never N passes. Metrics are exact integer-count ratios (one double
  * division at the end), so results are partition-order independent and
  * oracle-reproducible. Referential-integrity checks need the foreign
  * table and run as a separate count-distinct-free semi-join branch,
  * unioned in.
  */
object Expectations {

  /** One scalar expectation: `name`, a row `predicate` (NULL counts as
    * a violation unless the predicate handles it), and the minimum
    * satisfied fraction to pass (1.0 = every row). */
  final case class Expect(name: String, predicate: Column,
      minFraction: Double = 1.0) {
    require(minFraction >= 0.0 && minFraction <= 1.0,
      s"minFraction ($minFraction) must be in [0, 1]")
  }

  /** Convenience constructors mirroring the classic suite. */
  def complete(colName: String, minFraction: Double = 1.0): Expect =
    Expect(s"complete($colName)", col(colName).isNotNull, minFraction)

  def inRange(colName: String, lo: Double, hi: Double,
      minFraction: Double = 1.0): Expect =
    Expect(s"in_range($colName)",
      col(colName).isNotNull && col(colName) >= lo && col(colName) <= hi,
      minFraction)

  def inSet(colName: String, values: Seq[String],
      minFraction: Double = 1.0): Expect =
    Expect(s"in_set($colName)",
      col(colName).isInCollection(values), minFraction)

  def matches(colName: String, regex: String,
      minFraction: Double = 1.0): Expect =
    Expect(s"matches($colName)",
      col(colName).isNotNull && col(colName).rlike(regex), minFraction)

  /** Evaluate the scalar suite plus optional non-scalar checks:
    *
    *  - `unique`: column sets that must be row-unique — each costs one
    *    extra aggregate by the key (distinct-key count vs row count).
    *  - `refs`: (fkCol, dimTable, pkCol) referential-integrity checks —
    *    each costs one semi-join + count.
    *
    * Output: (check_name, n_rows, n_ok, fraction, pass), one row per
    * constraint, ordered by name ("constraint" is a reserved word in
    * ANSI/DuckDB SQL — the neutral name keeps the oracle quoting-free). */
  def run(df: DataFrame, expects: Seq[Expect],
      unique: Seq[Seq[String]] = Nil,
      refs: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    require(expects.nonEmpty || unique.nonEmpty || refs.nonEmpty,
      "expectation suite is empty")
    val total = count(lit(1)).as("__n")
    val scalarAggs = expects.zipWithIndex.map { case (e, i) =>
      sum(when(e.predicate, 1L).otherwise(0L)).as(s"__ok$i")
    }
    val branches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (expects.nonEmpty) {
      val row = df.agg(total, scalarAggs: _*)
      branches += row.select(explode(array(expects.zipWithIndex.map {
        case (e, i) =>
          struct(lit(e.name).as("check_name"), col("__n").as("n_rows"),
            col(s"__ok$i").as("n_ok"), lit(e.minFraction).as("__minf"))
      }: _*)).as("c")).select(col("c.*"))
    }
    unique.foreach { cols =>
      require(cols.nonEmpty, "unique check needs at least one column")
      val name = s"unique(${cols.mkString(",")})"
      // distinct KEY count via pre-aggregation (one shuffle on the key,
      // map-side partial), not count(distinct struct)'s expand path
      val keyCounts = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
      branches += keyCounts.agg(
          sum(col("__c")).as("n_rows"),
          sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_ok"))
        .select(lit(name).as("check_name"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("n_ok"), lit(0L)).as("n_ok"),
          lit(1.0).as("__minf"))
    }
    refs.foreach { case (fk, dim, pk) =>
      val name = s"ref($fk -> $pk)"
      val keys = dim.select(col(pk).as(fk)).distinct()
      val ok = df.select(col(fk)).join(keys, Seq(fk), "left_semi")
        .agg(count(lit(1)).as("n_ok"))
      branches += df.agg(count(lit(1)).as("n_rows")).crossJoin(broadcast(ok))
        .select(lit(name).as("check_name"), col("n_rows"), col("n_ok"),
          lit(1.0).as("__minf"))
    }
    // Empty-table semantics are explicit: under ANSI mode 0/0 THROWS
    // (and non-ANSI would yield a NULL pass — a verdict that neither
    // passes nor fails), so the division is guarded and an empty
    // 100 TB drop REJECTS (pass = false, fraction NULL): a vacuous
    // pass would silently publish nothing, and a gate whose job is
    // "safe to publish" must fail closed.
    val frac = when(col("n_rows") === 0L, lit(null).cast("double"))
      .otherwise(col("n_ok").cast("double") / col("n_rows").cast("double"))
    branches.reduce(_ unionAll _)
      .select(col("check_name"), col("n_rows"), col("n_ok"),
        frac.as("fraction"),
        when(col("n_rows") === 0L, lit(false))
          .otherwise(frac >= col("__minf")).as("pass"))
      .orderBy(col("check_name"))
  }
}
