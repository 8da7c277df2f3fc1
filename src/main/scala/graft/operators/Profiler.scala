package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass table profiling (the ANALYZE/statistics operator): per
  * column — row count, null count, KMV distinct-count estimate, and
  * numeric min/max.
  *
  * Scale design: ONE aggregation pass over the table computes every
  * column's statistics simultaneously; the only state is m KMV buffers
  * (k longs each) plus scalars, and the exchange carries one partial
  * buffer set per partition. Profiling 100 TB costs one scan — there
  * is no per-column pass and no distinct-value shuffle anywhere.
  * The single aggregated row is reshaped to per-column rows driver-side
  * (m values — trivially small).
  *
  * Output: (column, n_rows, n_nulls, est_distinct, min_num, max_num) —
  * min/max are NULL for non-numeric columns (string min/max is
  * collation-sensitive and deliberately left out of the deterministic
  * surface).
  */
object Profiler {

  def profile(df: DataFrame, k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      // backtick-escaped: col() parses dots as struct paths, and a
      // generic ANALYZE must accept any legal column name
      val c = col(s"`${f.name.replace("`", "``")}`")
      val numeric = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nn_${f.name}"),
        Sketches.kmvDistinct(c, k).as(s"__nd_${f.name}"),
        (if (numeric) min(c).cast("double") else lit(null).cast("double"))
          .as(s"__min_${f.name}"),
        (if (numeric) max(c).cast("double") else lit(null).cast("double"))
          .as(s"__max_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val out = cols.zipWithIndex.map { case (f, i) =>
      val base = i * 5
      (f.name,
        row.getLong(base),
        row.getLong(base + 1),
        row.getDouble(base + 2),
        if (row.isNullAt(base + 3)) None else Some(row.getDouble(base + 3)),
        if (row.isNullAt(base + 4)) None else Some(row.getDouble(base + 4)))
    }.toIndexedSeq
    import spark.implicits._
    out.toDF("column", "n_rows", "n_nulls", "est_distinct",
      "min_num", "max_num")
  }

  /** Functional-dependency check lhs → rhs — the schema-discovery /
    * data-quality probe ("is order key really a key for ship mode?"):
    * counts how many lhs keys map to MORE than one distinct rhs value.
    * Exact: one (lhs, rhs) distinct aggregate, then one lhs aggregate —
    * both shuffles carry distinct combinations, never rows. The
    * violation rate is the single float division.
    * @return one row: (fd, n_keys, n_violating, max_variants,
    *   violation_rate) */
  def fdCheck(df: DataFrame, fdName: String, lhs: Seq[String],
      rhs: String): DataFrame = {
    require(lhs.nonEmpty, "lhs must be non-empty")
    val variants = df
      .select((lhs :+ rhs).map(col): _*).distinct()
      .groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("__v"))
    variants.agg(count(lit(1)).as("n_keys"),
        sum(when(col("__v") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("__v")).as("max_variants"))
      .select(lit(fdName).as("fd"), col("n_keys"), col("n_violating"),
        col("max_variants"),
        (col("n_violating").cast("double") / col("n_keys").cast("double"))
          .as("violation_rate"))
  }

  /** Per-column Shannon entropy + concentration census for
    * CATEGORICAL columns — the balance audit behind "is this label /
    * source / language column collapsed?": H = ln n − (Σ c·ln c)/n in
    * nats over exact value counts, with the top value's share beside
    * it. NULLs count as a category (a collapsed-to-NULL column should
    * read as collapsed, not empty).
    *
    * Exactness: counts are exact; the Σ c·ln c fold runs over a
    * SORTED list (q60 rule) so H is reproducible, and gate rows emit
    * micro-units. Caller contract: categorical columns — the
    * per-column distinct-count list is collected into one aggregate
    * row, so cardinality must be bounded (the CollectCap discipline);
    * profile() + fdCheck cover high-cardinality shapes.
    *
    * @return one row per column: (column, n_rows, n_distinct,
    *         entropy_nats, top_share) */
  def entropyProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // ONE scan regardless of column count (the profile() discipline):
    // melt each row into (column, value) pairs, then one two-level
    // aggregate — never a per-column pass over the table
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          coalesce(col(c).cast("string"), lit("__null__")).as("__v")))
        : _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.__v").as("__v"))
    melted.groupBy(col("column"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("column"))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        aggregate(sort_array(collect_list(
          col("__c").cast("double") * log(col("__c").cast("double")))),
          lit(0.0), _ + _).as("__clc"),
        max(col("__c")).as("__top"))
      .select(col("column"), col("n_rows"), col("n_distinct"),
        (log(col("n_rows").cast("double")) -
          col("__clc") / col("n_rows").cast("double"))
          .as("entropy_nats"),
        (col("__top").cast("double") / col("n_rows").cast("double"))
          .as("top_share"))
  }

  /** Benford first-digit audit (Benford 1938; Nigrini's fraud test):
    * the leading-digit distribution of a naturally-grown positive
    * quantity follows P(d) = log10(1 + 1/d); synthetic, capped, or
    * fabricated columns deviate — making this the cheap screen for
    * generated/duplicated numeric data in a training corpus.
    *
    * Exactness: the leading digit comes from the exact integer's
    * decimal string (never float log10 of the value), counts are
    * exact, and the shares leave as micro-unit BIGINTs (observed =
    * one rounded division; expected = the ln ratio, micro-rounded —
    * the q60 pattern), so dev_micro is a pure INTEGER difference.
    * All nine digits are emitted, zeros included. Scale: one map pass
    * + a 9-group aggregate; the 1-row total broadcasts back.
    *
    * @param cents exact positive integral rendition of the value
    * @return 9 rows: (digit, n_obs, n_total, obs_share_micro,
    *         benford_share_micro, dev_micro) */
  def benfordAudit(df: DataFrame, cents: org.apache.spark.sql.Column)
      : DataFrame = {
    val counts = df.select(cents.cast("long").as("__c"))
      .filter(col("__c") > 0L)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum(col("__n")).as("n_total"))
    val digits = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    digits.join(counts, Seq("digit"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("__n"), lit(0L)).as("n_obs"), col("n_total"),
        round(coalesce(col("__n"), lit(0L)).cast("double") /
          col("n_total").cast("double") * lit(1e6)).cast("long")
          .as("obs_share_micro"),
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)) * lit(1e6)).cast("long")
          .as("benford_share_micro"))
      .withColumn("dev_micro",
        col("obs_share_micro") - col("benford_share_micro"))
  }
}
