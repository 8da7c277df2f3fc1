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
}
