package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-oriented restatements of the reference's keyed mutation sinks.
  *
  * The reference issues one `UPDATE ... WHERE id = k` per row
  * (`etl/etl.py:315-351`) and one `DELETE ... WHERE id IN (...)` per chunk
  * (`etl/etl.py:354-372`). On Spark these become single distributed plans:
  * MERGE-style outer-join + column selection for update, left-anti join
  * for delete.
  *
  * Scale notes (100 TB): both shapes shuffle the BASE table on the key
  * unless the mutation side is broadcast-small — AQE converts the join to
  * a broadcast automatically when it is. For repeated mutation of the same
  * stored table, use PartitionedTable (key-bucketed layout + dynamic
  * partition overwrite): only the buckets containing mutated keys are
  * scanned and rewritten (SURVEY §7.5).
  */
object UpdateJob {

  /** MERGE ... WHEN MATCHED THEN UPDATE semantics over plain DataFrames.
    *
    * `updates` must contain the key columns plus the columns to replace;
    * any base column missing from `updates` is carried through unchanged.
    * Duplicate keys in `updates`: when `orderCol` is given, the row with
    * the greatest `orderCol` wins (the reference applies updates in file
    * order, so last row per key wins — SURVEY §7.5); otherwise an
    * arbitrary-but-deterministic `dropDuplicates` picks one.
    *
    * `preserveNullUpdates` is the fixed-mode alternative to reference
    * quirk Q10 (`etl/etl.py:334`: UPDATE always SETs the_geom, even to
    * NULL): when true, a NULL update value keeps the base value instead
    * of overwriting it. Default false — reference-faithful overwrite.
    */
  def merge(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      orderCol: Option[String] = None,
      preserveNullUpdates: Boolean = false): DataFrame = {
    val deduped = orderCol match {
      case Some(oc) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(oc).desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", oc)
      case None => updates.dropDuplicates(keys)
    }
    val updCols = deduped.columns.filterNot(keys.contains).toSeq
    val renamed = updCols.foldLeft(deduped) { (df, c) =>
      df.withColumnRenamed(c, s"__u_$c")
    }.withColumn("__matched", lit(true))
    // __matched marker (not value-null checks) so NULL update values work
    base.join(renamed, keys.toSeq, "left_outer")
      .select(base.columns.toIndexedSeq.map { c =>
        if (updCols.contains(c)) {
          val updated =
            if (preserveNullUpdates) coalesce(col(s"__u_$c"), col(c))
            else col(s"__u_$c")
          when(col("__matched"), updated).otherwise(col(c)).as(c)
        } else
          col(c)
      }: _*)
  }

  /** MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT
    * (upsert). `updates` must have the full base schema. */
  def upsert(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val survivors = base.join(
      updates.select(keys.map(col): _*).distinct(), keys.toSeq, "left_anti")
    survivors.unionByName(updates.select(base.columns.map(col): _*))
  }
}

object DeleteJob {

  /** DELETE FROM base WHERE key IN (keys) — left-anti join rewrite.
    * `keyDf` needs exactly the key columns. Reference `etl/etl.py:366-370`. */
  def deleteByKeys(base: DataFrame, keyDf: DataFrame,
      keys: Seq[String]): DataFrame =
    base.join(keyDf.select(keys.map(col): _*).distinct(), keys.toSeq,
      "left_anti")
}
