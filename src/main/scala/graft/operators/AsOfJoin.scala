package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Implemented the Spark-first way (SURVEY.md §2C): NOT as a range
  * join (which explodes pairs then filters), but as union + window:
  * both sides are unioned on (key, time) with the right side's payload
  * carried as a struct; one window pass per key (ordered by time, right
  * rows before left rows at equal timestamps for `<=` semantics) fills
  * each left row with the last non-null right payload.
  *
  * Scale: ONE shuffle on the join key (the window's partitionBy), no
  * pair explosion regardless of how many right rows precede a left row.
  * Skewed keys behave like any window skew (salt by coarse time bucket
  * if a single key dominates).
  */
object AsOfJoin {

  /** For each `left` row, attach the columns of the latest `right` row
    * with the same `keys` and rightTime <= leftTime (or < if `strict`).
    * Right payload columns are emitted with `rightPrefix`. Left rows with
    * no prior right row get NULL payload (left-outer semantics). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightPayloadCols: Seq[String], rightPrefix: String = "right_",
      strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val payload = struct(rightPayloadCols.map(col): _*)
    val keyCols = keys.map(col)
    // side marker orders right rows before left rows at the same time so
    // a left row sees a same-timestamp right row (non-strict <=); under
    // strict <, right rows sort after left rows instead.
    val rightSide = lit(if (strict) 1 else 0)
    val leftSide = lit(if (strict) 0 else 1)

    val r = right.select(keyCols :+ col(rightTimeCol).as("__t")
      :+ rightSide.as("__side") :+ payload.as("__rv"): _*)
    val leftCols = left.columns.toSeq
    val l = left.select(keyCols :+ col(leftTimeCol).as("__t")
      :+ leftSide.as("__side") :+ lit(null).cast(r.schema("__rv").dataType).as("__rv")
      :+ struct(leftCols.map(col): _*).as("__lrow"): _*)
    val rPadded = r.withColumn("__lrow",
      lit(null).cast(l.schema("__lrow").dataType))

    val unionCols = Seq("__lrow", "__t", "__side", "__rv") ++ keys
    val unioned = l.select(unionCols.map(col): _*)
      .unionByName(rPadded.select(unionCols.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))

    val leftOut = leftCols.map(c => col("__lrow").getField(c).as(c))
    val rightOut = rightPayloadCols.map(c =>
      col("__match").getField(c).as(s"$rightPrefix$c"))
    filled.filter(col("__lrow").isNotNull)
      .select(leftOut ++ rightOut: _*)
  }
}
