package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively — in all three
  * pandas-merge_asof directions: backward (most recent prior right
  * row), forward (earliest following right row), nearest (closer of
  * the two, ties to backward).
  *
  * Implemented the Spark-first way (SURVEY.md §2C): NOT as a range
  * join (which explodes pairs then filters), but as union + window:
  * both sides are unioned on (key, time) with the right side's payload
  * carried as a struct; one window pass per key (ordered by time, with
  * a side marker arbitrating equal timestamps per the strictness rule)
  * fills each left row with the last (backward) or first (forward)
  * non-null right payload; nearest computes both fills in the SAME
  * pass and picks by absolute time distance.
  *
  * Scale: ONE shuffle on the join key (the window's partitionBy), no
  * pair explosion regardless of how many right rows precede a left row
  * — nearest costs one extra window column over the same sort, not a
  * second shuffle. Skewed keys behave like any window skew (salt by
  * coarse time bucket if a single key dominates).
  */
object AsOfJoin {

  /** For each `left` row, attach the columns of the matching `right`
    * row with the same `keys`, per `direction`:
    *  - "backward": latest right row with rightTime <= leftTime
    *    (< if `strict`)
    *  - "forward":  earliest right row with rightTime >= leftTime
    *    (> if `strict`)
    *  - "nearest":  whichever of those two is closer in time; equal
    *    distances resolve to the backward match (non-strict only)
    * Right payload columns are emitted with `rightPrefix`. Left rows
    * with no matching right row get NULL payload (left-outer
    * semantics). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightPayloadCols: Seq[String], rightPrefix: String = "right_",
      strict: Boolean = false,
      direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(Set("backward", "forward", "nearest")(direction),
      s"direction ($direction) must be backward|forward|nearest")
    require(!(strict && direction == "nearest"),
      "nearest is defined for non-strict matching only")
    // a right payload column literally named __rt would duplicate the
    // reserved struct field below and make getField("__rt") ambiguous,
    // silently corrupting nearest's distance compare
    require(!rightPayloadCols.contains("__rt"),
      "right payload column name __rt is reserved by asOf")

    // payload struct carries the right timestamp (needed by nearest's
    // distance compare; harmless otherwise — stripped on output)
    val payload = struct(
      (col(rightTimeCol).as("__rt") +:
        rightPayloadCols.map(col)): _*)
    val keyCols = keys.map(col)
    // Side markers arbitrate equal timestamps. Backward fills from the
    // PAST (last over preceding frame): non-strict wants a same-time
    // right row visible, so right sorts first; strict hides it by
    // sorting right after left. Forward fills from the FUTURE (first
    // over following frame): non-strict wants the same-time right row
    // in the frame, so right sorts after left; strict sorts it before
    // (out of the frame). For nearest both frames are built non-strict
    // with backward's ordering; the forward fill then ALSO sees a
    // same-time right row via its own frame below.
    val rightFirst = direction match {
      case "backward" | "nearest" => !strict
      case "forward" => strict
    }
    val rightSide = lit(if (rightFirst) 0 else 1)
    val leftSide = lit(if (rightFirst) 1 else 0)

    val r = right.select(keyCols :+ col(rightTimeCol).as("__t")
      :+ rightSide.as("__side") :+ payload.as("__rv"): _*)
    val leftCols = left.columns.toSeq
    val l = left.select(keyCols :+ col(leftTimeCol).as("__t")
      :+ leftSide.as("__side")
      :+ lit(null).cast(r.schema("__rv").dataType).as("__rv")
      :+ struct(leftCols.map(col): _*).as("__lrow"): _*)
    val rPadded = r.withColumn("__lrow",
      lit(null).cast(l.schema("__lrow").dataType))

    val unionCols = Seq("__lrow", "__t", "__side", "__rv") ++ keys
    val unioned = l.select(unionCols.map(col): _*)
      .unionByName(rPadded.select(unionCols.map(col): _*))

    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
    val wPast = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFuture = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bwd = last(col("__rv"), ignoreNulls = true).over(wPast)
    val fwd = first(col("__rv"), ignoreNulls = true).over(wFuture)

    val matched = direction match {
      case "backward" => unioned.withColumn("__match", bwd)
      case "forward" => unioned.withColumn("__match", fwd)
      case "nearest" =>
        // both fills share one sort; with rightFirst ordering the
        // same-time right row lands in BOTH frames, and the distance
        // tie (|Δ| equal, including the 0/0 self-match) resolves to
        // the backward fill per the documented rule
        unioned
          .withColumn("__b", bwd).withColumn("__f", fwd)
          .withColumn("__match",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(abs(col("__f").getField("__rt") - col("__t")) <
                abs(col("__b").getField("__rt") - col("__t")), col("__f"))
              .otherwise(col("__b")))
    }

    val leftOut = leftCols.map(c => col("__lrow").getField(c).as(c))
    val rightOut = rightPayloadCols.map(c =>
      col("__match").getField(c).as(s"$rightPrefix$c"))
    matched.filter(col("__lrow").isNotNull)
      .select(leftOut ++ rightOut: _*)
  }
}
