package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) least-squares regression via
  * Pool-Adjacent-Violators (Ayer et al. 1955; Barlow & Brunk 1972) —
  * the standard model-calibration fit (map raw scores to monotone
  * probabilities) and shape-constrained trend estimator.
  *
  * Scale design: rows first reduce to one (group, x) cell with exact
  * integer weight/sum aggregates (the shuffle is distinct-x-sized,
  * never row-sized). PAVA itself is inherently sequential in x WITHIN
  * a group — a stack of blocks merged on violation — so each group's
  * cell array is processed per-task via flatMapGroups, bounded by the
  * group's distinct-x cardinality (the ewma/holt per-key contract;
  * groups run in parallel). Block state is two BIGINTs per block —
  * exact — and violations compare block means by integer
  * cross-multiplication, so the fitted blocks are engine-exact; only
  * the final fitted mean is a double (one division).
  *
  * The fitted value stream is non-decreasing in x, and adjacent final
  * blocks have strictly increasing means (equal-mean neighbors merge).
  */
object Isotonic {

  /** @param df input rows; `groupCol`/`xCol` castable to long,
    *        `yCol` an integral response (scale labels/cents upstream)
    * @return (groupCol, xCol, w, fit): per distinct x, its row count
    *         and the isotonic fitted mean of y */
  def fitByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).cast("long").as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("g"), col("x"))
      .agg(count(lit(1)).as("w"), sum(col("y")).as("s"))
      .as[(Long, Long, Long, Long)]
    val fitted = cells.groupByKey(_._1).flatMapGroups { (g, it) =>
      val cs = it.toArray.sortBy(_._2) // by x
      val n = cs.length
      // parallel stacks of block state: start index, Σw, Σy
      val start = new Array[Int](n)
      val bw = new Array[Long](n)
      val bs = new Array[Long](n)
      var top = -1
      var i = 0
      while (i < n) {
        top += 1
        start(top) = i; bw(top) = cs(i)._3; bs(top) = cs(i)._4
        // merge while the previous block mean >= this block mean
        // (exact integer cross-multiplication; ties merge, so final
        // adjacent block means are strictly increasing)
        while (top > 0 &&
            bs(top - 1) * bw(top) >= bs(top) * bw(top - 1)) {
          bw(top - 1) += bw(top); bs(top - 1) += bs(top)
          top -= 1
        }
        i += 1
      }
      val out = Vector.newBuilder[(Long, Long, Long, Double)]
      var b = 0
      while (b <= top) {
        val end = if (b == top) n else start(b + 1)
        val fit = bs(b).toDouble / bw(b).toDouble
        var j = start(b)
        while (j < end) {
          out += ((g, cs(j)._2, cs(j)._3, fit))
          j += 1
        }
        b += 1
      }
      out.result().iterator
    }
    fitted.toDF(groupCol, xCol, "w", "fit")
  }
}
