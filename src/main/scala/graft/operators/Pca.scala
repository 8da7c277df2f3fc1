package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Uncentered PCA over an embedding column, the spark.ml-style split:
  * the data-sized work (the d×d Gram matrix X᙮X) is one distributed
  * pass with map-side partial aggregation; the eigensolve runs
  * driver-side on the collected d×d matrix (contract-bounded — d², a
  * few thousand doubles at embedding dims, never data-sized).
  *
  * The Gram is computed over int8-QUANTIZED codes
  * ([[Similarity.quantizeInt8]]) so every entry is an exact BIGINT —
  * partitioning-invariant, overflow-safe (|q|≤127 ⇒ a pair product
  * ≤16129; 2⁶³/16129 ≈ 5.7e14 rows headroom), and cross-engine
  * reproducible, which is what makes a DuckDB oracle possible for a
  * matrix product. At 100 TB the d²/2 per-row fan-out is the
  * irreducible FLOP count of any Gram/PCA; hash aggregation collapses
  * it to d²/2 rows per task before the single tiny shuffle. */
object Pca {

  /** Upper-triangle Gram matrix of the int8-quantized vectors:
    * one row per (i ≤ j) with g = Σ_rows q[i]·q[j] (exact BIGINT). */
  def gramMatrixInt8(vecs: DataFrame, vecCol: String): DataFrame =
    vecs
      .select(Similarity.quantizeInt8(col(vecCol)).getField("q").as("__q"))
      .select(explode(expr(
        "flatten(transform(sequence(0, size(__q) - 1), i -> " +
          "transform(sequence(i, size(__q) - 1), j -> " +
          "named_struct('i', i, 'j', j, " +
          "'p', CAST(__q[i] AS BIGINT) * __q[j]))))")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p")).as("g"))

  /** Driver-side power iteration on a collected Gram triangle: returns
    * (top eigenvalue, unit eigenvector with its first nonzero
    * component positive). Deterministic: fixed all-ones start, fixed
    * iteration count, no RNG. `triangle` rows are (i, j, g) with
    * i ≤ j. */
  def topEigen(triangle: Array[(Int, Int, Long)], iters: Int = 100)
      : (Double, Array[Double]) = {
    require(triangle.nonEmpty, "empty Gram matrix")
    val d = triangle.iterator.map(_._2).max + 1
    val m = Array.ofDim[Double](d, d)
    triangle.foreach { case (i, j, g) =>
      m(i)(j) = g.toDouble; m(j)(i) = g.toDouble
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
      val n = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
      if (n == 0.0) return (0.0, v) // zero matrix: any unit vector
      v = w.map(_ / n)
      lambda = n
      it += 1
    }
    val firstNz = v.indexWhere(_ != 0.0)
    if (firstNz >= 0 && v(firstNz) < 0) v = v.map(x => -x)
    (lambda, v)
  }
}
