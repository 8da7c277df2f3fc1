package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
  * industry-standard mergeable cardinality estimator, with state bounded
  * at m = 2^p BYTE registers per group (64 bytes at the default p = 6 —
  * vs KMV's k longs; HLL trades KMV's exact-below-k behavior for ~16×
  * smaller state at comparable error ~1.04/sqrt(m)).
  *
  * Register update from a 60-bit md5-derived hash (see
  * [[graft.operators.Sketches.md5Hash60]]): bucket j = h mod m, and
  * rho = position of the highest set bit of w = h div m counted from the
  * top of the (60-p)-bit window, i.e. rho = (60-p) - floor(log2(w))
  * (w = 0 -> rho = 61-p). Registers take the max rho per bucket — a
  * set-determined, order-independent statistic, so the sketch is
  * bit-stable across partitionings and merge orders.
  *
  * Determinism of the ESTIMATE: the harmonic-mean denominator
  * sum(2^-r_j) is NOT exact in binary64 (terms span more than 52 bits
  * of magnitude), so summing it in floats would be order-dependent.
  * Instead eval computes the exact INTEGER S' = sum_j 2^(maxRho - r_j)
  * with maxRho = 61 - p (each term <= 2^(61-p), 2^p terms — the total
  * is <= 2^61, exact in a long) and derives
  *
  *   E = (alpha_m * m^2) * 2^maxRho / S'
  *
  * with one double multiply chain over constants and one division by the
  * exact integer — bit-identical in any engine that follows the same
  * operation order, which is exactly what the DuckDB oracle does
  * (registers via the same md5 arithmetic, S' via integer bit-shifts).
  * No small/large-range correction is applied — this is the raw HLL
  * estimator, documented as such (corrections need ln(), whose last-ulp
  * behavior is engine-specific — the same reason the sum is integer).
  *
  * The child must be a LONG hash uniform on [0, 2^60) — produce it with
  * [[graft.operators.Sketches.md5Hash60]].
  */
case class HllDistinctEstimate(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 12, s"hll precision p ($p) must be in [4, 12]")

  private val m: Int = 1 << p
  /** Bits of the rho window after the bucket index is consumed. */
  private val windowBits: Int = 60 - p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h & (m - 1)).toInt
      val w = h >>> p
      // leading-zero count within the windowBits-bit window, + 1
      val rho =
        if (w == 0L) windowBits + 1
        else windowBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact integer denominator: sum of 2^(maxRho - r_j), maxRho = 61-p
    // (= windowBits + 1, the largest possible rho — so shifts are >= 0)
    val maxRho = windowBits + 1
    var sPrime = 0L
    var j = 0
    while (j < m) { sPrime += 1L << (maxRho - buf(j)); j += 1 }
    // alpha_m per the HLL paper's small-m table
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // operation order mirrored EXACTLY by the oracle SQL
    ((alpha * (m.toDouble * m.toDouble)) * (1L << maxRho).toDouble) /
      sPrime.toDouble
  }

  // defensive copies: merge mutates its left buffer in place, and the
  // serialized form must not alias a buffer that later mutates
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hll needs a LONG hash child, got ${child.dataType}")
  override def prettyName: String = "graft_hll"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinctEstimate =
    copy(child = newChild)
}

object HllDistinctEstimate
