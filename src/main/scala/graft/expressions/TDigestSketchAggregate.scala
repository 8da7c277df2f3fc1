package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** t-digest quantile sketch (Dunning & Ertl 2019, the merging-digest
  * variant) — the quantile member of the sketch family (KMV/HLL =
  * cardinality, CMS = frequency): a mergeable summary whose centroid
  * count is bounded by the compression δ regardless of input size,
  * with rank error concentrated where quantiles are interesting (the
  * 4·q·(1−q) size bound keeps tail centroids tiny, so p99/p999 stay
  * sharp while the median centroids grow).
  *
  * Scale design (100 TB): exact percentiles (Quantiles.exactPercentiles,
  * q77) shuffle the distinct-value set — correct, but the exchange
  * grows with the data. This sketch's partial state is ≤ ~2δ centroids
  * (16 bytes each; ~3 KiB at δ=100) per group per partition, merge is
  * a sorted centroid merge + one compress pass, and the estimate reads
  * off the merged centroid chain. The engine-standard
  * approx-percentile shape, here as a graft-owned aggregate with the
  * state/merge visible and spec-bounded.
  *
  * Determinism: the result depends on centroid formation order, so
  * unlike the md5-keyed sketches it is NOT bit-stable across partition
  * layouts — it is an ESTIMATE with a spec-asserted rank-error bound
  * (TDigestSpec pins ≤ 1.5% rank error at δ=100 across layouts,
  * uniform/skewed/constant fixtures). That is why it has no oracle
  * gate row: the DuckDB oracle compares bits, and an approximation
  * whose bits depend on the cluster layout has no cross-engine bit
  * contract to pin. (KMV/HLL/CMS do, because their state is a pure
  * FUNCTION of the input SET — q38/q89/q84.)
  */
case class TDigestQuantile(
    child: Expression,
    q: Double,
    delta: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestQuantile.Digest]
  with UnaryLike[Expression] {

  require(q >= 0.0 && q <= 1.0, s"quantile q ($q) must be in [0, 1]")
  require(delta >= 20, s"compression delta ($delta) must be >= 20")

  override def createAggregationBuffer(): TDigestQuantile.Digest =
    new TDigestQuantile.Digest(delta)

  override def update(buf: TDigestQuantile.Digest,
      input: InternalRow): TDigestQuantile.Digest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TDigestQuantile.Digest,
      other: TDigestQuantile.Digest): TDigestQuantile.Digest = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: TDigestQuantile.Digest): Any = buf.quantile(q)

  override def serialize(buf: TDigestQuantile.Digest): Array[Byte] =
    buf.toBytes

  override def deserialize(bytes: Array[Byte]): TDigestQuantile.Digest =
    TDigestQuantile.Digest.fromBytes(bytes, delta)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty input -> NULL
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_tdigest needs a DOUBLE child, got ${child.dataType}")
  override def prettyName: String = "graft_tdigest"

  override def withNewMutableAggBufferOffset(n: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestQuantile =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantile =
    copy(child = newChild)
}

object TDigestQuantile {

  /** Mutable merging digest: centroids (mean, weight) kept sorted by
    * mean; raw points buffer in `pending` and fold in on compress.
    * Centroid sizes obey the classic 4·n·q·(1−q)/δ bound. */
  final class Digest(val delta: Int) {
    private[TDigestQuantile] var means = new ArrayBuffer[Double]()
    private[TDigestQuantile] var weights = new ArrayBuffer[Long]()
    private val pending = new ArrayBuffer[Double]()

    def add(x: Double): Unit = {
      pending += x
      if (pending.size >= 4 * delta) compress()
    }

    def mergeWith(other: Digest): Unit = {
      other.compress()
      var i = 0
      while (i < other.means.size) {
        means += other.means(i); weights += other.weights(i); i += 1
      }
      compressed = false // concatenation broke the sorted invariant
      compress()
    }

    /** Fold pending points in as weight-1 centroids, sort everything by
      * mean, and re-cluster greedily under the t-digest size bound. */
    def compress(): Unit = {
      if (pending.isEmpty && isCompressed) return
      val n = means.size + pending.size
      if (n == 0) return
      val ms = new Array[Double](n)
      val ws = new Array[Long](n)
      var i = 0
      while (i < means.size) { ms(i) = means(i); ws(i) = weights(i); i += 1 }
      var j = 0
      while (j < pending.size) { ms(i) = pending(j); ws(i) = 1L; i += 1; j += 1 }
      pending.clear()
      // sort (mean, weight) pairs by mean
      val idx = (0 until n).sortBy(ms(_))
      val sm = idx.map(ms(_)).toArray
      val sw = idx.map(ws(_)).toArray
      val nTot = sw.sum.toDouble
      val outM = new ArrayBuffer[Double](2 * delta)
      val outW = new ArrayBuffer[Long](2 * delta)
      var accM = sm(0); var accW = sw(0)
      var cum = 0.0 // weight strictly before the active cluster
      // k1 scale function (Dunning & Ertl §2.1): a cluster may span
      // [qL, qR] iff k1(qR) − k1(qL) ≤ 1. The arcsine shape bounds the
      // TOTAL cluster count at ~δ (k1's range is δ/2 over [0,1], with
      // singleton-resolution tails), unlike the q(1−q) weight bound
      // whose count grows O(δ·log n).
      def k1(qv: Double): Double =
        delta / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, qv) - 1.0)
      var k = 1
      while (k < n) {
        val qL = cum / nTot
        val qR = (cum + accW + sw(k)) / nTot
        if (k1(qR) - k1(qL) <= 1.0) {
          // weighted-mean merge into the active cluster
          val wNew = accW + sw(k)
          accM = accM + (sm(k) - accM) * sw(k) / wNew
          accW = wNew
        } else {
          outM += accM; outW += accW
          cum += accW
          accM = sm(k); accW = sw(k)
        }
        k += 1
      }
      outM += accM; outW += accW
      means = outM; weights = outW
      compressed = true
    }

    private var compressed = true
    private def isCompressed: Boolean = compressed

    /** Standard t-digest quantile read: walk the centroid chain,
      * interpolate between adjacent centroid means at the target rank
      * (each centroid's weight treated as centered on its mean). */
    def quantile(q: Double): Any = {
      compress()
      val n = means.size
      if (n == 0) return null
      if (n == 1) return means(0)
      val tw = weights.sum.toDouble
      val target = q * tw
      var cum = 0.0
      var i = 0
      while (i < n) {
        val cMid = cum + weights(i) / 2.0
        if (target < cMid) {
          if (i == 0) return means(0)
          val prevMid = cum - weights(i - 1) / 2.0
          val f = (target - prevMid) / (cMid - prevMid)
          return means(i - 1) + f * (means(i) - means(i - 1))
        }
        cum += weights(i)
        i += 1
      }
      means(n - 1)
    }

    /** Centroid count after compression (spec: bounded by ~2δ). */
    def centroidCount: Int = { compress(); means.size }

    def toBytes: Array[Byte] = {
      compress()
      val bos = new ByteArrayOutputStream(4 + 16 * means.size)
      val out = new DataOutputStream(bos)
      out.writeInt(means.size)
      var i = 0
      while (i < means.size) {
        out.writeDouble(means(i)); out.writeLong(weights(i)); i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Digest {
    def fromBytes(bytes: Array[Byte], delta: Int): Digest = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val d = new Digest(delta)
      var i = 0
      while (i < n) {
        d.means += in.readDouble()
        d.weights += in.readLong()
        i += 1
      }
      d
    }
  }
}
