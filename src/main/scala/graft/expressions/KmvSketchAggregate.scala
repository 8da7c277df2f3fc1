package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch — a mergeable cardinality
  * estimator with a buffer bounded at k longs per group, regardless of
  * input size. The classic bottom-k estimator (Bar-Yossef et al. 2002):
  * keep the k smallest DISTINCT hash values; with hashes uniform on
  * [0, 2^60), the k-th smallest h_k estimates the distinct count as
  * (k-1) * 2^60 / h_k. Fewer than k distinct hashes seen -> the count is
  * exact (the buffer IS the distinct set).
  *
  * Scale design (100 TB): this is the sketch shape every distributed
  * engine uses for approximate COUNT(DISTINCT) — the partial (map-side)
  * state is k longs, the exchange carries one k-long buffer per group
  * per partition, and merge is a bounded set-union. An exact
  * countDistinct shuffles every distinct value; relative error is
  * ~1/sqrt(k-2) (~6% at k=256) for a constant-size buffer.
  *
  * Determinism: the estimate depends only on the SET of hash values —
  * partitioning and merge order cannot change it, so the result is
  * bit-stable across any cluster layout AND reproducible in the DuckDB
  * oracle (feed it `conv(substring(md5(x), 1, 15), 16, 10)` hashes —
  * md5-based like every other graft sketch).
  *
  * The child must be a LONG hash uniform on [0, 2^60) — produce it with
  * [[graft.operators.Sketches.md5Hash60]].
  */
case class KmvDistinctEstimate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv sketch size k ($k) must be >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Bounded insert: the tree holds the k smallest distinct values seen.
    * A value >= the current k-th smallest (tree full) is ignored. */
  private def add(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit = {
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last()) {
      if (buf.add(x)) buf.pollLast()
      ()
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val nd = buf.size
    if (nd == 0) 0.0
    else if (nd < k) nd.toDouble // exact: buffer holds every distinct hash
    else (k - 1).toDouble * KmvDistinctEstimate.Two60 / buf.last().toDouble
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_distinct needs a LONG hash child, got ${child.dataType}")
  override def prettyName: String = "graft_kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctEstimate =
    copy(child = newChild)
}

object KmvDistinctEstimate {
  /** 2^60 as a double (exact: a power of two). The hash space size for
    * 15-hex-char md5 prefixes. */
  val Two60: Double = 1152921504606846976.0d
}
