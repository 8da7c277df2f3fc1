package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch (Cormode & Muthukrishnan 2005): a fixed-size
  * frequency summary — d hash rows × w counters; an item's estimated
  * count is the MIN over its d counters, an overestimate bounded by
  * εN with probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * State is d·w longs per group REGARDLESS of input size, the partial
  * (map-side) buffer is the same d·w longs, and merge is elementwise
  * addition — commutative and associative, so the sketch is identical
  * under any partitioning. Where the KMV sketch answers COUNT(DISTINCT)
  * with bounded state, this answers per-item COUNT(*) (frequency)
  * without shuffling the item stream: the exchange carries ONE d·w-long
  * buffer per partition instead of one row per distinct item.
  *
  * Determinism + oracle: the child is the item's d PRECOMPUTED bucket
  * indices (see [[graft.operators.Sketches.cmsBuckets]]) — md5-derived
  * column math that the DuckDB oracle reproduces verbatim, so every
  * counter (and hence every estimate) is integer-exact in both engines.
  * (Spark ships a built-in `count_min_sketch` aggregate; its
  * engine-internal hashing can't be replayed by another engine, which
  * is the point of the md5 formulation here.)
  *
  * Reference scope: frequency profiling at corpus scale (heavy-hitter
  * candidacy, skew diagnosis before a join) — SURVEY.md §7 north-star
  * sketch family alongside [[KmvDistinctEstimate]].
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms depth ($depth) must be in [1,16]")
  require(width >= 2, s"cms width ($width) must be >= 2")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val buckets = v.asInstanceOf[ArrayData]
      var r = 0
      while (r < depth) {
        val b = buckets.getLong(r)
        buf(r * width + b.toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.length)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms needs an ARRAY<BIGINT> bucket-index child, got $other")
    }
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}
