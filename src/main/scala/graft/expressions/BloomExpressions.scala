package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter primitives shared by the build aggregate, the membership
  * expression's interpreted eval, and its generated code.
  *
  * Layout: a plain `Array[Long]` bit set of `numBits` bits. Bit indexes
  * come from Kirsch–Mitzenmacher double hashing — g_i = h1 + i·h2 — over
  * two splitmix64-derived 64-bit hashes of the input key, so the k probe
  * positions cost two mixes total, not k independent hash functions.
  * The input key is any 64-bit hash of the join key (the operator feeds
  * `xxhash64`); bloom collisions only ever ADD false positives, which
  * the exact rescue join removes, so the key hash needs no cross-engine
  * portability (unlike the md5-derived dedup sketches).
  */
object BloomUtil {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def wordsFor(numBits: Int): Int = (numBits + 63) >>> 6

  def add(words: Array[Long], numBits: Int, numHashes: Int, key: Long): Unit = {
    val h1 = mix(key)
    // force the stride odd so g_i cycles through distinct positions
    val h2 = mix(key ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(words: Array[Long], numBits: Int, numHashes: Int, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5DEECE66DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(words)
    words
  }
}

/** Aggregate that builds a bloom filter over a LONG key-hash column.
  *
  * Scale design (100 TB): the partial (map-side) state is a fixed
  * numBits/8-byte bit set regardless of input size; partials merge by
  * bitwise OR, so the exchange carries one bit set per partition and the
  * final result is set-determined (partitioning- and order-independent).
  * This is the same mechanism as Spark's own runtime-filter
  * BloomFilterAggregate — implemented here natively so the engine can
  * build/apply filters explicitly (see operators/RuntimeFilter) instead
  * of relying on the optimizer's injection heuristics.
  *
  * Result: the serialized bit set (BinaryType), exactly numBits/8 bytes.
  */
case class BloomBuildAggregate(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64, s"bloom numBits ($numBits) must be >= 64")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom numHashes ($numHashes) must be in [1, 16]")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomUtil.wordsFor(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.add(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomUtil.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build needs a LONG key-hash child, got ${child.dataType}")
  override def prettyName: String = "graft_bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAggregate =
    copy(child = newChild)
}

/** Codegen'd bloom membership test over a LONG key-hash column.
  *
  * The bit set travels as a Spark broadcast (fetched once per executor,
  * not shipped per task inside the serialized plan — at 2^25 bits the
  * plan would otherwise carry 4 MiB into every task), and the generated
  * code probes it with a static call, so the filter stays inside
  * whole-stage codegen and runs BEFORE any exchange: the classic
  * semi-join runtime filter that prunes the fact side map-side.
  */
case class BloomMightContain(
    child: Expression,
    bits: Broadcast[Array[Long]],
    numBits: Int,
    numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a LONG key-hash child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    BloomUtil.mightContain(bits.value, numBits, numHashes,
      input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", bits,
      classOf[Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BloomUtil.mightContain((long[])$bloomRef.value(), " +
        s"$numBits, $numHashes, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
