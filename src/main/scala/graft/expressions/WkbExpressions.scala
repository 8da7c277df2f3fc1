package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** WKB/EWKB point decoding shared by interpreted eval and generated
  * code. Closes the reference's `force_the_geom` loop: the CSV ingest
  * passthrough (quirk Q12, CsvIngest.scala:159) carries hex-WKB
  * strings the reference delegates to PostGIS for interpretation
  * (`etl/etl.py:303-304` inserts `the_geom` verbatim); this parser
  * lets passthrough geometries feed st_x/st_y, overviews, and the
  * spatial-join family without a round trip to any server.
  *
  * Layout (OGC 06-103r4 §8 + the PostGIS EWKB SRID extension):
  * byte 0 = byte order (0 big-endian / 1 little-endian), uint32
  * geometry type in that order — base type must be 1 (Point); the
  * EWKB SRID flag 0x20000000 is honored (a uint32 SRID follows),
  * the Z/M flags (0x80000000 / 0x40000000) throw — a silent 2-D
  * read of a 3-D point would return the wrong y for big-endian Z
  * points. Then two IEEE-754 doubles (x, y) in the same byte order.
  * The hex string must spell exactly the point and nothing more —
  * same strictness discipline as the WAV/BMP/PNG walkers.
  */
object WkbPointUtil {

  /** @return Array(x, y, srid) — srid is -1.0 when the blob carries
    *         no EWKB SRID (plain WKB); callers substitute their
    *         configured default. Integral SRIDs are exact in a
    *         double far past the EPSG range. */
  def parseHex(hex: UTF8String): ArrayData = {
    val s = hex.toString.trim
    require(s.length % 2 == 0, s"odd hex length ${s.length}")
    val nBytes = s.length / 2
    require(nBytes >= 21, s"WKB point needs >= 21 bytes, got $nBytes")
    val b = new Array[Byte](nBytes)
    var i = 0
    while (i < nBytes) {
      val hi = java.lang.Character.digit(s.charAt(2 * i), 16)
      val lo = java.lang.Character.digit(s.charAt(2 * i + 1), 16)
      require(hi >= 0 && lo >= 0,
        s"non-hex character at ${2 * i}: '${s.substring(2 * i, 2 * i + 2)}'")
      b(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    val order = b(0) & 0xff
    require(order == 0 || order == 1, s"bad byte-order marker $order")
    val buf = java.nio.ByteBuffer.wrap(b).order(
      if (order == 1) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    val rawType = buf.getInt(1)
    val baseType = rawType & 0x0fffffff
    require((rawType & 0x80000000) == 0 && (rawType & 0x40000000) == 0,
      s"Z/M points unsupported (type 0x${"%08x".format(rawType)})")
    require(baseType == 1,
      s"not a point (geometry type $baseType)")
    val hasSrid = (rawType & 0x20000000) != 0
    var off = 5
    val srid =
      if (hasSrid) { val v = buf.getInt(off); off += 4; v } else -1
    require(!hasSrid || srid > 0, s"bad EWKB SRID $srid")
    require(nBytes == off + 16,
      s"WKB point blob is $nBytes bytes, layout needs ${off + 16}")
    val x = buf.getDouble(off)
    val y = buf.getDouble(off + 8)
    new GenericArrayData(Array(x, y, srid.toDouble))
  }

  /** Inverse of [[parseHex]] — the sink-side encoder (engine → PostGIS
    * ingest) and the round-trip fixture generator: POINT(x y) as
    * hex-WKB, EWKB with the SRID flag when `srid > 0`, plain WKB when
    * `srid == -1`. Both byte orders supported because real feeds mix
    * them (PostGIS emits machine order). Uppercase hex, PostGIS
    * style; parseHex accepts either case. */
  def encodeHex(x: Double, y: Double, srid: Int, little: Boolean): String = {
    require(srid == -1 || srid > 0, s"srid must be -1 (none) or > 0, got $srid")
    val hasSrid = srid > 0
    val n = if (hasSrid) 25 else 21
    val buf = java.nio.ByteBuffer.allocate(n).order(
      if (little) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(if (little) 1.toByte else 0.toByte)
    buf.putInt(if (hasSrid) 0x20000001 else 1)
    if (hasSrid) buf.putInt(srid)
    buf.putDouble(x).putDouble(y)
    buf.array().map("%02X".format(_)).mkString
  }
}

/** Codegen'd Catalyst expression: hex-WKB/EWKB point string →
  * array(x, y, srid | -1). A native expression (not a UDF) so the
  * byte parsing stays inside whole-stage codegen next to the ingest
  * projection it serves; malformed blobs throw with the offending
  * field named (fail-loudly contract — a geometry silently nulled at
  * ingest would vanish from every downstream join). NULL in → NULL
  * out (UnaryExpression's default null handling). */
case class WkbPointExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_st_point_from_wkb_hex"

  override protected def nullSafeEval(input: Any): Any =
    WkbPointUtil.parseHex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WkbPointUtil.parseHex($c)")

  override protected def withNewChildInternal(newChild: Expression): WkbPointExpression =
    copy(child = newChild)
}
