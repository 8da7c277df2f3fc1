package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.expressions.{BloomBuildAggregate, BloomMightContain, BloomUtil}

/** Explicit runtime-filter semi-joins: prune the fact side with a
  * compact bloom filter of the dimension keys BEFORE any exchange, then
  * rescue exactness with a semi-join over the survivors only.
  *
  * Why this exists next to a plain `left_semi` join (100 TB design):
  * - dim small enough to broadcast → Spark already plans a broadcast
  *   semi-join; use that (q24).
  * - dim too big to broadcast exactly, fact huge → a shuffle semi-join
  *   moves the ENTIRE fact table. A bloom over the dim keys is ~1.2
  *   bytes/key at 1% fpp (vs ~8+ bytes/key exact), so keys that don't
  *   fit as a broadcast hash table often fit as a broadcast bloom; the
  *   map-side probe then drops the non-matching bulk of the fact table
  *   before the shuffle, and the exact semi-join runs over survivors
  *   (selectivity s + fpp of the rest) — the exchange shrinks by ~1/s.
  * Spark's optimizer has the same mechanism (InjectRuntimeFilter) behind
  * conf heuristics; this operator makes it explicit and composable, with
  * the build/probe sizing under caller control.
  *
  * Determinism: false positives are removed by the exact rescue join, so
  * the result equals the plain semi-join bit-for-bit regardless of bloom
  * sizing — which is what the q68 oracle checks.
  */
object RuntimeFilter {

  /** Rows of `fact` whose `factKey` appears in `dim`'s `dimKey`
    * (exact left-semi semantics), bloom-pruned map-side first.
    *
    * The bloom build is one aggregation over the dim keys (fixed
    * numBits/8-byte partial state per partition, bitwise-OR merge); the
    * driver holds exactly one bit set and re-broadcasts it (numBits/8
    * bytes — 512 KiB at the 2^22 default), never the key set itself.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    val spark = fact.sparkSession
    val bytes = dim
      .select(ColumnBridge.column(
        BloomBuildAggregate(
          ColumnBridge.expression(xxhash64(col(dimKey))),
          numBits, numHashes).toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]](0)
    val bits = spark.sparkContext.broadcast(BloomUtil.fromBytes(bytes))
    val pruned = fact.filter(mightContain(col(factKey), bits, numBits, numHashes))
    val keys = dim.select(col(dimKey)).distinct()
    pruned.join(keys, pruned(factKey) === keys(dimKey), "left_semi")
  }

  /** Membership probe column against a broadcast bloom bit set; key is
    * hashed with xxhash64 to match the build side. */
  def mightContain(key: Column,
      bits: org.apache.spark.broadcast.Broadcast[Array[Long]],
      numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(xxhash64(key)), bits, numBits, numHashes))
}
