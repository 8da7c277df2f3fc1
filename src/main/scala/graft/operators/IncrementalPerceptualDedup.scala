package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental PERCEPTUAL dedup against a persistent hash index — the
  * daily-ingestion shape of q389/q390's batch near-dup, and the
  * image/audio sibling of [[IncrementalDedup]] (exact text) and
  * [[IncrementalSemanticDedup]] (embeddings): each new batch of 64-bit
  * perceptual fingerprints ([[Multimodal.dHash64]] images,
  * [[Multimodal.audioEnergyHash64]] audio) must near-dup against
  * EVERYTHING already accepted without re-decoding earlier media.
  *
  * The index is a [[PersistentIndex]] table of (band, id, h, tag):
  * four 16-bit bands per hash — 4 skinny rows per accepted item,
  * tagged with the batch that wrote them, laid out in band-prefix
  * partitions. A batch (1) bands its hashes, (2) probes the index on
  * exact band equality excluding its own tag's rows — the
  * [[IncrementalDedup]] retry-idempotence contract, enforced by the
  * tag COLUMN — reading ONLY the partitions its own bands hash into
  * (O(touched bands) I/O, not O(index)), (3) verifies candidates by
  * bit_count(xor) ≤ maxHamming and reports each batch item's EARLIER
  * near-duplicates, then (4) appends ALL its bands to the index —
  * flagged items too (the all-seen index: a later copy of a copy
  * still flags, and the flag-iff-any-earlier semantics stay provably
  * batch-split-invariant). Within-batch near-dups do NOT flag each
  * other (both are first sightings; run the batch operator inside the
  * batch if that matters).
  *
  * Scale: the index holds 4 rows × 8-byte hash per accepted item; the
  * probe shuffles on the band key exactly like the batch operator —
  * bounded buckets, uniform 16-bit band values. Daily appends accrete
  * one file set per batch forever; run [[compactIndex]] periodically
  * to rewrite them into one file per partition (tag-preserving, so
  * every contract above survives compaction — spec-pinned).
  *
  * @return flagged batch rows: (idCol, n_hits = distinct earlier
  *         near-dups, min_hamming, min_earlier_id) */
object IncrementalPerceptualDedup {

  private val IndexSchema = "band STRING, id BIGINT, h BIGINT, tag STRING"

  def acceptBatch(batch: DataFrame, idCol: String, hashCol: String,
      indexPath: String, batchTag: String,
      maxHamming: Int = 10): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming ($maxHamming) out of [0, 64]")
    val spark = batch.sparkSession
    val banded = batch
      .select(col(idCol).as("__id"), col(hashCol).cast("long").as("__h"))
      .select(col("__id"), col("__h"),
        explode(Multimodal.bands64(col("__h"))).as("band"))
      .withColumn(PersistentIndex.PfxCol,
        PersistentIndex.pfxOf(col("band")))
      // three consumers (pruning set + probe + index append): run the
      // banding once. Persisted, not checkpointed: the lineage is only
      // the caller's batch frame (never the index), so a cache
      // recompute is always safe, and the pruning collect below is the
      // first action — ONE job materializes the cache AND returns the
      // touched set (r12 paid a separate eager-checkpoint job per
      // acceptBatch first; r13, guide §1.2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // partition pruning: only the index partitions this batch's bands
    // hash into can hold an equal band — bounded collect (<= NumPfx)
    val touched = banded.select(col(PersistentIndex.PfxCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    val indexDf = PersistentIndex.readExcluding(spark, indexPath,
      batchTag, IndexSchema, Some(touched))
    val flagged = banded.join(indexDf, Seq("band"))
      .select(col("__id"), col("id").as("__eid"), col("__h"),
        col("h").as("__eh"))
      .distinct() // one row per (item, earlier) pair, any shared band
      .withColumn("hamming",
        bit_count(col("__h").bitwiseXOR(col("__eh"))))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("hamming")).cast("int").as("min_hamming"),
        min(col("__eid")).as("min_earlier_id"))
      .withColumnRenamed("__id", idCol)
      // materialize NOW: the lazy plan reads the index by file paths,
      // which later batches' appends — and compactIndex's rewrite —
      // invalidate; the returned verdicts must be stable against any
      // subsequent index mutation (the IncrementalDedup discipline)
      .localCheckpoint(true)
    PersistentIndex.appendStaged(
      banded.select(col("band"), col("__id").as("id"),
        col("__h").as("h"), lit(batchTag).as("tag"),
        col(PersistentIndex.PfxCol)),
      indexPath, batchTag)
    flagged
    } finally banded.unpersist(blocking = false)
  }

  /** Tag-preserving atomic compaction — see [[PersistentIndex.compact]].
    * @return (data files before, after) */
  def compactIndex(spark: SparkSession,
      indexPath: String): (Int, Int) =
    PersistentIndex.compact(spark, indexPath, IndexSchema, _("band"))

  /** Opt-in auto-compaction cadence — [[IncrementalDedup
    * .compactIndexIfAccreted]]'s perceptual sibling. */
  def compactIndexIfAccreted(spark: SparkSession, indexPath: String,
      maxFileFactor: Int = 4): Option[(Int, Int)] =
    PersistentIndex.compactIfAccreted(spark, indexPath, IndexSchema,
      _("band"), maxFileFactor)

  /** Takedown of one accepted batch's band rows —
    * [[IncrementalDedup.deleteBatch]]'s perceptual sibling. */
  def deleteBatch(spark: SparkSession, indexPath: String,
      batchTag: String): Long =
    PersistentIndex.deleteTag(spark, indexPath, IndexSchema, _("band"),
      batchTag)
}
