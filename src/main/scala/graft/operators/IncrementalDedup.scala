package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Incremental exact dedup against a persistent fingerprint index —
  * the daily-ingestion shape of an LLM corpus pipeline: each new batch
  * must dedup against EVERYTHING already accepted, without rescanning
  * the corpus itself.
  *
  * The index is a [[PersistentIndex]] table of 64-bit text
  * fingerprints (TextAnalysis.fingerprint — md5-derived,
  * engine-portable) plus the batch tag that wrote each row. A batch
  * is (1) deduped within itself (min-id keeper per fingerprint),
  * (2) anti-joined against the index — reading only the fingerprint-
  * prefix partitions the batch hashes into — and (3) the survivors'
  * fingerprints are appended to the index. Re-submitting an
  * already-accepted batch therefore yields ZERO survivors —
  * exactly-once corpus growth under at-least-once delivery.
  *
  * Scale: the index holds one 16-hex-char row per accepted document —
  * a ~30 GB table for a billion docs — and the anti-join shuffles on a
  * uniform hash key (skew-free). The corpus text is never re-read.
  * The index append uses the staged-publish writer, so a retried batch
  * cannot double-append its fingerprints; [[compactIndex]] folds the
  * accreted per-batch file sets periodically (tag-preserving).
  */
object IncrementalDedup {

  val FpCol = "fp"

  private val IndexSchema = s"$FpCol STRING, tag STRING"

  /** Returns the batch rows that are new to the corpus (first
    * occurrence within the batch AND unseen in the index), and appends
    * their fingerprints to `indexPath`. `batchTag` identifies the
    * logical batch: REUSE it when re-delivering/retrying the same
    * batch, give distinct batches distinct tags.
    *
    * Idempotence: novelty is evaluated against the index EXCLUDING the
    * current tag's own ROWS — the tag COLUMN, so the contract survives
    * a compaction that moves rows between files (the filename-prefix
    * skip is only a read optimization) — and the retry republishes
    * over its previous partial publish, instead of either masking its
    * own documents as "seen" or (worse) having the staged cleanup
    * erase a completed publish and return nothing. */
  def acceptBatch(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, batchTag: String): DataFrame = {
    val spark = batch.sparkSession
    // within-batch exact dedup, then fingerprint once per survivor;
    // persisted (not checkpointed): feeds the pruning collect, the
    // anti-join, and the append, and its lineage is only the caller's
    // batch frame — never the index — so a cache recompute is always
    // safe. The pruning collect below is the first action, so ONE job
    // materializes the cache AND returns the touched partitions (the
    // r12 shape paid a separate eager-checkpoint job per acceptBatch
    // first; r13, guide §1.2). Deliberately NOT Scale.spread here
    // (r12, measured): a micro-batch's one-pass md5 is milliseconds of
    // CPU, while the spread's 32-task layout taxes EVERY downstream
    // index job of the lifecycle with per-stage task overhead (q419
    // +5.9 s). Callers whose post-accept work is heavy spread the
    // SURVIVORS themselves (q324); at production scale a bulk batch is
    // multi-split anyway.
    val fped = Dedup.exactDedup(batch, idCol, textCol)
      .withColumn(FpCol, TextAnalysis.fingerprint(col(textCol)))
      .withColumn(PersistentIndex.PfxCol,
        PersistentIndex.pfxOf(col(FpCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // only partitions a batch fingerprint hashes into can hold an
      // equal fingerprint — bounded collect (<= NumPfx values)
      val touched = fped.select(col(PersistentIndex.PfxCol)).distinct()
        .collect().map(_.getInt(0)).toSet
      val index = PersistentIndex.readExcluding(spark, indexPath, batchTag,
        IndexSchema, Some(touched))
      // two consumers (index append + returned rows): materialize so the
      // anti-join runs once and the lineage is cut before the append
      // mutates the index it read
      val kept = fped.join(index.select(col(FpCol)), Seq(FpCol), "left_anti")
        .localCheckpoint(true)
      PersistentIndex.appendStaged(
        kept.select(col(FpCol), lit(batchTag).as("tag"),
          col(PersistentIndex.PfxCol)),
        indexPath, batchTag)
      kept.drop(FpCol, PersistentIndex.PfxCol)
    } finally fped.unpersist(blocking = false)
  }

  /** Tag-preserving atomic compaction — see [[PersistentIndex.compact]].
    * @return (data files before, after) */
  def compactIndex(spark: SparkSession, indexPath: String): (Int, Int) =
    PersistentIndex.compact(spark, indexPath, IndexSchema, _(FpCol))

  /** Opt-in auto-compaction cadence — call after each acceptBatch and
    * the index folds itself whenever accreted file sets exceed the
    * threshold (see [[PersistentIndex.compactIfAccreted]]); verdicts
    * are invariant under when it fires. */
  def compactIndexIfAccreted(spark: SparkSession, indexPath: String,
      maxFileFactor: Int = 4): Option[(Int, Int)] =
    PersistentIndex.compactIfAccreted(spark, indexPath, IndexSchema,
      _(FpCol), maxFileFactor)

  /** Takedown of one accepted batch's fingerprints — see
    * [[PersistentIndex.deleteTag]]. Afterwards, re-submitting the
    * removed documents (under a NEW tag) re-accepts them.
    * @return index rows removed */
  def deleteBatch(spark: SparkSession, indexPath: String,
      batchTag: String): Long =
    PersistentIndex.deleteTag(spark, indexPath, IndexSchema, _(FpCol),
      batchTag)
}
