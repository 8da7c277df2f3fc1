package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incremental PERCEPTUAL dedup against a persistent hash index — the
  * daily-ingestion shape of q389/q390's batch near-dup, and the
  * image/audio sibling of [[IncrementalDedup]] (exact text) and
  * IncrementalSemanticDedup (embeddings): each new batch of 64-bit
  * perceptual fingerprints ([[Multimodal.dHash64]] images,
  * [[Multimodal.audioEnergyHash64]] audio) must near-dup against
  * EVERYTHING already accepted without re-decoding earlier media.
  *
  * The index is a parquet table of (band, id, h, tag): four 16-bit
  * bands per hash — 4 skinny rows per accepted item, tagged with the
  * batch that wrote them. A batch (1) bands its hashes, (2) probes
  * the index on exact band equality excluding its own tag's rows —
  * the [[IncrementalDedup]] retry-idempotence contract, enforced by
  * the tag COLUMN (the filename prefix is only a read-skipping
  * optimization, because compaction rewrites file names), (3)
  * verifies candidates by bit_count(xor) ≤ maxHamming and reports
  * each batch item's EARLIER near-duplicates, then (4) appends ALL
  * its bands to the index — flagged items too (the all-seen index: a
  * later copy of a copy still flags, and the flag-iff-any-earlier
  * semantics stay provably batch-split-invariant). Within-batch
  * near-dups do NOT flag each other (both are first sightings; run
  * the batch operator inside the batch if that matters).
  *
  * Scale: the index holds 4 rows × 8-byte hash per accepted item; the
  * probe shuffles on the band key exactly like the batch operator —
  * bounded buckets, uniform 16-bit band values. Daily appends accrete
  * one file set per batch forever; run [[compactIndex]] periodically
  * to rewrite them into one (tag-preserving, so every contract above
  * survives compaction — spec-pinned).
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
      // two consumers (probe + index append): run the banding once
      .localCheckpoint(true)
    val indexDf = readIndexExcluding(spark, indexPath, batchTag)
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
    ParquetTable.appendStaged(
      banded.select(col("band"), col("__id").as("id"),
        col("__h").as("h"), lit(batchTag).as("tag")),
      indexPath, batchTag)
    flagged
  }

  private def readIndexExcluding(spark: SparkSession, indexPath: String,
      batchTag: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val otherFiles =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).map(_.getPath)
        .filter { f =>
          f.getName.endsWith(".parquet") || f.getName.contains("part-")
        }
        // read-skipping only: post-compaction the tag's rows live in
        // files without its prefix — the column filter below is the
        // correctness guarantee
        .filterNot(_.getName.startsWith(s"$batchTag-"))
        .map(_.toString)
    if (otherFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType.fromDDL(IndexSchema))
    else spark.read.parquet(otherFiles.toIndexedSeq: _*)
      .filter(col("tag") =!= batchTag)
  }

  /** Rewrite the accreted per-batch file sets into one compact set —
    * tag-PRESERVING, so flag sets and retry idempotence are invariant
    * (spec-pinned): rows keep the batch tag they were written under,
    * and probes exclude by the tag column wherever the rows live.
    * Rows dedup on the full tuple, which also cleans the double-
    * stored bands a post-compaction retry of an old tag can leave
    * (its flags were already correct — the probe's pair set is
    * distinct — but the storage isn't). Atomic swap: readers see the
    * old or the new index, never a partial one.
    * @return (data files before, after) */
  def compactIndex(spark: SparkSession,
      indexPath: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0, 0)
    def dataFiles(): Int = fs.listStatus(p).map(_.getPath.getName)
      .count(n => n.endsWith(".parquet") || n.contains("part-"))
    val before = dataFiles()
    // an empty-batch accept creates the directory without data files;
    // spark.read.parquet cannot infer a schema from it — nothing to
    // compact either way
    if (before == 0) return (0, 0)
    // materialize BEFORE the swap: overwriteAtomic must not read the
    // directory it is replacing
    val all = spark.read.parquet(indexPath).distinct()
      .coalesce(math.max(1, before / 16))
      .localCheckpoint(true)
    ParquetTable.overwriteAtomic(all, indexPath)
    (before, dataFiles())
  }
}
