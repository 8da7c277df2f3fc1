package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Incremental exact dedup against a persistent fingerprint index —
  * the daily-ingestion shape of an LLM corpus pipeline: each new batch
  * must dedup against EVERYTHING already accepted, without rescanning
  * the corpus itself.
  *
  * The index is a parquet table of 64-bit text fingerprints
  * (TextAnalysis.fingerprint — md5-derived, engine-portable). A batch
  * is (1) deduped within itself (min-id keeper per fingerprint),
  * (2) anti-joined against the index, and (3) the survivors'
  * fingerprints are appended to the index. Re-submitting an
  * already-accepted batch therefore yields ZERO survivors —
  * exactly-once corpus growth under at-least-once delivery.
  *
  * Scale: the index holds one 16-hex-char row per accepted document —
  * a ~30 GB table for a billion docs — and the anti-join shuffles on a
  * uniform hash key (skew-free). The corpus text is never re-read.
  * The index append uses the staged-publish writer, so a retried batch
  * cannot double-append its fingerprints.
  */
object IncrementalDedup {

  val FpCol = "fp"

  /** Returns the batch rows that are new to the corpus (first
    * occurrence within the batch AND unseen in the index), and appends
    * their fingerprints to `indexPath`. `batchTag` identifies the
    * logical batch: REUSE it when re-delivering/retrying the same
    * batch, give distinct batches distinct tags.
    *
    * Idempotence: novelty is evaluated against the index EXCLUDING the
    * current tag's own files — a retry of a crashed (or even
    * completed) delivery therefore recomputes the same survivor set
    * and republishes over its previous partial publish, instead of
    * either masking its own documents as "seen" or (worse) having the
    * staged cleanup erase a completed publish and return nothing. */
  def acceptBatch(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, batchTag: String): DataFrame = {
    val spark = batch.sparkSession
    // within-batch exact dedup, then fingerprint once per survivor
    val fped = Dedup.exactDedup(batch, idCol, textCol)
      .withColumn(FpCol, TextAnalysis.fingerprint(col(textCol)))
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val otherFiles =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).map(_.getPath)
        .filter { f =>
          f.getName.endsWith(".parquet") || f.getName.contains("part-")
        }
        .filterNot(_.getName.startsWith(s"$batchTag-"))
        .map(_.toString)
    val novel =
      if (otherFiles.isEmpty) fped
      else {
        val index = spark.read.parquet(otherFiles.toIndexedSeq: _*)
        fped.join(index, Seq(FpCol), "left_anti")
      }
    // two consumers (index append + returned rows): materialize so the
    // dedup pipeline runs once and the lineage is cut before return
    val kept = novel.localCheckpoint(true)
    ParquetTable.appendStaged(kept.select(col(FpCol)), indexPath, batchTag)
    kept.drop(FpCol)
  }
}
