package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TypeCascade
import graft.sources.{CsvIngest, IngestConfig}

/** Streaming CSV ingest — the cluster-scale restatement of the
  * reference's chunk-resume loader (`etl/etl.py:37-56,148`): instead of
  * row-offset bookkeeping, each CSV file dropped into the source
  * directory is ingested exactly once, and a restart resumes from the
  * checkpoint with no reprocessing (SURVEY §1.1 / §4).
  *
  * Column kinds cannot be re-voted mid-stream (that would be a per-batch
  * schema change), so they are inferred ONCE from the files present at
  * start — the same static scan the batch jobs run — or supplied by the
  * caller. New files must match the bootstrap header.
  */
object CsvStreamIngest {

  /** The streaming typed pipeline: readStream.csv with the bootstrap
    * header schema, headers normalized, T3-T5 typed projection. */
  def ingest(spark: SparkSession, dir: String, cfg: IngestConfig,
      kinds: Option[Map[String, CsvIngest.ColKind]] = None): DataFrame = {
    val bootstrap = CsvIngest.scan(spark, dir, cfg)
    val resolvedKinds = kinds.getOrElse(
      CsvIngest.inferColumnKinds(bootstrap, cfg))
    val raw = spark.readStream
      .option("header", "true")
      .option("delimiter", cfg.delimiter)
      .option("encoding", cfg.encoding)
      .option("maxCharsPerColumn", "-1")
      // bootstrap schema carries the (already normalized) header names;
      // normalizeHeaders below is then a no-op rename, kept for the
      // collision-dedup guarantee
      .schema(org.apache.spark.sql.types.StructType(
        bootstrap.schema.fields.map(f =>
          org.apache.spark.sql.types.StructField(f.name,
            org.apache.spark.sql.types.StringType))))
      .csv(dir)
    CsvIngest.typedProjection(TypeCascade.normalizeHeaders(raw), cfg,
      resolvedKinds)
  }

  /** Run the ingest to a parquet table with AvailableNow semantics:
    * process every file not yet recorded in `checkpoint`, then stop.
    * Calling again after new files arrive continues exactly where the
    * last run left off — the reference's `start_chunk` resume with the
    * bookkeeping delegated to the checkpoint log. */
  def runAvailableNow(spark: SparkSession, dir: String, tablePath: String,
      checkpoint: String, cfg: IngestConfig,
      kinds: Option[Map[String, CsvIngest.ColKind]] = None): StreamingQuery =
    ingest(spark, dir, cfg, kinds).writeStream
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
