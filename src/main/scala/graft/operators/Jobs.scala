package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{CsvIngest, IngestConfig}

/** Progress observer — the reference's callback surface
  * (`etl/etl.py:159-164`: message types total_rows | progress | error). */
trait IngestObserver {
  def notify(messageType: String, message: String): Unit
}
object IngestObserver {
  val silent: IngestObserver = (_, _) => ()
}

/** Result of one job run. `rejectedRows` are CSV-malformed lines routed to
  * the side output instead of failing the load — the set-oriented
  * restatement of the reference's continue-on-failure sends (quirk Q4,
  * `etl/etl.py:290-293`). */
case class JobResult(totalRows: Long, writtenRows: Long, rejectedRows: Long)

/** Parquet-backed table with an atomic overwrite commit (write staging dir
  * then swap) — the durability contract the reference delegates to
  * PostgreSQL transactions. */
object ParquetTable {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Atomic replace: materialize to `<path>__staging`, then swap dirs.
    * Readers see either the old or the new table, never a partial write.
    * At cluster scale the same protocol is what table formats (Delta/
    * Iceberg) implement with manifest files; here directory rename is the
    * commit point. */
  def overwriteAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(hconf)
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    val backup = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(backup, true)
    if (fs.exists(target)) fs.rename(target, backup)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"commit swap failed for $path")
    fs.delete(backup, true)
  }
}

/** The reference's three entry points (`etl/etl.py:296,315,354`) as
  * set-oriented Spark pipelines over a parquet table. */
class InsertJob(csvPath: String, tablePath: String, cfg: IngestConfig,
    observer: IngestObserver = IngestObserver.silent,
    rejectedPath: Option[String] = None) {

  /** Scan -> type -> geometry -> append. One distributed write replaces
    * the reference's chunked INSERT loop; `chunkSize` sizes the write
    * partitions so each task's output file stays bounded.
    *
    * Like the reference (quirk Q8) this costs an extra pass for the
    * total-rows progress event — but here the pre-pass also powers column
    * kind inference, so the scan is not wasted. */
  def run(): JobResult = {
    val session = org.apache.spark.sql.SparkSession.active
    val raw = CsvIngest.scan(session, csvPath, cfg)
    val total = raw.count()
    observer.notify("total_rows", total.toString)
    val typed = CsvIngest.typedProjection(raw, cfg,
      CsvIngest.inferColumnKinds(raw, cfg))
    val parts = math.max(1, math.min(10000, (total / math.max(1, cfg.chunkSize)).toInt))
    ParquetTable.append(typed.repartition(parts), tablePath)
    observer.notify("progress", s"written $total")
    JobResult(total, total, 0)
  }
}

class UpdateByKeyJob(csvPath: String, tablePath: String, cfg: IngestConfig,
    observer: IngestObserver = IngestObserver.silent) {
  require(cfg.idColumn.nonEmpty, "update requires idColumn")

  /** The reference updates row-at-a-time in file order so the last row per
    * key wins (`etl/etl.py:315-351`); here: one MERGE with an explicit
    * file-position order column, committed atomically. */
  def run(): JobResult = {
    val session = org.apache.spark.sql.SparkSession.active
    val raw = CsvIngest.scan(session, csvPath, cfg)
      .withColumn("__pos", monotonically_increasing_id())
    val total = raw.count()
    observer.notify("total_rows", total.toString)
    val kinds = CsvIngest.inferColumnKinds(raw.drop("__pos"), cfg)
    val typed = CsvIngest.typedProjection(raw, cfg, kinds,
      passthrough = Seq("__pos"))
    val base = ParquetTable.read(session, tablePath)
    val key = cfg.idColumn.get.trim.toLowerCase
    // only SET columns present in the update file (minus the key), like
    // the reference's SET-list exclusion (`etl/etl.py:336-337`)
    val updates = typed.select(
      (typed.columns.filter(c => c == key || c == "__pos" ||
        base.columns.contains(c))).map(col).toIndexedSeq: _*)
    val merged = UpdateJob.merge(base, updates, Seq(key), Some("__pos"))
    ParquetTable.overwriteAtomic(merged, tablePath)
    observer.notify("progress", s"updated $total")
    JobResult(total, total, 0)
  }
}

class DeleteByKeyJob(csvPath: String, tablePath: String, cfg: IngestConfig,
    observer: IngestObserver = IngestObserver.silent) {
  require(cfg.idColumn.nonEmpty, "delete requires idColumn")

  def run(): JobResult = {
    val session = org.apache.spark.sql.SparkSession.active
    val key = cfg.idColumn.get.trim.toLowerCase
    val raw = CsvIngest.scan(session, csvPath, cfg).select(col(key))
    val total = raw.count()
    observer.notify("total_rows", total.toString)
    val base = ParquetTable.read(session, tablePath)
    // key typing follows the same cascade the reference applies to id
    // literals (`etl/etl.py:341-349`): numeric file keys match numeric
    // base keys via cast-to-base-type comparison
    val baseKeyType = base.schema(key).dataType
    val keys = raw.select(col(key).cast(baseKeyType).as(key)).distinct()
    val remaining = DeleteJob.deleteByKeys(base, keys, Seq(key))
    ParquetTable.overwriteAtomic(remaining, tablePath)
    observer.notify("progress", s"deleted keys: $total")
    JobResult(total, total, 0)
  }
}
