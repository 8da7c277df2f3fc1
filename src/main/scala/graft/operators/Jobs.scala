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
  * `etl/etl.py:290-293`). `failedRows` are rows in write batches that
  * exhausted the retry budget (reference `max_attempts`,
  * `etl/etl.py:273-293`). */
case class JobResult(totalRows: Long, writtenRows: Long, rejectedRows: Long,
    failedRows: Long = 0)

/** Write-path retry budget — the reference's send loop
  * (`etl/etl.py:273-293`): each statement is attempted `max_attempts`
  * times (default 3, `etl/etl.py:23`), every failed attempt notifies
  * `error`, and an exhausted budget reports failure WITHOUT aborting the
  * run (the caller continues with the next batch). */
object Retry {
  def withAttempts(maxAttempts: Int, observer: IngestObserver,
      what: String)(f: => Unit): Boolean = {
    var attempt = 0
    while (attempt < math.max(1, maxAttempts)) {
      try { f; return true }
      catch {
        case e: Exception =>
          attempt += 1
          observer.notify("error", s"$what: retrying (${e.getMessage})")
      }
    }
    observer.notify("error", s"Failed $what")
    false
  }
}

/** Parquet-backed table with an atomic overwrite commit (write staging dir
  * then swap) — the durability contract the reference delegates to
  * PostgreSQL transactions. */
object ParquetTable {
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Append via stage-then-publish with a deterministic batch tag —
    * safe under the retry budget, which plain SaveMode.Append is NOT:
    * a failed attempt can leave part files behind, and re-running the
    * whole append then silently duplicates rows. Here each attempt
    * first removes any files a previous partial publish of the SAME
    * tag left in the target, writes to a stage directory, then renames
    * part files in (per-file atomic on posix/HDFS; object stores
    * without atomic rename want a manifest-based table format
    * instead). */
  def appendStaged(df: DataFrame, path: String, tag: String): Unit = {
    // '<tag>-part-N' must stay invertible (PersistentIndex backfills
    // tags from it), and the cleanup below must not catch a DIFFERENT
    // tag that has this one as a '-'-delimited prefix; banning any
    // '-part' substring (not just '-part-') also rejects tags ENDING
    // in '-part', whose 'x-part-part-N' files tag 'x' would delete
    require(tag.nonEmpty && !tag.contains("-part") && !tag.contains("/"),
      s"batch tag ('$tag') must be non-empty and contain neither " +
        "'-part' nor '/'")
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(hconf)
    val stage = new org.apache.hadoop.fs.Path(path + s"__stage_$tag")
    fs.delete(stage, true)
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    fs.mkdirs(target)
    fs.listStatus(target)
      .filter(_.getPath.getName.startsWith(s"$tag-part-"))
      .foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(stage)
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach { f =>
        fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(target, s"$tag-${f.getPath.getName}"))
      }
    fs.delete(stage, true)
  }

  /** Atomic replace: materialize to `<path>__staging`, then swap dirs.
    * Readers see either the old or the new table, never a partial write.
    * At cluster scale the same protocol is what table formats (Delta/
    * Iceberg) implement with manifest files; here directory rename is the
    * commit point.
    *
    * `extraFiles`: empty underscore-prefixed marker files created in the
    * staging dir BEFORE the swap, so they commit atomically with the
    * data (IncrementalAgg's exactly-once batch markers; parquet readers
    * ignore underscore-prefixed names). */
  /** Heal the one non-atomic window in the swap protocol: a crash
    * BETWEEN `rename(target, backup)` and `rename(staging, target)`
    * leaves the table (and any batch markers) only in `__old`. Restore
    * it; if the target exists the backup is a superseded copy and this
    * is a no-op. Returns true when a restore happened. Called by
    * overwriteAtomic itself and by restart paths (the exactly-once
    * refresher) before their first read. */
  def recoverInterrupted(spark: SparkSession, path: String): Boolean = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "__old")
    if (!fs.exists(target) && fs.exists(backup)) fs.rename(backup, target)
    else false
  }

  def overwriteAtomic(df: DataFrame, path: String,
      extraFiles: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(hconf)
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    val backup = new org.apache.hadoop.fs.Path(path + "__old")
    recoverInterrupted(spark, path) // heal a predecessor's crash window
    fs.delete(staging, true)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(staging.toString)
    extraFiles.foreach { name =>
      require(name.startsWith("_"),
        s"marker file name ($name) must be underscore-prefixed")
      fs.create(new org.apache.hadoop.fs.Path(staging, name), true).close()
    }
    fs.delete(backup, true)
    if (fs.exists(target)) fs.rename(target, backup)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"commit swap failed for $path")
    fs.delete(backup, true)
  }
}

/** Contiguous 1-based global row numbers in scan order WITHOUT a
  * single-partition window: one tiny per-partition count pass (collected
  * to the driver — numPartitions rows), then a window partitioned by the
  * scan partition id (parallel) plus the partition's offset.
  *
  * PRECONDITION: the counts pass and the window pass must observe the
  * same partition layout and intra-partition row order. Deterministic
  * file scans satisfy this on their own; plans containing shuffles or
  * nondeterministic sources do not, so the input is persisted for the
  * two passes. Releasing before returning is not possible — the
  * returned plan still reads the cache — so the level is MEMORY_ONLY:
  * evicted blocks are genuinely dropped (a MEMORY_AND_DISK persist
  * would spill to executor disk and outlive its use), and eviction is
  * safe because recompute of a deterministic scan reproduces the same
  * layout the precondition already demands. */
object RowNumbers {
  def global(df: DataFrame, posCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val withPid = df.withColumn("__gr_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val counts = withPid.groupBy(col("__gr_pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetRows = counts.map(_._1).zip(offsets).toIndexedSeq
    val offsetDf = spark.createDataFrame(offsetRows)
      .toDF("__gr_pid", "__gr_off")
    val w = Window.partitionBy(col("__gr_pid"))
      .orderBy(monotonically_increasing_id())
    withPid.join(broadcast(offsetDf), Seq("__gr_pid"))
      .withColumn(posCol, row_number().over(w).cast("long") + col("__gr_off"))
      .drop("__gr_pid", "__gr_off")
  }
}

/** The reference's three entry points (`etl/etl.py:296,315,354`) as
  * set-oriented Spark pipelines over a parquet table.
  *
  * `writer(df, path, batchTag)` is the physical append (injectable so
  * specs can exercise the retry budget); the default is the staged
  * idempotent publish — a retried batch can never duplicate rows.
  * `commitBatches` > 1 opts into the reference's chunk-commit model —
  * the write is split into that many batches, each retried
  * `cfg.maxAttempts` times, and a batch that exhausts its budget
  * diverts to `failedBatchPath` while the run continues
  * (`etl/etl.py:273-293`). The default single batch keeps the one
  * distributed write (task-level retries handle transient executor
  * failures; the budget guards job-level sink failures). */
class InsertJob(csvPath: String, tablePath: String, cfg: IngestConfig,
    observer: IngestObserver = IngestObserver.silent,
    rejectedPath: Option[String] = None,
    writer: (DataFrame, String, String) => Unit = ParquetTable.appendStaged,
    commitBatches: Int = 1,
    failedBatchPath: Option[String] = None,
    runTag: Option[String] = None) {

  /** Scan -> type -> geometry -> append. One distributed write replaces
    * the reference's chunked INSERT loop; `chunkSize` sizes the write
    * partitions so each task's output file stays bounded.
    *
    * `startChunk`/`endChunk` (1-based, inclusive) resume a partial load
    * exactly like the reference's offsets (`etl/etl.py:148,37-56` —
    * minus its quirk Q2, which mis-applied them within every chunk).
    * Chunk membership is row-position based; numbering comes from
    * RowNumbers.global (per-partition offsets — parallel, never a
    * single-partition window). At cluster scale resumability can also
    * come from Structured Streaming checkpoints (SURVEY §4).
    *
    * Rows Spark's CSV parser flags as malformed are diverted to
    * `rejectedPath` (or dropped with a notify) rather than failing the
    * load — the set-oriented form of the reference's continue-on-failure
    * sends (quirk Q4). */
  def run(startChunk: Int = 1, endChunk: Option[Int] = None): JobResult = {
    val session = org.apache.spark.sql.SparkSession.active
    // Batch tags must be unique PER RUN: appendStaged's idempotent cleanup
    // deletes target files with the same tag prefix, so a constant tag
    // would make a second append into the same table (resume, second CSV)
    // delete the first run's rows. Within one run the tag is stable across
    // retry attempts — that is what makes a retried batch idempotent.
    // Crash recovery ACROSS JVMs: a run that died mid-publish leaves
    // '<tag>-b<i>-part-*' orphans a fresh random tag can never clean —
    // pass the dead run's `runTag` to the recovery run and its batches
    // republish over the orphans instead of alongside them.
    val runId = runTag.getOrElse(java.util.UUID.randomUUID().toString.take(8))
    // cached: Spark disallows queries that touch only the corrupt-record
    // column of a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    // the scan feeds four consumers below anyway
    val raw0 = CsvIngest.scanWithCorrupt(session, csvPath, cfg).persist()
    // one aggregate pass for both the malformed count and the clean
    // total (separate counts cost a full job each — fixed scheduling
    // latency that dominates small loads and repeats per resume slice)
    val countsRow = raw0.agg(
      count(lit(1)).as("__all"),
      count(col(CsvIngest.CorruptCol)).as("__bad")).head()
    val rejected = countsRow.getLong(1)
    val total = countsRow.getLong(0) - rejected
    if (rejected > 0) {
      val bad = raw0.filter(col(CsvIngest.CorruptCol).isNotNull)
      rejectedPath.foreach(p => bad.write.mode(SaveMode.Append).parquet(p))
      observer.notify("error", s"$rejected malformed rows diverted")
    }
    val raw = raw0.filter(col(CsvIngest.CorruptCol).isNull)
      .drop(CsvIngest.CorruptCol)
    observer.notify("total_rows", total.toString)
    val sliced =
      if (startChunk <= 1 && endChunk.isEmpty) raw
      else {
        // Column `/` is double division — floor for integral chunk ids
        val chunk = floor((col("__rownum") - 1) / cfg.chunkSize) + 1
        RowNumbers.global(raw, "__rownum")
          .withColumn("__chunk", chunk)
          .filter(col("__chunk") >= startChunk &&
            endChunk.map(e => col("__chunk") <= e).getOrElse(lit(true)))
          .drop("__chunk", "__rownum")
      }
    val typed = CsvIngest.typedProjection(sliced, cfg,
      CsvIngest.inferColumnKinds(sliced, cfg))
    // typedProjection is a row-preserving map-only select, so on a full
    // (unsliced) load the typed count IS the clean total — no extra job
    val typedRows =
      if (startChunk <= 1 && endChunk.isEmpty) total else typed.count()
    var written = 0L
    var failed = 0L
    if (commitBatches <= 1) {
      val parts = math.max(1,
        math.min(10000, (typedRows / math.max(1, cfg.chunkSize)).toInt))
      val ok = Retry.withAttempts(cfg.maxAttempts, observer, "append") {
        writer(typed.repartition(parts), tablePath, s"$runId-b0")
      }
      if (ok) written = typedRows
      else {
        failed = typedRows
        failedBatchPath.foreach(p =>
          typed.write.mode(SaveMode.Append).parquet(p))
      }
    } else {
      // reference chunk-commit: batches are row-range chunk groups
      // (chunkSize rows per chunk, chunks round-robined over batches),
      // each retried independently; failures divert and the run continues
      val batched = RowNumbers.global(typed, "__rownum")
        .withColumn("__batch",
          pmod(floor((col("__rownum") - 1) / cfg.chunkSize), lit(commitBatches)))
        .drop("__rownum")
        .persist()
      try {
        for (b <- 0 until commitBatches) {
          val batch = batched.filter(col("__batch") === b).drop("__batch")
          val n = batch.count()
          if (n > 0) {
            val ok = Retry.withAttempts(cfg.maxAttempts, observer,
              s"batch ${b + 1}") {
              writer(batch, tablePath, s"$runId-b$b")
            }
            if (ok) {
              written += n
              observer.notify("progress", s"batch ${b + 1}")
            } else {
              failed += n
              failedBatchPath.foreach(p =>
                batch.write.mode(SaveMode.Append).parquet(p))
            }
          }
        }
      } finally batched.unpersist()
    }
    raw0.unpersist()
    observer.notify("progress", s"written $written")
    JobResult(total, written, rejected, failed)
  }
}

class UpdateByKeyJob(csvPath: String, tablePath: String, cfg: IngestConfig,
    observer: IngestObserver = IngestObserver.silent) {
  require(cfg.idColumn.nonEmpty, "update requires idColumn")

  /** The reference updates row-at-a-time in file order so the last row per
    * key wins (`etl/etl.py:315-351`); here: one MERGE with an explicit
    * file-position order column, committed atomically.
    *
    * `startRow`/`endRow` (1-based, inclusive) replicate the reference's
    * row-range resume (T7, `etl/etl.py:320-330`). */
  def run(startRow: Int = 1, endRow: Option[Int] = None): JobResult = {
    val session = org.apache.spark.sql.SparkSession.active
    val scanned = CsvIngest.scan(session, csvPath, cfg)
    val sliced =
      if (startRow <= 1 && endRow.isEmpty)
        scanned.withColumn("__pos", monotonically_increasing_id())
      else
        RowNumbers.global(scanned, "__pos")
          .filter(col("__pos") >= startRow &&
            endRow.map(e => col("__pos") <= e).getOrElse(lit(true)))
    val raw = sliced
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
