package graft.operators

import org.apache.spark.sql.SparkSession

/** Table maintenance: small-file compaction. Streaming ingest,
  * chunk-commit appends, and partition-scoped mutation all accrete
  * part files over time; scan throughput then dies by a thousand file
  * opens (and at cluster scale, by the driver's file-listing RPC).
  *
  * `compact` rewrites a parquet directory to ~`targetFileMB` output
  * files: input size comes from driver-side file metadata (no data
  * read), the rewrite uses `coalesce` — a NARROW dependency that
  * unions whole input splits per output file with NO shuffle — and the
  * commit is the same atomic staging swap every other writer here uses
  * (readers see old or new, never partial). Per-bucket compaction of a
  * PartitionedTable is this applied to each `__kb=` directory. */
object Maintenance {

  case class CompactionResult(filesBefore: Int, filesAfter: Int,
      bytes: Long)

  def compact(spark: SparkSession, path: String,
      targetFileMB: Int = 128): CompactionResult = {
    require(targetFileMB > 0, "targetFileMB must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    // data files = everything except metadata/hidden (_SUCCESS, .crc):
    // appendStaged publishes '<tag>-part-*' names, so a 'part-' prefix
    // filter would silently no-op on exactly the chunk-commit tables
    // this utility exists for
    def isDataFile(f: org.apache.hadoop.fs.FileStatus): Boolean =
      f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")
    val parts = fs.listStatus(p).filter(isDataFile)
    val bytes = parts.map(_.getLen).sum
    val target = math.max(1,
      math.ceil(bytes.toDouble / (targetFileMB.toLong << 20)).toInt)
    if (parts.length <= target)
      return CompactionResult(parts.length, parts.length, bytes)
    val df = spark.read.parquet(path).coalesce(target)
    ParquetTable.overwriteAtomic(df, path)
    val after = fs.listStatus(p).count(isDataFile)
    CompactionResult(parts.length, after, bytes)
  }
}
