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

  /** Order-independent table fingerprint for anti-entropy checks:
    * compare two copies of a 100 TB table (primary vs replica, before
    * vs after a migration, engine A vs engine B) WITHOUT moving the
    * data — each side computes one map-only pass plus a partial-
    * aggregated reduce and ships back a handful of longs.
    *
    * Each row canonicalizes to `'|'`-joined string casts (NULL → ''),
    * hashes to the 60-bit prefix of its md5, and reduces mod 1e9+7 so
    * row-hash sums stay inside BIGINT out to ~9e9 rows. The digest is
    * {count, sum, xor, min, max} of those row hashes: sum/xor are
    * commutative — partition order, file order, and shuffle order
    * cannot change them — and the pair catches what either alone
    * misses (xor is blind to duplicated pairs, sum to balanced swaps).
    * md5 on UTF-8 plus explicit string casts make the digest
    * engine-portable (DuckDB computes the identical value from the
    * identical SQL restatement — the q187 oracle row).
    *
    * Caller contract: avoid raw float/double columns (engines differ
    * in shortest-repr formatting) — cast to DECIMAL or cents first. */
  def tableChecksum(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String],
      groupCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "tableChecksum needs at least one column")
    val canon = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val h = (conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
      % lit(1000000007L)).as("__h")
    val hashed = df.select(groupCols.map(col) :+ h: _*)
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      sum(col("__h")).as("sum_mod"),
      expr("bit_xor(__h)").as("xor_h"),
      min(col("__h")).as("min_h"),
      max(col("__h")).as("max_h"))
    if (groupCols.isEmpty) hashed.agg(aggs.head, aggs.tail: _*)
    else hashed.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
