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
  * PartitionedTable is this applied to each `__kb=` directory.
  *
  * NOT for [[PersistentIndex]] directories — use
  * `PersistentIndex.compact`. The modern `pfx=N/` layout AND any
  * directory carrying the contract-#6 `_graft_index` marker are
  * refused mechanically below; the marker closes the legacy-flat
  * gap for every index marker-era code has ever appended to or
  * compacted. The one remaining undetectable case is a LEGACY flat
  * index (pre-partition-era, `<tag>-part-*` files at the root)
  * NEVER touched by marker-era code — indistinguishable from an
  * ordinary chunk-commit table by its filenames; rewriting one here
  * would strip the filename encoding that pre-tag-column rows
  * backfill their tag from — breaking that index's retry idempotence
  * and takedown. Migrating such an index is exactly what
  * `PersistentIndex.compact` does (durable tag backfill +
  * partitioned layout + marker stamp); run it, not this. */
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
    val entries = fs.listStatus(p)
    // refuse PersistentIndex layouts BY NAME: this utility lists only
    // root-level files, so on a `pfx=N/`-partitioned index it would
    // either silently no-op (no root files) or — if legacy flat files
    // exist — rewrite the WHOLE tree via spark.read of the root,
    // demoting every partitioned row to an always-read unpartitioned
    // file and silently evaporating partition pruning. For rows that
    // already CARRY the tag column, correctness survives (only the
    // layout dies); pre-tag-column legacy rows would additionally
    // lose their filename-backfilled tag — but a PURELY flat legacy
    // index has no pfx= marker to detect, so that case is documented
    // above rather than caught here
    require(!entries.exists(f => f.isDirectory &&
        f.getPath.getName.startsWith(s"${PersistentIndex.PfxCol}=")),
      s"$path carries ${PersistentIndex.PfxCol}= partition " +
        "directories (a PersistentIndex layout) — use " +
        "PersistentIndex.compact, which preserves the pruned layout; " +
        "Maintenance.compact would flatten it")
    // contract #6: the marker catches index directories the layout
    // check can't — e.g. a legacy FLAT index that marker-era code has
    // appended to (the r11 VERDICT's undetectable case, now stamped)
    require(!entries.exists(f => f.isFile &&
        f.getPath.getName == PersistentIndex.MarkerFile),
      s"$path carries the ${PersistentIndex.MarkerFile} marker (a " +
        "PersistentIndex) — use PersistentIndex.compact, which " +
        "preserves tag encoding and the pruned layout")
    val parts = entries.filter(isDataFile)
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

  /** Merkle-style snapshot diff: compare two versions of a keyed table
    * WITHOUT a full row join — first summarize each side into
    * `nBuckets` per-bucket checksums (bucket = md5(key) mod nBuckets,
    * checksum = the [[tableChecksum]] arithmetic: order-independent
    * modular sum + xor of row digests), compare the tiny bucket
    * tables, then row-diff ONLY the buckets whose checksums differ.
    * At 100 TB this is the replication / time-travel audit: the
    * summary pass is one map + one nBuckets-row aggregate per side,
    * and the expensive key-level anti/full joins touch just the
    * changed buckets' rows (a localized change touches O(changed)
    * data, not O(table)).
    *
    * Same engine-portability contract as [[tableChecksum]]: md5 on
    * explicit string casts, no raw float columns in `valCols`.
    *
    * @return one row per DIFFERING bucket: (bucket, n_rows_a,
    *   n_rows_b, n_added, n_removed, n_changed) — n_added/removed by
    *   key presence, n_changed = same key, different value digest;
    *   identical buckets produce no row (the 100 TB-friendly
    *   contract: output scales with the diff, not the table) */
  def bucketedDiff(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      valCols: Seq[String], nBuckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty && valCols.nonEmpty && nBuckets > 0,
      "need keys, values, and nBuckets > 0")
    def prep(df: org.apache.spark.sql.DataFrame) = {
      val keyCanon = concat_ws("|",
        keyCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
      val valCanon = concat_ws("|",
        valCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
      df.select(
        (conv(substring(md5(keyCanon), 1, 15), 16, 10).cast("long")
          % nBuckets).as("bucket"),
        keyCanon.as("__key"),
        (conv(substring(md5(valCanon), 1, 15), 16, 10).cast("long")
          % lit(1000000007L)).as("__vh"))
    }
    def summarize(df: org.apache.spark.sql.DataFrame, side: String) =
      df.groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"n_rows_$side"),
          sum(col("__vh")).as(s"sum_$side"),
          expr("bit_xor(__vh)").as(s"xor_$side"))
    val pa = prep(a).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val pb = prep(b).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // bucket summaries are nBuckets-sized: full-outer join is tiny
    val differing = summarize(pa, "a")
      .join(summarize(pb, "b"), Seq("bucket"), "full_outer")
      .filter(
        col("n_rows_a").isNull || col("n_rows_b").isNull ||
        col("n_rows_a") =!= col("n_rows_b") ||
        col("sum_a") =!= col("sum_b") || col("xor_a") =!= col("xor_b"))
      .select(col("bucket"), coalesce(col("n_rows_a"), lit(0L))
        .as("n_rows_a"), coalesce(col("n_rows_b"), lit(0L))
        .as("n_rows_b"))
    // row-level drill-down restricted to the differing buckets
    val dbs = broadcast(differing.select(col("bucket")))
    val ra = pa.join(dbs, Seq("bucket"))
    val rb = pb.join(dbs, Seq("bucket"))
    val byKey = ra.select(col("bucket"), col("__key"),
        col("__vh").as("__va"))
      .join(rb.select(col("bucket"), col("__key"),
        col("__vh").as("__vb")), Seq("bucket", "__key"), "full_outer")
    val drill = byKey.groupBy(col("bucket"))
      .agg(
        sum(when(col("__va").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__vb").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__va").isNotNull && col("__vb").isNotNull &&
          col("__va") =!= col("__vb"), 1L).otherwise(0L))
          .as("n_changed"))
    differing.join(drill, Seq("bucket"))
      .select(col("bucket"), col("n_rows_a"), col("n_rows_b"),
        col("n_added"), col("n_removed"), col("n_changed"))
  }
}
