package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet table with time travel — the snapshot-isolation
  * layer table formats (Delta/Iceberg) build with manifest files,
  * realized here with the same directory-rename commit point as
  * `ParquetTable.overwriteAtomic` (reference analogue: the PostgreSQL
  * transaction the reference delegates every write to —
  * /root/reference/etl/etl.py:222-233 — generalized to named
  * snapshots instead of one mutable table).
  *
  * Layout: `<root>/v=N/` one immutable snapshot per commit. A version
  * is LIVE iff its directory contains the `_SUCCESS` marker Spark
  * writes on job completion; commits stage to a writer-unique,
  * underscore-hidden `_staging_<token>` dir and rename, so a version directory
  * appears atomically, concurrent committers never touch each other's
  * staging data, and a crash mid-write leaves only an invisible
  * staging dir (age-swept by vacuum).
  * No mutable "latest" pointer exists to corrupt: the current version
  * is max(live N), a pure read-side rule, so readers and writers never
  * race on a marker file. (On object stores without atomic rename the
  * commit point must move into a manifest write — same protocol, same
  * read rule, documented trade as ParquetTable.)
  *
  * Readers pin a snapshot by number and are immune to later commits —
  * time travel, reproducible training-data snapshots, and safe
  * concurrent readers during compaction all fall out of immutability.
  *
  * Scale: a commit writes only its own snapshot (full or derived);
  * version listing is one directory scan (O(versions), not O(files) —
  * each version adds one dir); vacuum deletes whole version dirs.
  */
object VersionedTable {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Live version numbers, ascending (dirs with a _SUCCESS marker). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val r = new Path(root)
    if (!f.exists(r)) Seq.empty
    else f.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .sorted
  }

  /** Commit `df` as the next snapshot; returns its version number.
    * Stage-then-rename: the snapshot becomes visible atomically, and
    * only with its _SUCCESS marker (a crashed write never surfaces).
    * Each committer stages under its own unique suffix, so concurrent
    * commits never touch each other's staging data.
    *
    * Lost-race handling, layered (Hadoop's FileSystem.rename does NOT
    * fail on an existing destination — it moves the source INSIDE it,
    * on local FS via a full copy fallback):
    *  1. the committer only attempts the rename when the target does
    *     not exist yet, so the common lost race (rival's v=N already
    *     visible) just retries at the next number with zero I/O;
    *  2. the check-to-rename window is TOKEN-verified: the staging
    *     dir carries a writer-unique `_graft_commit_<token>` marker;
    *     if after a "successful" rename the marker is not at the
    *     published root, the dir was nested inside a rival's v=N —
    *     pull it back out and retry;
    *  3. the staging dir itself is UNDERSCORE-prefixed, so even while
    *     (or if a crash leaves it) nested inside a live snapshot,
    *     Spark's hidden-file filter keeps it invisible to readers,
    *     and vacuum sweeps such debris by age. */
  def commit(df: DataFrame, root: String): Int = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    val token = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s"_staging_$token")
    val marker = s"_graft_commit_$token"
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    f.create(new Path(stage, marker), true).close()
    var attempt = versions(spark, root).lastOption.getOrElse(-1) + 1
    while (true) {
      val target = new Path(root, s"v=$attempt")
      if (!f.exists(target) && publishAttempt(f, stage, target, marker))
        return attempt
      attempt += 1
    }
    -1 // unreachable
  }

  /** One publish attempt: rename staging to `target` and verify by
    * token that it landed AT target (not nested inside a rival's
    * already-published dir — see the commit scaladoc). Returns true
    * on a verified publish; false after un-nesting a lost race (the
    * staging dir is back in place for a retry). Package-visible so
    * the race backstop is directly testable — the exists-precheck in
    * `commit` makes it unreachable from the public API except inside
    * the check-to-rename window. */
  private[graft] def publishAttempt(f: org.apache.hadoop.fs.FileSystem,
      stage: Path, target: Path, marker: String): Boolean = {
    if (f.rename(stage, target)) {
      if (f.exists(new Path(target, marker))) return true
      val nested = new Path(target, stage.getName)
      if (!f.rename(nested, stage))
        throw new java.io.IOException(
          s"commit un-nest failed for $target ($nested)")
      false
    } else if (!f.exists(target)) {
      throw new java.io.IOException(
        s"commit rename failed for $target (staging: $stage)")
    } else false // rival visible and rename refused: plain lost race
  }

  /** Read a pinned snapshot (time travel), or the latest when
    * `version` is None. Throws on an empty table or a missing/dead
    * version — reading a never-committed snapshot is a caller bug,
    * not an empty frame. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val live = versions(spark, root)
    require(live.nonEmpty, s"no committed versions under $root")
    val v = version.getOrElse(live.last)
    require(live.contains(v),
      s"version $v not live under $root (live: ${live.mkString(",")})")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop all but the newest `keepLast` snapshots and sweep staging
    * corpses. Returns the dropped version numbers. Readers pinned to
    * a dropped version fail fast on next read — retention is the
    * caller's contract, exactly as in Delta VACUUM.
    *
    * A staging dir is only a corpse if its writer is gone — but a dir
    * being WRITTEN now looks identical, so the sweep keeps anything
    * whose NEWEST file (recursive — a long write mutates nested
    * _temporary task dirs without bumping the top dir's mtime) is
    * within `stagingOlderThanMs` (default 24 h, the Delta VACUUM
    * retention stance: never delete what a live writer might still
    * own). */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
      stagingOlderThanMs: Long = 24L * 3600 * 1000): Seq[Int] = {
    require(keepLast >= 1, s"keepLast ($keepLast) must be >= 1")
    val f = fs(spark, root)
    val live = versions(spark, root)
    val drop = live.dropRight(keepLast)
    drop.foreach(v => f.delete(new Path(root, s"v=$v"), true))
    val cutoff = System.currentTimeMillis() - stagingOlderThanMs
    // recurse on the FileStatus rows listStatus already fetched (one
    // metadata RPC per entry, not two); a file vanishing mid-walk
    // PROVES a live writer — treat the dir as modified-now, keep it
    def newestMtime(s: org.apache.hadoop.fs.FileStatus): Long = {
      var newest = s.getModificationTime
      if (s.isDirectory) {
        try {
          val it = f.listStatus(s.getPath).iterator
          while (it.hasNext) {
            val m = newestMtime(it.next())
            if (m > newest) newest = m
          }
        } catch {
          case _: java.io.FileNotFoundException => return Long.MaxValue
        }
      }
      newest
    }
    // current naming plus the pre-token `v__staging_` format, so
    // debris in roots written by older builds still gets swept
    def isStaging(name: String): Boolean =
      name.startsWith("_staging_") || name.startsWith("v__staging")
    def sweep(dir: Path): Unit =
      if (f.exists(dir))
        f.listStatus(dir).toSeq
          .filter(s => isStaging(s.getPath.getName))
          .filter(s => newestMtime(s) < cutoff)
          .foreach(s => f.delete(s.getPath, true))
    sweep(new Path(root))
    // a crashed loser of the publish race can leave (hidden) staging
    // debris NESTED inside a live snapshot — sweep those too; the
    // survivors are exactly live minus drop (no re-listing needed)
    live.takeRight(keepLast)
      .foreach(v => sweep(new Path(root, s"v=$v")))
    drop
  }
}
