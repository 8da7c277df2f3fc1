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
  * race on a marker file. On object stores without atomic rename the
  * commit point moves into a manifest write — same protocol, same
  * read rule — implemented by [[VersionedTable.Manifest]]; the rename
  * form stays the default for rename-capable filesystems (HDFS,
  * local) where it needs one less metadata round trip.
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

  /** Snapshot commit protocol, abstracted so the same version-history
    * semantics run on rename-capable filesystems AND rename-less
    * object stores. Both backends guarantee: contiguous version
    * numbers with a unique winner each, snapshots visible atomically
    * and only when complete, latest = max(live), pinned readers immune
    * to later commits, vacuum drops whole snapshots plus aged debris. */
  sealed trait Backend {
    def versions(spark: SparkSession, root: String): Seq[Int]
    def commit(df: DataFrame, root: String): Int
    def read(spark: SparkSession, root: String,
        version: Option[Int] = None): DataFrame
    def vacuum(spark: SparkSession, root: String, keepLast: Int,
        stagingOlderThanMs: Long = 24L * 3600 * 1000): Seq[Int]
  }

  /** Directory-rename commit point (HDFS/local): the object's default
    * methods. */
  case object Rename extends Backend {
    def versions(spark: SparkSession, root: String): Seq[Int] =
      VersionedTable.versions(spark, root)
    def commit(df: DataFrame, root: String): Int =
      VersionedTable.commit(df, root)
    def read(spark: SparkSession, root: String,
        version: Option[Int] = None): DataFrame =
      VersionedTable.read(spark, root, version)
    def vacuum(spark: SparkSession, root: String, keepLast: Int,
        stagingOlderThanMs: Long = 24L * 3600 * 1000): Seq[Int] =
      VersionedTable.vacuum(spark, root, keepLast, stagingOlderThanMs)
  }

  /** Manifest-file commit point for S3-class object stores, where
    * directory rename is a non-atomic O(files) copy. Data files land
    * under an immutable writer-unique `data-<token>/` dir that is
    * NEVER moved; the commit point is the atomic creation of
    * `manifest-N.json` naming that dir. A version is live iff its
    * manifest exists — and the manifest only becomes visible with its
    * full content (see the exclusive-create primitive below), so
    * there is no claimed-but-unreadable window. Latest = max manifest
    * N; readers open the manifest, then scan exactly the dir it
    * names. A crashed writer leaves an orphan data dir that no
    * manifest references — invisible to every reader, age-swept by
    * vacuum, same stance as the rename backend's staging corpses.
    *
    * The exclusive create maps to the store's conditional write:
    * on HDFS `create(overwrite=false)` is an atomic namenode op; on
    * the local FS the payload is hard-linked into place (link(2) is
    * atomic and fails EEXIST), because LocalFileSystem's create(false)
    * is a non-atomic exists-then-create. IMPORTANT deployment caveat:
    * stock Hadoop S3A implements create(false) as HEAD-then-PUT —
    * check-then-act, NOT a conditional PUT — so on S3 the
    * `createExclusive` seam must be backed by the store's conditional
    * write (S3 `If-None-Match:*`, GCS `ifGenerationMatch=0`; S3
    * supports it natively since 2024-08 and recent S3A exposes it via
    * fs.s3a.create.conditional.enabled). With a conditional-create in
    * that seam, racing committers get unique contiguous numbers on
    * every substrate; without it, S3 keeps the rename backend's
    * caveat. SnapshotBackendSpec races the local hard-link path. */
  case object Manifest extends Backend {
    private val ManifestName = "manifest-(\\d+)\\.json".r

    def versions(spark: SparkSession, root: String): Seq[Int] = {
      val f = fs(spark, root)
      val r = new Path(root)
      if (!f.exists(r)) Seq.empty
      else f.listStatus(r).toSeq.flatMap(s => s.getPath.getName match {
        case ManifestName(n) if s.isFile => Some(n.toInt)
        case _ => None
      }).sorted
    }

    def commit(df: DataFrame, root: String): Int = {
      val spark = df.sparkSession
      val f = fs(spark, root)
      val r = new Path(root)
      f.mkdirs(r)
      val token = java.util.UUID.randomUUID().toString.take(8)
      val dataDir = s"data-$token"
      df.write.mode(SaveMode.Overwrite)
        .parquet(new Path(r, dataDir).toString)
      var attempt = versions(spark, root).lastOption.getOrElse(-1) + 1
      while (true) {
        val content =
          s"""{"version":$attempt,"dir":"$dataDir"}"""
        if (createExclusive(f, r, s"manifest-$attempt.json", content))
          return attempt
        attempt += 1
      }
      -1 // unreachable
    }

    /** Atomically create `root/name` with `content`, failing (false)
      * if it already exists. Visible ⟺ complete. */
    private[graft] def createExclusive(f: org.apache.hadoop.fs.FileSystem,
        root: Path, name: String, content: String): Boolean = {
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (f.getUri.getScheme == "file") {
        // local FS: create(overwrite=false) is exists-then-create (a
        // TOCTOU hole under racing committers) — hard-link a fully
        // written temp into place instead; link(2) is atomic+EEXIST
        val dir = java.nio.file.Paths.get(new Path(root.toUri.getPath)
          .toString)
        val tmp = dir.resolve(s"_mtmp_${java.util.UUID.randomUUID()
          .toString.take(8)}_$name")
        java.nio.file.Files.write(tmp, bytes)
        try {
          java.nio.file.Files.createLink(dir.resolve(name), tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally java.nio.file.Files.deleteIfExists(tmp)
      } else {
        // HDFS: atomic namenode create; object stores: the store's
        // conditional PUT (S3 If-None-Match:* / GCS generation 0)
        try {
          val out = f.create(new Path(root, name), false)
          try out.write(bytes) finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
      }
    }

    private def manifestDir(f: org.apache.hadoop.fs.FileSystem,
        root: Path, v: Int): String = {
      val p = new Path(root, s"manifest-$v.json")
      val in = f.open(p)
      val content = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
      "\"dir\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(content)
        .map(_.group(1))
        .getOrElse(throw new java.io.IOException(
          s"manifest-$v.json under $root has no dir field: $content"))
    }

    def read(spark: SparkSession, root: String,
        version: Option[Int] = None): DataFrame = {
      val live = versions(spark, root)
      require(live.nonEmpty, s"no committed versions under $root")
      val v = version.getOrElse(live.last)
      require(live.contains(v),
        s"version $v not live under $root (live: ${live.mkString(",")})")
      val f = fs(spark, root)
      spark.read.parquet(
        new Path(new Path(root), manifestDir(f, new Path(root), v)).toString)
    }

    def vacuum(spark: SparkSession, root: String, keepLast: Int,
        stagingOlderThanMs: Long = 24L * 3600 * 1000): Seq[Int] = {
      require(keepLast >= 1, s"keepLast ($keepLast) must be >= 1")
      val f = fs(spark, root)
      val r = new Path(root)
      val live = versions(spark, root)
      val drop = live.dropRight(keepLast)
      // manifest first (the version dies atomically), then its data
      drop.foreach { v =>
        val dir = manifestDir(f, r, v)
        f.delete(new Path(r, s"manifest-$v.json"), false)
        f.delete(new Path(r, dir), true)
      }
      // orphan data dirs (crashed writers — no manifest references
      // them) and manifest temp files, age-guarded exactly like the
      // rename backend's staging sweep
      val referenced = versions(spark, root)
        .map(v => manifestDir(f, r, v)).toSet
      val cutoff = System.currentTimeMillis() - stagingOlderThanMs
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
      if (f.exists(r)) f.listStatus(r).toSeq
        .filter { s =>
          val n = s.getPath.getName
          (n.startsWith("data-") && !referenced.contains(n)) ||
            n.startsWith("_mtmp_")
        }
        .filter(s => newestMtime(s) < cutoff)
        .foreach(s => f.delete(s.getPath, true))
      drop
    }
  }
}
