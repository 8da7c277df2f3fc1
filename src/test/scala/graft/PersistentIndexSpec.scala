package graft

import graft.operators.{IncrementalDedup, IncrementalPerceptualDedup,
  IncrementalSemanticDedup, PersistentIndex}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The shared persistent-index layer (r9 VERDICT items 2+3 and the
  * ADVICE restart finding): heal-before-read, tag-column retry
  * idempotence that survives compaction, legacy (pre-tag, flat-layout)
  * index migration, and partition-pruned probes. */
class PersistentIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  private def fsFor(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("probe heals the overwriteAtomic crash window: an index " +
      "stranded at <path>__old is restored before reading, so the " +
      "probe never sees an empty index") {
    val idx = tmp("graft_pidx_heal")
    val b0 = Seq((1L, 0x1234L)).toDF("doc_id", "h")
    IncrementalPerceptualDedup.acceptBatch(b0, "doc_id", "h", idx,
      "day0", maxHamming = 2).collect()
    // simulate a crash between rename(target, __old) and
    // rename(staging, target): the table exists ONLY at __old
    val fs = fsFor(idx)
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__old")) shouldBe true
    fs.exists(new org.apache.hadoop.fs.Path(idx)) shouldBe false
    // an un-healed probe would silently flag nothing; the healed one
    // finds the day-0 near-dup
    val got = IncrementalPerceptualDedup.acceptBatch(
        Seq((2L, 0x1235L)).toDF("doc_id", "h"), "doc_id", "h", idx,
        "day1", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe Seq((2L, 1L))
    // compaction heals the same window (same entry point)
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__old")) shouldBe true
    val (before, after) = IncrementalPerceptualDedup.compactIndex(spark, idx)
    before should be > 0
    after should be > 0
  }

  test("legacy pre-tag flat index: rows without a tag column are " +
      "backfilled from the <tag>-part-* filename on read AND durably " +
      "by compaction") {
    val idx = tmp("graft_pidx_legacy")
    // hand-author the OLD layout: flat root files named `tag-part-*`
    // with the pre-tag schema (fp only)
    val fs = fsFor(idx)
    def writeLegacy(tag: String, fps: Seq[String]): Unit = {
      val stage = idx + s"__mk_$tag"
      fps.toDF(IncrementalDedup.FpCol).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(stage)
      fs.mkdirs(new org.apache.hadoop.fs.Path(idx))
      fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .filter(_.getPath.getName.startsWith("part-"))
        .foreach { f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(idx,
            s"$tag-${f.getPath.getName}"))
        }
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    }
    writeLegacy("day0", Seq("aaaa", "bbbb"))
    writeLegacy("day1", Seq("cccc"))
    val ddl = s"${IncrementalDedup.FpCol} STRING, tag STRING"
    // tag exclusion works on the legacy files via filename backfill
    PersistentIndex.readExcluding(spark, idx, "day0", ddl)
      .select(IncrementalDedup.FpCol).as[String].collect().toSeq shouldBe
      Seq("cccc")
    // compaction migrates: partitioned layout, tag column durable
    val (before, after) = IncrementalDedup.compactIndex(spark, idx)
    before shouldBe 2
    fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .exists(_.getPath.getName.startsWith(
        s"${PersistentIndex.PfxCol}=")) shouldBe true
    val migrated = spark.read.parquet(idx)
    migrated.columns should contain("tag")
    migrated.select(IncrementalDedup.FpCol, "tag").as[(String, String)]
      .collect().toSet shouldBe
      Set(("aaaa", "day0"), ("bbbb", "day0"), ("cccc", "day1"))
    // and tag exclusion still holds AFTER the rewrite renamed files
    PersistentIndex.readExcluding(spark, idx, "day0", ddl)
      .select(IncrementalDedup.FpCol).as[String].collect().toSeq shouldBe
      Seq("cccc")
  }

  test("partition-pruned probe reads only the batch's pfx " +
      "partitions: file count drops vs the unpruned listing") {
    val idx = tmp("graft_pidx_prune")
    // a wide batch spreads over many partitions
    val wide = (1L to 400L).map(i => (i, s"document number $i"))
      .toDF("id", "text")
    IncrementalDedup.acceptBatch(wide, "id", "text", idx, "day0")
      .count() shouldBe 400L
    val allFiles = PersistentIndex.dataFilesFor(spark, idx,
      Some("day1"), None)
    // a single-doc batch touches exactly one partition
    val one = Seq((900L, "a brand new document")).toDF("id", "text")
    val fp = graft.functions.TextAnalysis.fingerprint(col("text"))
    val pfx = one.select(PersistentIndex.pfxOf(fp).as("p"))
      .head().getInt(0)
    val pruned = PersistentIndex.dataFilesFor(spark, idx,
      Some("day1"), Some(Set(pfx)))
    pruned.size should be < allFiles.size
    pruned.foreach(_ should include(s"${PersistentIndex.PfxCol}=$pfx"))
    // pruning never drops a true hit: re-deliver doc 17's text
    IncrementalDedup.acceptBatch(
      Seq((901L, "document number 17")).toDF("id", "text"),
      "id", "text", idx, "day1").count() shouldBe 0L
  }

  test("semantic index: flags and retry idempotence are invariant " +
      "across TWO compactions interleaved with batches") {
    val A = Seq(127.0, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0, 0.0)
    val B = Seq(127.0, 0.0, 0.0, 0.0, 70.0, 70.0, 0.0, 0.0)
    val C = Seq(127.0, 0.0, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0)
    def run(withCompaction: Boolean): Seq[(Long, Boolean, Long)] = {
      val idx = tmp("graft_pidx_sem")
      Seq(Seq((1L, A)), Seq((2L, B)), Seq((3L, C))).zipWithIndex
        .flatMap { case (rows, b) =>
          if (withCompaction && b > 0)
            IncrementalSemanticDedup.compactIndex(spark, idx)
          val out = IncrementalSemanticDedup.acceptBatch(
            rows.toDF("doc_id", "e"), "doc_id", "e", idx, s"day$b",
            20000L)
          // retry the same tag AFTER compaction rewrote earlier
          // batches' files: same verdicts (tag column, not filenames)
          val retry = IncrementalSemanticDedup.acceptBatch(
            rows.toDF("doc_id", "e"), "doc_id", "e", idx, s"day$b",
            20000L)
          retry.collect().map(r =>
            (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
        }
    }
    val plain = run(withCompaction = false)
    val compacted = run(withCompaction = true)
    compacted shouldBe plain
    compacted shouldBe Seq((1L, false, 0L), (2L, true, 1L),
      (3L, true, 1L))
  }

  test("semantic n_earlier stays exact when a tag retries AFTER " +
      "compaction absorbed its rows (double-stored until the next " +
      "compaction, deduped at probe time)") {
    val idx = tmp("graft_pidx_dup")
    val A = Seq(127.0, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0, 0.0)
    def accept(id: Long, tag: String) = IncrementalSemanticDedup
      .acceptBatch(Seq((id, A)).toDF("doc_id", "e"), "doc_id", "e",
        idx, tag, 20000L)
    accept(1L, "day0").collect()
    IncrementalSemanticDedup.compactIndex(spark, idx)
    // retry of day0 AFTER compaction: its files lost the tag-name
    // prefix, so the staged cleanup cannot remove them — the rows are
    // now stored twice (the documented window until next compaction)
    accept(1L, "day0").collect()
    spark.read.parquet(idx).count() shouldBe 2L
    // ...but a later probe must count doc 1 ONCE, not twice
    val probe = accept(9L, "day1").collect()
    probe.map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .toSeq shouldBe Seq((9L, true, 1L))
    // and the next compaction dedups the storage too
    IncrementalSemanticDedup.compactIndex(spark, idx)
    spark.read.parquet(idx)
      .filter(col("tag") === "day0").count() shouldBe 1L
  }

  test("randomized lifecycle fuzz: any interleaving of batches, " +
      "same-tag retries, and compactions matches the driver-side " +
      "model of the exact-dedup contract") {
    // the fixed-scenario specs pin known-dangerous orders; this pins
    // ARBITRARY ones — 3 seeded runs of 14 random steps each against
    // a model where novelty is just 'fingerprint text unseen in any
    // PRIOR batch' (retries replay their original batch and must
    // reproduce its survivor set; compactions must be invisible)
    val texts = (0 until 12).map(i => s"fuzz document number $i")
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new scala.util.Random(seed)
      val idx = tmp(s"graft_pidx_fuzz$seed")
      val seen = scala.collection.mutable.Set.empty[String] // model
      val batches = scala.collection.mutable.ArrayBuffer
        .empty[(String, Seq[(Long, String)], Set[Long])] // tag, rows, kept
      var nextId = 0L
      (0 until 14).foreach { step =>
        rnd.nextInt(4) match {
          case 0 | 1 => // new batch of 1..4 docs (possibly seen texts)
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              nextId += 1
              (nextId, texts(rnd.nextInt(texts.size)))
            }
            val tag = s"b$step"
            val got = IncrementalDedup.acceptBatch(
                rows.toDF("id", "text"), "id", "text", idx, tag)
              .select("id").as[Long].collect().toSet
            // model: min-id keeper per within-batch text, then unseen
            val expected = rows.groupBy(_._2).map(_._2.minBy(_._1))
              .filterNot(r => seen(r._2)).map(_._1).toSet
            withClue(s"seed $seed step $step new batch: ") {
              got shouldBe expected
            }
            rows.foreach(r => seen += r._2)
            batches += ((tag, rows, expected))
          case 2 if batches.nonEmpty => // retry a random earlier tag
            val (tag, rows, kept) = batches(rnd.nextInt(batches.size))
            val got = IncrementalDedup.acceptBatch(
                rows.toDF("id", "text"), "id", "text", idx, tag)
              .select("id").as[Long].collect().toSet
            withClue(s"seed $seed step $step retry $tag: ") {
              got shouldBe kept
            }
          case _ => // compaction
            IncrementalDedup.compactIndex(spark, idx)
        }
      }
      // terminal storage check: one row per accepted fingerprint
      IncrementalDedup.compactIndex(spark, idx)
      spark.read.parquet(idx).select(IncrementalDedup.FpCol)
        .distinct().count() shouldBe seen.size.toLong
    }
  }

  test("single-writer contract: an append that publishes between " +
      "compaction's read and swap fails the compaction LOUDLY and " +
      "loses no rows (r10 VERDICT 'what's wrong' #2)") {
    val idx = tmp("graft_pidx_race")
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"),
      "id", "text", idx, "b1").count() shouldBe 2L
    val ddl = s"${IncrementalDedup.FpCol} STRING, tag STRING"
    // the interloper publishes while the compactor holds its file list
    val e = intercept[IllegalStateException] {
      PersistentIndex.compact(spark, idx, ddl,
        _(IncrementalDedup.FpCol),
        onBeforeSwap = () =>
          IncrementalDedup.acceptBatch(
            Seq((3L, "gamma")).toDF("id", "text"),
            "id", "text", idx, "b2").count())
    }
    e.getMessage should include("single-writer")
    // nothing was lost: both the compactor's input AND the
    // interloper's rows are still probe-visible
    PersistentIndex.readExcluding(spark, idx, "none", ddl)
      .select("tag").distinct().as[String].collect().toSet shouldBe
      Set("b1", "b2")
    // a clean retry of the compaction now succeeds
    IncrementalDedup.compactIndex(spark, idx)
    spark.read.parquet(idx)
      .select(IncrementalDedup.FpCol).distinct().count() shouldBe 3L
    // the OTHER direction (review finding r11): a concurrent TAKEDOWN
    // between the read and the swap must also fail the compaction —
    // its rewrite was built from the pre-delete read and swapping it
    // in would silently RESURRECT the taken-down rows
    IncrementalDedup.acceptBatch(
      Seq((4L, "delta")).toDF("id", "text"),
      "id", "text", idx, "b3").count() shouldBe 1L
    val e2 = intercept[IllegalStateException] {
      PersistentIndex.compact(spark, idx, ddl,
        _(IncrementalDedup.FpCol),
        onBeforeSwap = () =>
          IncrementalDedup.deleteBatch(spark, idx, "b3"))
    }
    e2.getMessage should include("single-writer")
    // the takedown STUCK — b3 was not resurrected by the aborted swap
    PersistentIndex.readExcluding(spark, idx, "none", ddl)
      .select("tag").distinct().as[String].collect().toSet shouldBe
      Set("b1", "b2")
  }

  test("tag prefix collision closed (ADVICE r10): a retry of tag " +
      "'day1' neither deletes nor hides tag 'day1-retry' rows") {
    val idx = tmp("graft_pidx_tagpfx")
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha text")).toDF("id", "text"),
      "id", "text", idx, "day1").count() shouldBe 1L
    IncrementalDedup.acceptBatch(
      Seq((2L, "beta text")).toDF("id", "text"),
      "id", "text", idx, "day1-retry").count() shouldBe 1L
    // retry of the SHORTER tag: before the fix its '<tag>-' cleanup
    // prefix also matched 'day1-retry-part-*' files (deleting them)
    // and its read-skip hid them from the probe
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha text")).toDF("id", "text"),
      "id", "text", idx, "day1").count() shouldBe 1L
    // day1-retry's row survived the retry...
    val ddl = s"${IncrementalDedup.FpCol} STRING, tag STRING"
    PersistentIndex.readExcluding(spark, idx, "day1", ddl)
      .select("tag").as[String].collect().toSeq shouldBe Seq("day1-retry")
    // ...and still rejects its duplicate
    IncrementalDedup.acceptBatch(
      Seq((9L, "beta text")).toDF("id", "text"),
      "id", "text", idx, "day2").count() shouldBe 0L
  }

  test("tags containing '-part' or '/' (or empty) are rejected by " +
      "BOTH staged writers: the filename encoding must stay invertible " +
      "— including the SUFFIX case (ADVICE r11): tag 'x-part' would " +
      "publish 'x-part-part-N' files that tag 'x''s cleanup filter " +
      "startsWith(\"x-part-\") deletes and its read-skip hides") {
    val df = Seq(("aaaa", "t", 0)).toDF(IncrementalDedup.FpCol, "tag",
      PersistentIndex.PfxCol)
    for (bad <- Seq("x-part-y", "x-part", "a/b", "")) {
      intercept[IllegalArgumentException] {
        PersistentIndex.appendStaged(df, tmp("graft_pidx_badtag"), bad)
      }.getMessage should include("batch tag")
      intercept[IllegalArgumentException] {
        graft.operators.ParquetTable.appendStaged(df,
          tmp("graft_pidx_badtag2"), bad)
      }.getMessage should include("batch tag")
    }
  }

  test("Maintenance.compact refuses a pfx-partitioned index layout " +
      "by name instead of flattening it (r10 VERDICT 'what's wrong' #1)") {
    val idx = tmp("graft_pidx_maint")
    IncrementalDedup.acceptBatch(
      (1L to 100L).map(i => (i, s"doc $i")).toDF("id", "text"),
      "id", "text", idx, "b1").count() shouldBe 100L
    val before = PersistentIndex.dataFilesFor(spark, idx, None, None)
    before.exists(_.contains(s"${PersistentIndex.PfxCol}=")) shouldBe true
    val e = intercept[IllegalArgumentException] {
      graft.operators.Maintenance.compact(spark, idx)
    }
    e.getMessage should include("PersistentIndex.compact")
    // the pruned layout survived the attempt untouched
    PersistentIndex.dataFilesFor(spark, idx, None, None) shouldBe before
    // and a plain (non-index) directory still compacts as before
    val plain = tmp("graft_pidx_plain")
    (1 to 50).toDF("v").repartition(8).write.parquet(plain)
    val res = graft.operators.Maintenance.compact(spark, plain)
    res.filesAfter should be < res.filesBefore
  }

  test("auto-compaction cadence: compactIfAccreted fires mid-sequence " +
      "once the file count crosses the threshold, with verdicts " +
      "invariant (the q397/q402 invariance, now automatic)") {
    def lifecycle(auto: Boolean): (Seq[Set[Long]], Boolean) = {
      val idx = tmp("graft_pidx_auto")
      val ddl = s"${IncrementalDedup.FpCol} STRING, tag STRING"
      var fired = false
      val verdicts = (0 until 3).map { b =>
        // wide batches spread over many partitions: each accretes up
        // to one file per partition, so 2 batches cross factor-1 × 64
        val rows = (1L to 150L)
          .map(i => (b * 1000L + i, s"doc ${(b * 75) + i}"))
        val got = IncrementalDedup.acceptBatch(rows.toDF("id", "text"),
          "id", "text", idx, s"b$b").select("id").as[Long].collect().toSet
        if (auto)
          fired |= PersistentIndex.compactIfAccreted(spark, idx, ddl,
            _(IncrementalDedup.FpCol), maxFileFactor = 1).nonEmpty
        got
      }
      (verdicts, fired)
    }
    val (plain, firedPlain) = lifecycle(auto = false)
    val (auto, firedAuto) = lifecycle(auto = true)
    firedPlain shouldBe false
    firedAuto shouldBe true // the threshold DID trigger mid-sequence
    auto shouldBe plain // ...and changed no verdict
    // overlapping doc ranges: batch b repeats 75 of b-1's texts
    plain.map(_.size) shouldBe Seq(150, 75, 75)
  }

  test("compactIfAccreted heals the crash window BEFORE counting " +
      "(ADVICE r11): an index stranded at <path>__old must not read " +
      "as 0 files and silently skip a due compaction") {
    val idx = tmp("graft_pidx_autoheal")
    val ddl = s"${IncrementalDedup.FpCol} STRING, tag STRING"
    IncrementalDedup.acceptBatch(
      (1L to 150L).map(i => (i, s"doc $i")).toDF("id", "text"),
      "id", "text", idx, "b0").count() shouldBe 150L
    IncrementalDedup.acceptBatch(
      (201L to 350L).map(i => (i, s"doc $i")).toDF("id", "text"),
      "id", "text", idx, "b1").count() shouldBe 150L
    PersistentIndex.dataFileCount(spark, idx) should be > 64
    // crash window: the table exists ONLY at __old
    val fs = fsFor(idx)
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__old")) shouldBe true
    // un-healed counting would see 0 <= threshold and skip; the fixed
    // cadence heals first, counts the real accretion, and compacts
    val fired = PersistentIndex.compactIfAccreted(spark, idx, ddl,
      _(IncrementalDedup.FpCol), maxFileFactor = 1)
    fired should not be empty
    fired.get._2 should be < fired.get._1
  }

  test("contract #6 marker: stamped on first append, re-committed by " +
      "compaction and the takedown rewrite, and Maintenance.compact " +
      "refuses a marker-carrying FLAT directory (the r11 VERDICT's " +
      "previously undetectable legacy case, once stamped)") {
    val idx = tmp("graft_pidx_marker")
    PersistentIndex.isMarkedIndex(spark, idx) shouldBe false
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"),
      "id", "text", idx, "day0").count() shouldBe 2L
    PersistentIndex.isMarkedIndex(spark, idx) shouldBe true
    // the marker rides every directory swap atomically (extraFiles)
    IncrementalDedup.compactIndex(spark, idx)
    PersistentIndex.isMarkedIndex(spark, idx) shouldBe true
    IncrementalDedup.acceptBatch(
      Seq((3L, "gamma")).toDF("id", "text"),
      "id", "text", idx, "day1").count() shouldBe 1L
    // slow takedown arm (day0 was folded into shared files) = swap
    IncrementalDedup.deleteBatch(spark, idx, "day0") shouldBe 2L
    PersistentIndex.isMarkedIndex(spark, idx) shouldBe true
    // a marker-carrying FLAT dir (no pfx= layout to detect) is still
    // refused by name
    val flat = tmp("graft_pidx_markerflat")
    Seq(("aaaa", "t")).toDF("fp", "tag").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(flat)
    val fs = fsFor(flat)
    fs.create(new org.apache.hadoop.fs.Path(flat,
      PersistentIndex.MarkerFile), true).close()
    intercept[IllegalArgumentException] {
      graft.operators.Maintenance.compact(spark, flat)
    }.getMessage should include(PersistentIndex.MarkerFile)
    // ...while an unmarked plain table still compacts (guard is
    // marker-scoped, not a blanket refusal)
    val plain = tmp("graft_pidx_markerplain")
    (1 to 50).toDF("v").repartition(8).write.parquet(plain)
    graft.operators.Maintenance.compact(spark, plain)
      .filesAfter should be < 8
  }

  test("fast takedown arm reader visibility (contract #5 scoping, " +
      "r11 VERDICT #3): mid-arm the index is whole and readable with " +
      "a strict SUBSET of the tag's rows lingering — never corrupt, " +
      "never anything but an earlier serialization point") {
    val idx = tmp("graft_pidx_midarm")
    val ddl = s"${IncrementalDedup.FpCol} STRING, tag STRING"
    // wide batch -> many own published files across pfx partitions
    IncrementalDedup.acceptBatch(
      (1L to 150L).map(i => (i, s"doc $i")).toDF("id", "text"),
      "id", "text", idx, "day0").count() shouldBe 150L
    IncrementalDedup.acceptBatch(
      Seq((500L, "survivor text")).toDF("id", "text"),
      "id", "text", idx, "day1").count() shouldBe 1L
    var midDay0 = -1L
    var midDay1 = -1L
    val removed = PersistentIndex.deleteTag(spark, idx, ddl,
      _(IncrementalDedup.FpCol), "day0", onMidFastArm = () => {
        val all = PersistentIndex.readExcluding(spark, idx,
          "__no_such_tag__", ddl).persist()
        midDay0 = all.filter(col("tag") === "day0").count()
        midDay1 = all.filter(col("tag") === "day1").count()
        all.unpersist()
      })
    removed shouldBe 150L
    // mid-arm: strictly fewer day0 rows than before, strictly more
    // than after — per-FILE atomicity, per-OPERATION in flight
    midDay0 should be > 0L
    midDay0 should be < 150L
    // the untouched tag is never disturbed by the fast arm
    midDay1 shouldBe 1L
    // completed arm: no memory of day0, day1 intact
    val after = PersistentIndex.readExcluding(spark, idx,
      "__no_such_tag__", ddl).persist()
    after.filter(col("tag") === "day0").count() shouldBe 0L
    after.filter(col("tag") === "day1").count() shouldBe 1L
    after.unpersist()
  }

  test("takedown (deleteTag): fast own-file arm before compaction, " +
      "slow rewrite arm after, idempotent, layout preserved, and the " +
      "index keeps NO memory of the deleted tag") {
    val idx = tmp("graft_pidx_takedown")
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"),
      "id", "text", idx, "day0").count() shouldBe 2L
    IncrementalDedup.acceptBatch(
      Seq((3L, "gamma")).toDF("id", "text"),
      "id", "text", idx, "day1").count() shouldBe 1L
    // FAST arm: no compaction yet, day0 lives entirely in its own
    // published files — removed without touching day1
    IncrementalDedup.deleteBatch(spark, idx, "day0") shouldBe 2L
    spark.read.parquet(idx).select("tag").distinct()
      .as[String].collect().toSeq shouldBe Seq("day1")
    // the removed texts are re-accepted; day1's is still rejected
    IncrementalDedup.acceptBatch(
        Seq((10L, "alpha"), (11L, "gamma")).toDF("id", "text"),
        "id", "text", idx, "day2")
      .select("id").as[Long].collect().toSeq shouldBe Seq(10L)
    // SLOW arm: compaction folds day1+day2 into shared files, so the
    // takedown must rewrite — and must preserve the pfx layout
    IncrementalDedup.compactIndex(spark, idx)
    IncrementalDedup.deleteBatch(spark, idx, "day2") shouldBe 1L
    val fs = fsFor(idx)
    fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .exists(_.getPath.getName.startsWith(
        s"${PersistentIndex.PfxCol}=")) shouldBe true
    spark.read.parquet(idx).select("tag").distinct()
      .as[String].collect().toSeq shouldBe Seq("day1")
    // idempotent: nothing left of day2; unknown tags remove nothing
    IncrementalDedup.deleteBatch(spark, idx, "day2") shouldBe 0L
    IncrementalDedup.deleteBatch(spark, idx, "never") shouldBe 0L
    // empty/missing index is a no-op
    IncrementalDedup.deleteBatch(spark, tmp("graft_pidx_takedown2"),
      "day0") shouldBe 0L
    // malformed tags rejected like the writers' — incl. the '-part'
    // suffix case
    for (bad <- Seq("a-part-b", "a-part")) {
      intercept[IllegalArgumentException] {
        IncrementalDedup.deleteBatch(spark, idx, bad)
      }.getMessage should include("batch tag")
    }
  }

  test("takedown reaches the semantic and perceptual indexes too: " +
      "deleted batches stop flagging, surviving batches still flag") {
    // semantic: A ~ B (dot above threshold); delete A's batch and a
    // re-probe of B's twin is novel again
    val A = Seq(127.0, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0, 0.0)
    val semIdx = tmp("graft_pidx_semdel")
    IncrementalSemanticDedup.acceptBatch(
      Seq((1L, A)).toDF("doc_id", "e"), "doc_id", "e", semIdx,
      "day0", 20000L).collect()
    IncrementalSemanticDedup.deleteBatch(spark, semIdx, "day0") shouldBe 1L
    val sem = IncrementalSemanticDedup.acceptBatch(
        Seq((2L, A)).toDF("doc_id", "e"), "doc_id", "e", semIdx,
        "day1", 20000L)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    sem shouldBe Seq((2L, false)) // nothing earlier left to flag
    // perceptual: near-identical hash; after takedown the copy stops
    // flagging (acceptBatch returns FLAGGED rows only)
    val pIdx = tmp("graft_pidx_pdel")
    IncrementalPerceptualDedup.acceptBatch(
      Seq((1L, 0x1234L)).toDF("doc_id", "h"), "doc_id", "h", pIdx,
      "day0", maxHamming = 2).collect()
    // each doc writes 4 band rows
    IncrementalPerceptualDedup.deleteBatch(spark, pIdx, "day0") shouldBe 4L
    IncrementalPerceptualDedup.acceptBatch(
      Seq((2L, 0x1235L)).toDF("doc_id", "h"), "doc_id", "h", pIdx,
      "day1", maxHamming = 2).collect() shouldBe empty
    // control: the SURVIVING day1 entry still flags a later copy —
    // the takedown removed day0 and nothing else
    IncrementalPerceptualDedup.acceptBatch(
        Seq((3L, 0x1235L)).toDF("doc_id", "h"), "doc_id", "h", pIdx,
        "day2", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq shouldBe
      Seq((3L, 2L)) // min_earlier_id = 2, not the deleted 1
  }

  test("exact index: compaction between batches preserves novelty " +
      "verdicts and storage row count") {
    val idx = tmp("graft_pidx_exact")
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"),
      "id", "text", idx, "b1").count() shouldBe 2L
    IncrementalDedup.compactIndex(spark, idx)
    // post-compaction: dup of batch-1 text still rejected; novel kept
    IncrementalDedup.acceptBatch(
        Seq((10L, "beta"), (11L, "gamma")).toDF("id", "text"),
        "id", "text", idx, "b2")
      .select("id").as[Long].collect().toSeq shouldBe Seq(11L)
    // retry the OLD tag after compaction: idempotent (tag column)
    IncrementalDedup.acceptBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text"),
      "id", "text", idx, "b1").count() shouldBe 2L
    IncrementalDedup.compactIndex(spark, idx)
    spark.read.parquet(idx)
      .select(IncrementalDedup.FpCol).distinct().count() shouldBe 3L
  }
}
