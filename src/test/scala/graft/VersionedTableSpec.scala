package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vt")
      .resolve("tbl").toString

  test("commit numbers versions sequentially; read pins snapshots") {
    val root = freshRoot()
    val v0 = VersionedTable.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    val v1 = VersionedTable.commit(Seq((1, "a2")).toDF("k", "v"), root)
    (v0, v1) shouldBe (0, 1)
    VersionedTable.versions(spark, root) shouldBe Seq(0, 1)
    // pinned reader sees the OLD snapshot unchanged after later commits
    VersionedTable.read(spark, root, Some(0)).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq shouldBe
      Seq((1, "a"), (2, "b"))
    // latest = max live version
    VersionedTable.read(spark, root).collect()
      .map(_.getString(1)).toSeq shouldBe Seq("a2")
  }

  test("a reader's frame is immune to commits made after it was pinned") {
    val root = freshRoot()
    VersionedTable.commit(Seq(1, 2, 3).toDF("x"), root)
    val pinned = VersionedTable.read(spark, root, Some(0))
    VersionedTable.commit(Seq(9).toDF("x"), root)
    pinned.agg(sum($"x")).head().getLong(0) shouldBe 6L
  }

  test("missing/dead versions fail fast; empty table fails fast") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root)
    }
    VersionedTable.commit(Seq(1).toDF("x"), root)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(7))
    }
  }

  test("crashed commit (staging dir, no _SUCCESS rename) is invisible") {
    val root = freshRoot()
    VersionedTable.commit(Seq(1).toDF("x"), root)
    // simulate a crash: a staging dir that never got renamed
    val stage = new java.io.File(root, "_staging_dead1234")
    stage.mkdirs()
    new java.io.File(stage, "part-00000.parquet").createNewFile()
    VersionedTable.versions(spark, root) shouldBe Seq(0)
    VersionedTable.read(spark, root).count() shouldBe 1L
    // a FRESH staging dir survives the default sweep (it could be a
    // live writer's)...
    VersionedTable.vacuum(spark, root, keepLast = 1) shouldBe Seq.empty
    stage.exists() shouldBe true
    // ...and is swept once older than the retention window (negative
    // threshold = everything is past the cutoff)
    VersionedTable.vacuum(spark, root, keepLast = 1,
      stagingOlderThanMs = -1000L)
    stage.exists() shouldBe false
  }

  test("a lost publish race skips the occupied number and leaves no " +
      "debris (Hadoop rename would otherwise move INTO an existing dir)") {
    val root = freshRoot()
    VersionedTable.commit(Seq(1).toDF("x"), root) // v=0
    // an adversary's NON-EMPTY v=1 exists but is not live (no
    // _SUCCESS yet): the committer computes attempt=1, the exists
    // pre-check skips it without ever renaming (the token check
    // remains as the backstop for the check-to-rename window, and
    // the underscore staging prefix keeps even a nested dir hidden)
    val rival = new java.io.File(root, "v=1")
    rival.mkdirs()
    new java.io.File(rival, "part-rival.parquet").createNewFile()
    val v = VersionedTable.commit(Seq(7).toDF("x"), root)
    v shouldBe 2
    VersionedTable.versions(spark, root) shouldBe Seq(0, 2)
    VersionedTable.read(spark, root, Some(2))
      .head().getInt(0) shouldBe 7
    // no staging debris inside the rival's dir
    new java.io.File(root, "v=1").listFiles()
      .filter(_.getName.contains("_staging")) shouldBe empty
  }

  test("publishAttempt backstop: a rename nested into a rival's dir is " +
      "token-detected, un-nested, and reported as a lost race") {
    val root = freshRoot()
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a finished staging dir with its marker
    val stage = new java.io.File(root, "_staging_tok42")
    stage.mkdirs()
    new java.io.File(stage, "part-0.parquet").createNewFile()
    new java.io.File(stage, "_graft_commit_tok42").createNewFile()
    // a NON-EMPTY rival target: Hadoop rename nests instead of failing
    val rival = new java.io.File(root, "v=5")
    rival.mkdirs()
    new java.io.File(rival, "part-rival.parquet").createNewFile()
    val won = graft.operators.VersionedTable.publishAttempt(f,
      new org.apache.hadoop.fs.Path(stage.getPath),
      new org.apache.hadoop.fs.Path(rival.getPath), "_graft_commit_tok42")
    won shouldBe false
    // staging dir restored intact for the retry; rival unpolluted
    new java.io.File(stage, "part-0.parquet").exists() shouldBe true
    new java.io.File(stage, "_graft_commit_tok42").exists() shouldBe true
    rival.listFiles().map(_.getName).toSet shouldBe Set("part-rival.parquet")
    // and against an absent target the same attempt wins
    val won2 = graft.operators.VersionedTable.publishAttempt(f,
      new org.apache.hadoop.fs.Path(stage.getPath),
      new org.apache.hadoop.fs.Path(root + "/v=6"), "_graft_commit_tok42")
    won2 shouldBe true
  }

  test("nested staging debris inside a live snapshot is invisible to " +
      "readers and age-swept by vacuum") {
    val root = freshRoot()
    VersionedTable.commit(Seq(1, 2).toDF("x"), root) // v=0 live
    // simulate a crashed race loser: hidden staging dir nested inside
    // the live snapshot, containing foreign parquet data
    val nested = new java.io.File(root, "v=0/_staging_loser99")
    nested.mkdirs()
    Seq(99).toDF("x").write.mode("overwrite")
      .parquet(nested.getPath + "/data")
    // readers never see the foreign rows (underscore prefix)
    VersionedTable.read(spark, root, Some(0))
      .agg(sum($"x")).head().getLong(0) shouldBe 3L
    // vacuum's nested sweep removes it once past the age window
    VersionedTable.vacuum(spark, root, keepLast = 1,
      stagingOlderThanMs = -1000L)
    nested.exists() shouldBe false
  }

  test("vacuum drops oldest, keeps newest, reports the drop") {
    val root = freshRoot()
    (1 to 4).foreach(i => VersionedTable.commit(Seq(i).toDF("x"), root))
    VersionedTable.vacuum(spark, root, keepLast = 2) shouldBe Seq(0, 1)
    VersionedTable.versions(spark, root) shouldBe Seq(2, 3)
    VersionedTable.read(spark, root, Some(3)).head().getInt(0) shouldBe 4
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(0))
    }
  }
}
