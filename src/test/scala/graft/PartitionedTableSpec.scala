package graft

import org.apache.spark.sql.functions._
import graft.operators.PartitionedTable

/** Key-bucketed mutation: only touched bucket directories rewrite;
  * untouched buckets keep their files byte-identical. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def bucketFiles(path: String): Map[String, Set[String]] =
    new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(PartitionedTable.BucketCol + "="))
      .map { d =>
        d.getName -> d.listFiles().map(_.getName)
          .filter(_.startsWith("part-")).toSet
      }.toMap

  test("mergeByKey rewrites only the buckets containing updated keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pt").toString
    val path = dir + "/t"
    val base = (1L to 1000L).map(i => (i, s"name$i", i * 1.0))
      .toDF("id", "name", "amount")
    PartitionedTable.write(base, path, "id", numBuckets = 8)
    val before = bucketFiles(path)
    before.size shouldBe 8

    val updates = Seq((7L, 999.0), (13L, 888.0)).toDF("id", "amount")
    PartitionedTable.mergeByKey(spark, path, updates, "id", numBuckets = 8)

    val after = bucketFiles(path)
    val touched = Seq(7L, 13L).map(k =>
      s"${PartitionedTable.BucketCol}=" +
        Seq((k, 0)).toDF("id", "x")
          .select(PartitionedTable.bucketOf(col("id"), 8)).head().getInt(0)
    ).toSet
    // untouched bucket dirs: identical file sets (nothing rewritten)
    before.keys.filterNot(touched).foreach { b =>
      after(b) shouldBe before(b)
    }
    // touched dirs actually rewrote
    touched.foreach { b => after(b) should not be before(b) }
    // values merged, row count unchanged, non-updated column carried
    val t = PartitionedTable.read(spark, path)
    t.count() shouldBe 1000
    t.filter(col("id") === 7).select("amount").head().getDouble(0) shouldBe 999.0
    t.filter(col("id") === 7).select("name").head().getString(0) shouldBe "name7"
    t.filter(col("id") === 14).select("amount").head().getDouble(0) shouldBe 14.0
  }

  test("deleteByKey removes rows and leaves untouched buckets alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ptd").toString
    val path = dir + "/t"
    val base = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "v")
    PartitionedTable.write(base, path, "id", numBuckets = 8)
    val before = bucketFiles(path)

    PartitionedTable.deleteByKey(spark, path,
      Seq(5L, 6L).toDF("id"), "id", numBuckets = 8)

    val after = bucketFiles(path)
    val touched = Seq(5L, 6L).map(k =>
      s"${PartitionedTable.BucketCol}=" +
        Seq((k, 0)).toDF("id", "x")
          .select(PartitionedTable.bucketOf(col("id"), 8)).head().getInt(0)
    ).toSet
    before.keys.filterNot(touched).foreach { b =>
      after(b) shouldBe before(b)
    }
    val t = PartitionedTable.read(spark, path)
    t.count() shouldBe 498
    t.filter(col("id").isin(5L, 6L)).count() shouldBe 0
  }

  test("deleting every row of a bucket removes the bucket") {
    // dynamic overwrite only replaces partitions PRESENT in the output,
    // so a fully-emptied bucket needs the explicit delete path
    val dir = java.nio.file.Files.createTempDirectory("graft_ptz").toString
    val path = dir + "/t"
    PartitionedTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      path, "id", numBuckets = 1)
    PartitionedTable.deleteByKey(spark, path,
      Seq(1L, 2L, 3L).toDF("id"), "id", numBuckets = 1)
    PartitionedTable.read(spark, path).count() shouldBe 0
    // and a partial empty-out across many buckets
    val path2 = dir + "/t2"
    PartitionedTable.write((1L to 100L).toDF("id")
      .withColumn("v", col("id") * 2), path2, "id", numBuckets = 4)
    PartitionedTable.deleteByKey(spark, path2,
      (1L to 100L).filter { k =>
        Seq((k, 0)).toDF("id", "x")
          .select(PartitionedTable.bucketOf(col("id"), 4)).head().getInt(0) == 0
      }.toDF("id"), "id", numBuckets = 4)
    val t2 = PartitionedTable.read(spark, path2)
    t2.select(PartitionedTable.bucketOf(col("id"), 4)).distinct()
      .collect().map(_.getInt(0)).toSet should not contain 0
    t2.count() should be > 0L
  }

  test("compaction handles tagged append files, not just part- names") {
    import graft.operators.Maintenance
    val dir = java.nio.file.Files.createTempDirectory("graft_cmpt").toString
    val path = dir + "/t"
    (1L to 500L).toDF("id").repartition(20).write.parquet(path)
    // rename to the appendStaged publish shape '<tag>-part-*'
    val d = new java.io.File(path)
    d.listFiles().filter(_.getName.startsWith("part-")).foreach { f =>
      f.renameTo(new java.io.File(d, s"ab12-b0-${f.getName}"))
    }
    val r = Maintenance.compact(spark, path, targetFileMB = 128)
    r.filesBefore shouldBe 20
    r.filesAfter should be < 20
    spark.read.parquet(path).count() shouldBe 500
  }

  test("compaction merges small files without changing rows") {
    import graft.operators.Maintenance
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    val path = dir + "/t"
    (1L to 1000L).toDF("id").repartition(40).write.parquet(path)
    val before = spark.read.parquet(path)
    val sumBefore = before.agg(sum(col("id"))).head().getLong(0)
    val r = Maintenance.compact(spark, path, targetFileMB = 128)
    r.filesBefore shouldBe 40
    r.filesAfter should be < 40
    val after = spark.read.parquet(path)
    after.count() shouldBe 1000
    after.agg(sum(col("id"))).head().getLong(0) shouldBe sumBefore
    // idempotent: already-compact tables are left alone (no rewrite)
    val r2 = Maintenance.compact(spark, path, targetFileMB = 128)
    r2.filesAfter shouldBe r2.filesBefore
  }

  test("empty mutation set touches nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pte").toString
    val path = dir + "/t"
    PartitionedTable.write(Seq((1L, 1.0)).toDF("id", "v"), path, "id", 4)
    val before = bucketFiles(path)
    PartitionedTable.deleteByKey(spark, path,
      Seq.empty[Long].toDF("id"), "id", 4)
    bucketFiles(path) shouldBe before
  }
}
