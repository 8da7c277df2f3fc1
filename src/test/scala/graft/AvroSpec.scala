package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.AvroSource

/** Avro container source/sink: typed round trip with nulls, schema
  * resolution, unsupported-type failure, real container bytes. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_avro_spec").toString

  test("round trip preserves all five field types and nulls exactly") {
    val dir = tmpDir()
    val df = Seq(
      (1L, Some(10), Some(1.5), Some("alpha"), Some(true)),
      (2L, None, None, None, None),
      (3L, Some(-7), Some(-0.25), Some(""), Some(false)))
      .toDF("id", "i", "d", "s", "b")
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir, StructType.fromDDL(
      "id LONG, i INT, d DOUBLE, s STRING, b BOOLEAN"))
      .orderBy("id").collect()
    back.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getInt(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      r.getString(3),
      if (r.isNullAt(4)) null else r.getBoolean(4))).toSeq shouldBe Seq(
      (1L, 10, 1.5, "alpha", true),
      (2L, null, null, null, null),
      (3L, -7, -0.25, "", false))
  }

  test("schema resolution: a requested field absent from the records " +
      "reads as null") {
    val dir = tmpDir()
    AvroSource.write(Seq((1L, "x")).toDF("id", "s"), dir)
    val back = AvroSource.read(spark, dir,
      StructType.fromDDL("id LONG, s STRING, missing LONG")).head()
    (back.getLong(0), back.getString(1), back.isNullAt(2)) shouldBe
      ((1L, "x", true))
  }

  test("unsupported column types fail loudly at write time") {
    an[IllegalArgumentException] should be thrownBy
      AvroSource.write(
        Seq((1L, Seq(1, 2))).toDF("id", "arr"), tmpDir())
  }

  test("containers on disk are REAL avro (magic bytes) and " +
      "deflate-compressed blocks round-trip") {
    val dir = tmpDir()
    // repetitive payload: deflate must shrink it well below raw size
    val df = (1 to 2000).map(i => (i.toLong, "repeat " * 20))
      .toDF("id", "s").coalesce(1)
    AvroSource.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    files.length shouldBe 1
    val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
    new String(bytes.take(4), "US-ASCII").take(3) shouldBe "Obj"
    bytes.length.toLong should be < 2000L * 140 / 4 // well under raw
    AvroSource.read(spark, dir, StructType.fromDDL("id LONG, s STRING"))
      .count() shouldBe 2000L
  }
}
