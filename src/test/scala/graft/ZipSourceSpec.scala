package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import graft.sources.{IngestConfig, ZipSource}

/** Zip-archive ingestion (reference geocoding result shape: a zip with
  * _out.txt/_err.txt member CSVs). */
class ZipSourceSpec extends SparkSpec {

  private def writeZip(): String = {
    val dir = Files.createTempDirectory("graft_zip")
    val f = dir.resolve("result.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    def member(name: String, text: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(text.getBytes("UTF-8"))
      zos.closeEntry()
    }
    member("job_out.txt", "RecID|displayLatitude|displayLongitude\n1|53.35|-6.26\n2|40.42|-3.70\n")
    member("job_err.txt", "RecID|reason\n3|no match\n")
    zos.close()
    dir.toString
  }

  test("readMembers lists every member with its text") {
    val dir = writeZip()
    val members = ZipSource.readMembers(spark, dir).collect()
    members.map(_.getString(1)).sorted.toSeq shouldBe
      Seq("job_err.txt", "job_out.txt")
    members.find(_.getString(1) == "job_err.txt").get
      .getString(2) should include ("no match")
  }

  test("output-column fitting: missing columns fill '', extras drop") {
    val dir = writeZip()
    val cfg = IngestConfig(tableName = "geo", delimiter = "|")
    // the configured output shape asks for a column the member lacks
    // (seqnumber) and omits one it has (displaylongitude) — reference
    // __get_row__ semantics (geocoding.py:118-129)
    val out = ZipSource.readZipCsv(spark, dir, "_out.txt", cfg,
      outputColumns = Seq("recid", "seqnumber", "displaylatitude"))
    out.columns.toSeq shouldBe Seq("recid", "seqnumber", "displaylatitude")
    val r = out.filter(col("recid") === "1").head()
    r.getString(1) shouldBe ""      // missing column filled with ''
    r.getString(2) shouldBe "53.35"
  }

  test("readZipCsv parses a member as a normalized-header scan") {
    val dir = writeZip()
    val cfg = IngestConfig(tableName = "geo", delimiter = "|")
    val out = ZipSource.readZipCsv(spark, dir, "_out.txt", cfg)
    out.columns.toSeq shouldBe Seq("recid", "displaylatitude", "displaylongitude")
    out.count() shouldBe 2
    out.filter(col("recid") === "1").head().getString(1) shouldBe "53.35"
  }
}
