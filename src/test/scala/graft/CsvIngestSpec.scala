package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.sources.{CsvIngest, IngestConfig}
import graft.operators._

/** End-to-end ingest pipeline over a sample01-shaped fixture
  * (pipe-delimited, ISO-8859-1, blank coords, out-of-range coords,
  * accented text - mirrors the reference's `sample01/sample01.csv`
  * shape without copying its data). */
class CsvIngestSpec extends SparkSpec {

  private def writeFixture(dir: Path): String = {
    val rows = Seq(
      "Name | Longitude | LATITUDE |amount| when",
      "alpha|2,17|41,38|10|01/09/2017 2:47:25",
      "bèta|-3,70|40,42|20,5|02/09/2017",
      "gamma|181|91|30|03/09/2017 10:00:00",
      "delta|||40|zzz",
      "épsilon|13,40|52,52||05/09/2017")
    val f = dir.resolve("sample.csv")
    Files.write(f, rows.mkString("\n").getBytes(Charset.forName("ISO-8859-1")))
    f.toString
  }

  private val cfg = IngestConfig(
    tableName = "t_sample",
    delimiter = "|",
    encoding = "ISO-8859-1",
    dateColumns = Seq("when"),
    xColumn = "longitude",
    yColumn = "latitude",
    floatDecimalSeparator = ",",
    floatThousandSeparator = ".")

  test("scan normalizes headers and keeps strings") {
    val dir = Files.createTempDirectory("graft_csv")
    val df = CsvIngest.scan(spark, writeFixture(dir), cfg)
    df.columns.toSeq shouldBe Seq("name", "longitude", "latitude", "amount", "when")
    df.schema.fields.forall(_.dataType.typeName == "string") shouldBe true
    df.count() shouldBe 5
  }

  test("column kind inference: amount numeric, name string, when date") {
    val dir = Files.createTempDirectory("graft_csv")
    val df = CsvIngest.scan(spark, writeFixture(dir), cfg)
    val kinds = CsvIngest.inferColumnKinds(df, cfg)
    kinds("amount") shouldBe CsvIngest.NumericCol
    kinds("name") shouldBe CsvIngest.StringCol
    kinds("when") shouldBe CsvIngest.DateCol
  }

  test("full ingest: geometry, typed columns, ISO-8859-1 text") {
    val dir = Files.createTempDirectory("graft_csv")
    val out = CsvIngest.ingest(spark, writeFixture(dir), cfg)
      .orderBy("name").collect()
    out.length shouldBe 5
    val byName = out.map(r => r.getString(r.fieldIndex("name")) -> r).toMap
    // accented text survived the encoding
    byName.keySet should contain allOf ("bèta", "épsilon")
    // comma-decimal amount parsed
    byName("bèta").getAs[Double]("amount") shouldBe 20.5
    // valid point
    byName("alpha").getAs[org.apache.spark.sql.Row]("the_geom")
      .getDouble(0) shouldBe 2.17
    // out-of-range coords -> NULL geom; blank coords -> NULL geom
    byName("gamma").isNullAt(0) shouldBe true
    byName("delta").isNullAt(0) shouldBe true
    // date formats: datetime, date-only fallback, invalid->NULL
    byName("alpha").getAs[java.sql.Timestamp]("when").toString shouldBe
      "2017-09-01 02:47:25.0"
    byName("bèta").getAs[java.sql.Timestamp]("when").toString shouldBe
      "2017-09-02 00:00:00.0"
    byName("delta").isNullAt(byName("delta").fieldIndex("when")) shouldBe true
    // blank amount -> NULL
    byName("épsilon").isNullAt(byName("épsilon").fieldIndex("amount")) shouldBe true
  }

  test("insert resume: start/end chunk slice rows like the reference offsets") {
    spark.version // init the shared session (jobs use SparkSession.active)
    val dir = Files.createTempDirectory("graft_chunks")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_chunk").toString
    // chunkSize 2 over 5 rows -> chunks: (1,2) (3,4) (5)
    val small = cfg.copy(chunkSize = 2)
    new InsertJob(csv, table, small).run(startChunk = 2).totalRows shouldBe 5
    ParquetTable.read(spark, table).count() shouldBe 3 // rows 3..5
    val table2 = dir.resolve("t_chunk2").toString
    new InsertJob(csv, table2, small).run(startChunk = 1, endChunk = Some(1))
    ParquetTable.read(spark, table2).count() shouldBe 2 // rows 1..2
  }

  test("malformed rows divert to the rejected side output, load continues") {
    val dir = Files.createTempDirectory("graft_rej")
    val f = dir.resolve("bad.csv")
    // row 2 has an unterminated quote -> malformed under the csv parser
    Files.write(f, "name|amount\nok|1\n\"broken|2\nalso_ok|3\n".getBytes)
    val table = dir.resolve("t_rej").toString
    val rej = dir.resolve("rejected").toString
    val r = new InsertJob(f.toString, table,
      cfg.copy(forceNoGeometry = true), IngestObserver.silent,
      rejectedPath = Some(rej)).run()
    r.rejectedRows shouldBe 1
    r.writtenRows shouldBe 2
    ParquetTable.read(spark, table).count() shouldBe 2
    spark.read.parquet(rej).count() shouldBe 1
  }

  test("update row-range slice (start_row/end_row)") {
    spark.version // init the shared session (jobs use SparkSession.active)
    val dir = Files.createTempDirectory("graft_rowrange")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_rows").toString
    val insCfg = cfg.copy(idColumn = Some("name"))
    new InsertJob(csv, table, insCfg).run()
    // update only file rows 2..3 (bèta, gamma): set amount
    val updCsv = dir.resolve("upd.csv")
    Files.write(updCsv,
      "name|amount\nalpha|111\nbèta|222\ngamma|333\ndelta|444\n"
        .getBytes(Charset.forName("ISO-8859-1")))
    new UpdateByKeyJob(updCsv.toString, table,
      insCfg.copy(forceNoGeometry = true)).run(startRow = 2, endRow = Some(3))
    val amounts = ParquetTable.read(spark, table)
      .select(col("name"), col("amount")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    amounts("alpha") shouldBe 10.0 // untouched (row 1 outside range)
    amounts("bèta") shouldBe 222.0
    amounts("gamma") shouldBe 333.0
    amounts("delta") shouldBe 40.0 // untouched (row 4 outside range)
  }

  test("transiently-failing append succeeds within the retry budget") {
    val dir = Files.createTempDirectory("graft_retry")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_retry").toString
    val events = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val obs: IngestObserver = (t, m) => events += ((t, m))
    var calls = 0
    val flaky: (org.apache.spark.sql.DataFrame, String, String) => Unit = {
      (df, p, tag) =>
        calls += 1
        if (calls == 1) throw new java.io.IOException("transient sink hiccup")
        ParquetTable.appendStaged(df, p, tag)
    }
    val r = new InsertJob(csv, table, cfg, obs, writer = flaky).run()
    calls shouldBe 2
    r.writtenRows shouldBe 5
    r.failedRows shouldBe 0
    ParquetTable.read(spark, table).count() shouldBe 5
    // the failed attempt was reported, reference-style (etl.py:280-283)
    events.exists(e => e._1 == "error" && e._2.contains("retrying")) shouldBe true
  }

  test("retried append never duplicates a partial failed publish") {
    val dir = Files.createTempDirectory("graft_nodup")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_nodup").toString
    var calls = 0
    // attempt 1 publishes PART of the batch into the target (simulating
    // a mid-commit crash), then fails; attempt 2 runs the real staged
    // publish, which must clean the orphan before re-publishing
    val crashy: (org.apache.spark.sql.DataFrame, String, String) => Unit = {
      (df, p, tag) =>
        calls += 1
        if (calls == 1) {
          df.limit(2).write.mode("overwrite")
            .parquet(dir.resolve("half").toString)
          val fs = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.mkdirs(new org.apache.hadoop.fs.Path(p))
          new java.io.File(dir.resolve("half").toString).listFiles()
            .filter(_.getName.startsWith("part-")).foreach { f =>
              fs.rename(
                new org.apache.hadoop.fs.Path(f.getAbsolutePath),
                new org.apache.hadoop.fs.Path(p, s"$tag-${f.getName}"))
            }
          throw new java.io.IOException("crashed mid-commit")
        }
        ParquetTable.appendStaged(df, p, tag)
    }
    val r = new InsertJob(csv, table, cfg, IngestObserver.silent,
      writer = crashy).run()
    r.writtenRows shouldBe 5
    // exactly the batch's rows: the orphaned partial publish was cleaned
    ParquetTable.read(spark, table).count() shouldBe 5
  }

  test("two appends into one table accumulate (per-run batch tags)") {
    // a constant batch tag would make run 2's idempotent cleanup delete
    // run 1's published files — the resume / second-CSV workflow
    val dir = Files.createTempDirectory("graft_twice")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_twice").toString
    new InsertJob(csv, table, cfg).run()
    ParquetTable.read(spark, table).count() shouldBe 5
    new InsertJob(csv, table, cfg).run()
    ParquetTable.read(spark, table).count() shouldBe 10
    // and with the chunk-commit path too
    new InsertJob(csv, table, cfg.copy(chunkSize = 2),
      commitBatches = 2).run()
    ParquetTable.read(spark, table).count() shouldBe 15
  }

  test("crash recovery with an explicit runTag republishes over orphans") {
    // simulates a JVM death mid-publish: a dead run's partial files sit
    // in the target under its tag; re-running with the SAME runTag must
    // clean them, while a fresh random tag would duplicate them
    val dir = Files.createTempDirectory("graft_crashrec")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_rec").toString
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(table))
    // dead run "r1" published 2 orphan rows before dying
    val orphanSrc = dir.resolve("orphan").toString
    spark.createDataFrame(Seq(("zombie1", 1.0), ("zombie2", 2.0)))
      .toDF("name", "amount").write.parquet(orphanSrc)
    new java.io.File(orphanSrc).listFiles()
      .filter(_.getName.startsWith("part-")).foreach { f =>
        fs.rename(new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          new org.apache.hadoop.fs.Path(table, s"r1-b0-${f.getName}"))
      }
    // recovery run reuses the dead run's tag -> orphans replaced
    new InsertJob(csv, table, cfg, runTag = Some("r1")).run()
    val rows = ParquetTable.read(spark, table)
    rows.count() shouldBe 5
    rows.filter(col("name").startsWith("zombie")).count() shouldBe 0
  }

  test("permanently-failing batch diverts and the run completes") {
    val dir = Files.createTempDirectory("graft_permfail")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_perm").toString
    val failedDir = dir.resolve("failed").toString
    val events = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val obs: IngestObserver = (t, m) => events += ((t, m))
    // batch 0 always fails; other batches write through
    val partial: (org.apache.spark.sql.DataFrame, String, String) => Unit = {
      (df, p, tag) =>
        val minName = df.agg(min(col("name"))).head().getString(0)
        if (minName == "alpha") throw new java.io.IOException("batch sink down")
        ParquetTable.appendStaged(df, p, tag)
    }
    // chunkSize 2 over 5 rows -> chunks {alpha,bèta} {gamma,delta}
    // {épsilon} round-robined over 3 batches; the alpha batch fails
    val r = new InsertJob(csv, table, cfg.copy(maxAttempts = 2, chunkSize = 2),
      obs, writer = partial, commitBatches = 3,
      failedBatchPath = Some(failedDir)).run()
    r.totalRows shouldBe 5
    r.failedRows shouldBe 2L
    r.writtenRows + r.failedRows shouldBe 5
    // run completed, surviving batches landed, failed rows diverted
    ParquetTable.read(spark, table).count() shouldBe r.writtenRows
    spark.read.parquet(failedDir).count() shouldBe r.failedRows
    events.exists(e => e._1 == "error" && e._2.startsWith("Failed")) shouldBe true
  }

  test("resume slice plans without a single-partition window") {
    val dir = Files.createTempDirectory("graft_rownum")
    val csv = writeFixture(dir)
    val scanned = CsvIngest.scan(spark, csv, cfg)
    val numbered = RowNumbers.global(scanned, "__rownum")
    // contiguous 1..N in file order
    numbered.select("name", "__rownum").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("alpha" -> 1L, "bèta" -> 2L, "gamma" -> 3L, "delta" -> 4L,
        "épsilon" -> 5L)
    // the window is partitioned by the scan partition id — never a
    // global (single-partition) sort
    val planned = numbered.queryExecution.executedPlan.toString
    planned should include ("__gr_pid")
    planned should not include "Window [row_number() windowspecdefinition(monotonically_increasing_id()"
  }

  test("integer inference keeps integral columns long (fixed-mode Q5)") {
    val dir = Files.createTempDirectory("graft_int")
    val f = dir.resolve("ints.csv")
    Files.write(f, "id|qty|price\n1|10|1,5\n2|20|2,25\n3|30|3,0\n"
      .getBytes(Charset.forName("ISO-8859-1")))
    val intCfg = cfg.copy(dateColumns = Nil, forceNoGeometry = true,
      inferIntegers = true)
    val df = CsvIngest.scan(spark, f.toString, intCfg)
    val kinds = CsvIngest.inferColumnKinds(df, intCfg)
    kinds("id") shouldBe CsvIngest.IntegerCol
    kinds("qty") shouldBe CsvIngest.IntegerCol
    kinds("price") shouldBe CsvIngest.NumericCol
    val typed = CsvIngest.typedProjection(df, intCfg, kinds)
    typed.schema("qty").dataType.typeName shouldBe "long"
    typed.schema("price").dataType.typeName shouldBe "double"
    // default (reference quirk Q5): everything numeric is double
    val refKinds = CsvIngest.inferColumnKinds(df, intCfg.copy(inferIntegers = false))
    refKinds("qty") shouldBe CsvIngest.NumericCol
  }

  test("value-level typing renders mixed columns per value (reference mode)") {
    val dir = Files.createTempDirectory("graft_vl")
    val f = dir.resolve("mixed.csv")
    Files.write(f,
      "id|mixed\na|1\nb|abc\nc|2,5\nd|\ne|12345678\nf|0\n".getBytes(
        Charset.forName("ISO-8859-1")))
    val vlCfg = cfg.copy(dateColumns = Nil, forceNoGeometry = true,
      valueLevelTypes = true)
    val df = CsvIngest.scan(spark, f.toString, vlCfg)
    val typed = CsvIngest.typedProjection(df, vlCfg,
      CsvIngest.inferColumnKinds(df, vlCfg))
    typed.schema("mixed").dataType.typeName shouldBe "string"
    val vals = typed.select("id", "mixed").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    // "1" renders as the float literal, text stays raw, blank -> NULL
    vals("a") shouldBe "1.0"
    vals("b") shouldBe "abc"
    vals("c") shouldBe "2.5"
    vals("d") shouldBe null
    // plain rendering, never Java scientific notation (reference
    // str(float) fidelity below 1e16)
    vals("e") shouldBe "12345678.0"
    vals("f") shouldBe "0.0"
    // default column-vote mode downgrades the whole column to string,
    // keeping raw "1" (the fixed behavior)
    val voted = CsvIngest.typedProjection(df,
      vlCfg.copy(valueLevelTypes = false),
      CsvIngest.inferColumnKinds(df, vlCfg.copy(valueLevelTypes = false)))
    voted.filter(col("id") === "a").head()
      .getString(voted.columns.indexOf("mixed")) shouldBe "1"
  }

  test("insert -> update -> delete job lifecycle against a parquet table") {
    val dir = Files.createTempDirectory("graft_jobs")
    val csv = writeFixture(dir)
    val table = dir.resolve("t_sample").toString
    val events = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val obs: IngestObserver = (t, m) => events += ((t, m))

    val insCfg = cfg.copy(idColumn = Some("name"))
    new InsertJob(csv, table, insCfg, obs).run().totalRows shouldBe 5
    ParquetTable.read(spark, table).count() shouldBe 5
    events.map(_._1) should contain ("total_rows")

    // update: change alpha's amount via a second csv (last-writer-wins)
    val updCsv = dir.resolve("upd.csv")
    Files.write(updCsv, "name|amount\nalpha|111\nalpha|999\n".getBytes)
    new UpdateByKeyJob(updCsv.toString, table,
      insCfg.copy(delimiter = "|", forceNoGeometry = true)).run()
    val updated = ParquetTable.read(spark, table)
    updated.filter(col("name") === "alpha")
      .select("amount").head().getDouble(0) shouldBe 999.0
    updated.count() shouldBe 5

    // delete two keys
    val delCsv = dir.resolve("del.csv")
    Files.write(delCsv, "name\ngamma\ndelta\n".getBytes)
    new DeleteByKeyJob(delCsv.toString, table, insCfg).run()
    ParquetTable.read(spark, table).count() shouldBe 3
  }
}
