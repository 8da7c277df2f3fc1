package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{DeleteByKeyJob, IngestObserver, InsertJob, ParquetTable, UpdateByKeyJob}
import graft.sources.IngestConfig

/** Command-line entry point — the analog of the reference's
  * `sample01/run_etl.py` driver (insert | update | delete over a CSV into
  * a parquet table), plus `show` for readback.
  *
  * Usage:
  *   graft.Cli insert <csv> <tableDir> [--delimiter '|'] [--encoding enc]
  *     [--x-column lon] [--y-column lat] [--date-columns a,b]
  *     [--decimal-sep ','] [--thousand-sep '.'] [--id-column id]
  *     [--no-geometry] [--force-the-geom col]
  *   graft.Cli update <csv> <tableDir> --id-column <key> [...]
  *   graft.Cli delete <csv> <tableDir> --id-column <key> [...]
  *   graft.Cli dedup <tableDir> <outDir> [--id-column doc_id]
  *     [--text-column text] [--shingle-words 13] [--threshold 0.6]
  *   graft.Cli show <tableDir> [n]
  */
object Cli {
  private def parseFlags(args: List[String]): Map[String, String] = args match {
    case Nil => Map.empty
    case "--no-geometry" :: rest => parseFlags(rest) + ("no-geometry" -> "true")
    case flag :: value :: rest if flag.startsWith("--") =>
      parseFlags(rest) + (flag.drop(2) -> value)
    case other :: _ =>
      throw new IllegalArgumentException(s"unexpected argument: $other")
  }

  /** Flags override values from an optional `--config etl.conf` INI file
    * (the reference's configuration path, translated by IniConfig). */
  def configFrom(flags: Map[String, String], table: String): IngestConfig = {
    val base = flags.get("config")
      .map(graft.sources.IniConfig.loadIngestConfig)
    base match {
      case Some(b) => b.copy(
        tableName = table,
        delimiter = flags.getOrElse("delimiter", b.delimiter),
        encoding = flags.getOrElse("encoding", b.encoding),
        forceNoGeometry = flags.contains("no-geometry") || b.forceNoGeometry,
        idColumn = flags.get("id-column").orElse(b.idColumn),
        chunkSize = flags.get("chunk-size").map(_.toInt).getOrElse(b.chunkSize))
      case None => flagsOnlyConfig(flags, table)
    }
  }

  private def flagsOnlyConfig(flags: Map[String, String], table: String): IngestConfig =
    IngestConfig(
      tableName = table,
      delimiter = flags.getOrElse("delimiter", ","),
      encoding = flags.getOrElse("encoding", "UTF-8"),
      columns = flags.get("columns").map(_.split(",").toSeq).getOrElse(Nil),
      dateColumns = flags.get("date-columns").map(_.split(",").toSeq).getOrElse(Nil),
      datetimeFormat = flags.getOrElse("datetime-format", "d/M/yyyy H:mm:ss"),
      dateFormat = flags.getOrElse("date-format", "d/M/yyyy"),
      xColumn = flags.getOrElse("x-column", "longitude"),
      yColumn = flags.getOrElse("y-column", "latitude"),
      srid = flags.getOrElse("srid", "4326").toInt,
      forceNoGeometry = flags.contains("no-geometry"),
      forceTheGeom = flags.get("force-the-geom"),
      floatDecimalSeparator = flags.getOrElse("decimal-sep", "."),
      floatThousandSeparator = flags.getOrElse("thousand-sep", ","),
      chunkSize = flags.getOrElse("chunk-size", "1000").toInt,
      idColumn = flags.get("id-column"))

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Cli <insert|update|delete|show> ...")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val observer: IngestObserver =
      (t, m) => println(s"[$t] $m")
    try args(0) match {
      case "insert" =>
        val flags = parseFlags(args.drop(3).toList)
        val r = new InsertJob(args(1), args(2),
          configFrom(flags, args(2)), observer,
          rejectedPath = flags.get("rejected-path")).run(
          startChunk = flags.getOrElse("start-chunk", "1").toInt,
          endChunk = flags.get("end-chunk").map(_.toInt))
        println(s"inserted ${r.writtenRows} rows" +
          (if (r.rejectedRows > 0) s" (${r.rejectedRows} rejected)" else ""))
      case "update" =>
        val flags = parseFlags(args.drop(3).toList)
        val r = new UpdateByKeyJob(args(1), args(2),
          configFrom(flags, args(2)), observer).run(
          startRow = flags.getOrElse("start-row", "1").toInt,
          endRow = flags.get("end-row").map(_.toInt))
        println(s"applied ${r.writtenRows} updates")
      case "delete" =>
        val flags = parseFlags(args.drop(3).toList)
        val r = new DeleteByKeyJob(args(1), args(2),
          configFrom(flags, args(2)), observer).run()
        println(s"deleted by ${r.totalRows} keys")
      case "geocode" =>
        // geocode <csv> <lookupCsv(address,lon,lat)> <outDir>
        //   [--address-column addr] [...csv flags]
        // writes outDir partitioned by status (found/not_found/invalid) —
        // the reference's three result files as table partitions
        val flags = parseFlags(args.drop(4).toList)
        val cfg = configFrom(flags, args(3))
        val input = graft.sources.CsvIngest.scan(spark, args(1), cfg)
        val lookup = graft.sources.CsvIngest.scan(spark, args(2),
          cfg.copy(delimiter = flags.getOrElse("lookup-delimiter", ",")))
          .select(org.apache.spark.sql.functions.col("address"),
            org.apache.spark.sql.functions.col("lon").cast("double").as("lon"),
            org.apache.spark.sql.functions.col("lat").cast("double").as("lat"))
        val addrCol = flags.getOrElse("address-column", "address")
        val routed = graft.operators.Geocoding.routed(
          new graft.operators.LookupTableGeocoder(lookup), input, addrCol)
        routed.write.mode("overwrite").partitionBy("status").parquet(args(3))
        // status counts read back from the written partitions (metadata +
        // footer scan) — re-aggregating `routed` would re-run the whole
        // scan+join pipeline a second time
        val counts = spark.read.parquet(args(3))
          .groupBy("status").count().collect()
          .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
        println(s"geocoded: $counts")
      case "dedup" =>
        // dedup <tableDir> <outDir> [--id-column id] [--text-column text]
        //   [--shingle-words 13] [--threshold 0.6] [--max-bucket-size n]
        // near-dup prune: keep one representative per MinHash cluster
        val flags = parseFlags(args.drop(3).toList)
        val idCol = flags.getOrElse("id-column", "doc_id")
        val textCol = flags.getOrElse("text-column", "text")
        // persisted: consumed by the count, the pair pipeline, and the
        // anti-join — uncached, the scan would run three times
        val in = ParquetTable.read(spark, args(1)).persist()
        val total = in.count()
        val kept = graft.operators.Dedup.dropNearDups(in, idCol, textCol,
          shingleWords = flags.getOrElse("shingle-words", "13").toInt,
          threshold = flags.getOrElse("threshold", "0.6").toDouble,
          maxBucketSize = flags.get("max-bucket-size").map(_.toInt)
            .getOrElse(graft.operators.Dedup.DefaultMaxBucketSize))
        ParquetTable.overwriteAtomic(kept, args(2))
        in.unpersist()
        // parquet count() is satisfied from row-group metadata — not a
        // data scan of the output
        val surviving = spark.read.parquet(args(2)).count()
        println(s"dedup: kept $surviving of $total rows " +
          s"(dropped ${total - surviving} near-dups)")
      case "show" =>
        val n = if (args.length > 2) args(2).toInt else 20
        ParquetTable.read(spark, args(1)).show(n, truncate = false)
      case other =>
        System.err.println(s"unknown command: $other"); sys.exit(2)
    } finally spark.stop()
  }
}
