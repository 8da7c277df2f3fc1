package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink built directly on the Avro
  * Java library (this environment ships avro-1.12 core but NOT the
  * `spark-avro` module, so `spark.read.format("avro")` is
  * unavailable; the container format itself is pure library code).
  * Rounds out the format surface beside parquet/ORC/JSON/CSV/XML/zip:
  * Avro is the de-facto wire format of Kafka/schema-registry
  * pipelines, so a corpus landing zone full of `.avro` containers
  * must be readable without a re-encode hop.
  *
  * Field-type subset: long / int / double / string / boolean, each
  * written as the standard nullable union `["null", T]`. Column
  * names must be valid Avro names ([A-Za-z_][A-Za-z0-9_]*) —
  * SchemaBuilder rejects others loudly; alias such columns first.
  * Blocks are DEFLATE-compressed (a third REAL compressed codec
  * beside PNG/zip — the bytes on disk round-trip actual
  * decompression).
  *
  * Scale: write is one container per partition (no driver
  * involvement); read is `binaryFile` + per-blob DataFileStream —
  * one task per FILE, the many-medium-files shape. Avro's internal
  * block structure would allow finer splits, which is deliberately
  * left to the spark-avro DataSourceV2 when that jar is present; for
  * container fleets, size files at write time instead.
  */
object AvroSource {

  private[sources] def avroSchema(schema: StructType): Schema = {
    val fields = SchemaBuilder.record("GraftRow").namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val b = fs.name(f.name).`type`()
      f.dataType match {
        case LongType    => b.unionOf().nullType().and().longType().endUnion().nullDefault()
        case IntegerType => b.unionOf().nullType().and().intType().endUnion().nullDefault()
        case DoubleType  => b.unionOf().nullType().and().doubleType().endUnion().nullDefault()
        case StringType  => b.unionOf().nullType().and().stringType().endUnion().nullDefault()
        case BooleanType => b.unionOf().nullType().and().booleanType().endUnion().nullDefault()
        case dt => throw new IllegalArgumentException(
          s"unsupported Avro field type $dt for column ${f.name} — " +
            "cast to long/int/double/string/boolean first")
      }
    }.endRecord()
  }

  /** Write `df` as one DEFLATE-compressed Avro container per
    * partition under `dir` (created if absent). Local-filesystem
    * paths (the container-fleet landing-zone shape this models);
    * distributed filesystems go through the spark-avro module when
    * its jar is available. */
  def write(df: DataFrame, dir: String): Unit = {
    // the partition writers open executor-side java.io.File handles
    // against `dir`: on a multi-host cluster each container would land
    // on a WORKER-local disk and read() would silently miss them —
    // enforce the documented local-only contract loudly instead
    val master = df.sparkSession.sparkContext.master
    require(master.startsWith("local"),
      s"AvroSource.write targets executor-local java.io paths; " +
        s"master '$master' is not local[*] — on a cluster route " +
        "through the spark-avro module or a Hadoop FileSystem sink")
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        if (rows.isEmpty) Iterator.empty
        else {
          val avSchema = new Schema.Parser().parse(schemaJson)
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](avSchema))
          writer.setCodec(CodecFactory.deflateCodec(6))
          val file = new java.io.File(dir, f"part-$pid%05d.avro")
          writer.create(avSchema, file)
          var n = 0L
          rows.foreach { row =>
            val rec = new GenericData.Record(avSchema)
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              rec.put(f.name, if (row.isNullAt(i)) null else row.get(i))
            }
            writer.append(rec)
            n += 1L
          }
          writer.close()
          Iterator.single(n)
        }
      }.count() // materialize the write
    ()
  }

  /** Read every `*.avro` container under `path` into a DataFrame with
    * the given `schema` (names resolve against the records; missing
    * fields and nulls read as null). The codec (deflate here, any
    * registered codec generally) is handled by the container layer. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val names = schema.fields.map(_.name)
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select(col("content"))
      .rdd.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        val in = new java.io.ByteArrayInputStream(bytes)
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        val avroIt = stream.iterator().asScala
        // close-on-exhaustion iterator: rows STREAM out of the
        // container decoder — the blob is the only whole-file buffer;
        // decoded rows never materialize a second copy
        new Iterator[Row] {
          private var closed = false
          override def hasNext: Boolean = {
            if (closed) false
            else if (avroIt.hasNext) true
            else { stream.close(); closed = true; false }
          }
          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException("exhausted")
            val rec = avroIt.next()
            Row.fromSeq(names.toIndexedSeq.map { n =>
              // name resolution: a requested field the record lacks
              // reads as null (GenericRecord.get throws on unknown)
              val v = if (rec.getSchema.getField(n) == null) null
                else rec.get(n)
              v match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case other => other
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
