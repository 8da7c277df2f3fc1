package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal-pipeline coverage: binary content column + per-partition
  * (stub-)decode feature extraction, oracle-checked because the fake
  * decoder's features are md5/length-derived (reproducible in DuckDB). */
object QueriesMultimodal {

  private def q29Features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.asMediaTable(
      Tables.load(s, dir, "documents"), "doc_id", "text", "image")
      .as[MediaRow]
    Multimodal.extractFeatures(media,
        () => new Multimodal.DeterministicFakeDecoder)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("digest"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val q29Sql =
    """SELECT doc_id, 'image' AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST((('0x' || substr(md5(text), 1, 4))::BIGINT % 1920) + 1 AS INT) AS width,
      |  CAST((('0x' || substr(md5(text), 5, 4))::BIGINT % 1080) + 1 AS INT) AS height,
      |  CAST(octet_length(encode(text)) % 100 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_features" -> (q29Features _))

  val oracles: Map[String, String] = Map(
    "q29_multimodal_features" -> q29Sql)
}
