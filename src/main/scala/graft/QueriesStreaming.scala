package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline

/** Streaming-pipeline coverage, oracle-checked in batch mode: the same
  * transforms run behind readStream (StreamingSpec proves that with
  * MemoryStream); batch execution makes them DuckDB-comparable. */
object QueriesStreaming {

  // --------------------------------------------------------------- q27
  /** Tumbling 1-hour windowed counts per event type. */
  private def q27Window(s: SparkSession, dir: String): DataFrame =
    EventPipeline.windowedTypeCounts(
        Tables.load(s, dir, "events"), streaming = false)
      .orderBy(col("window_start"), col("event_type"))

  private val q27Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  event_type, count(*) AS n, sum(value) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // --------------------------------------------------------------- q28
  /** Gap-based (30 min) per-user sessions via session_window. */
  private def q28Sessions(s: SparkSession, dir: String): DataFrame =
    EventPipeline.sessions(Tables.load(s, dir, "events"), streaming = false)
      .orderBy(col("user_id"), col("session_start"))

  private val q28Sql =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, sum(value) AS sum_value
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // --------------------------------------------------------------- q43
  /** Stream-stream interval join in batch mode: view -> purchase
    * attribution within 30 minutes per user (StreamingSpec drives the
    * same transform through MemoryStream with watermarks on both
    * sides). */
  private def q43Attribution(s: SparkSession, dir: String): DataFrame =
    EventPipeline.attributionJoin(Tables.load(s, dir, "events"),
        "view", "purchase", streaming = false)
      .orderBy(col("target_id"), col("source_id"))

  private val q43Sql =
    """SELECT v.event_id AS source_id, p.event_id AS target_id,
      |  v.user_id, v.ts AS source_ts, p.ts AS target_ts, p.value
      |FROM events v JOIN events p
      |  ON p.user_id = v.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL '30 minutes'
      |ORDER BY target_id, source_id""".stripMargin

  // -------------------------------------------------------------- export

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_stream_window" -> (q27Window _),
    "q28_stream_sessions" -> (q28Sessions _),
    "q43_stream_attribution" -> (q43Attribution _),
  )

  val oracles: Map[String, String] = Map(
    "q27_stream_window" -> q27Sql,
    "q28_stream_sessions" -> q28Sql,
    "q43_stream_attribution" -> q43Sql,
  )
}
