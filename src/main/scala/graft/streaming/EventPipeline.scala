package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming pipelines over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference's only stream-ish traits are chunk-resume offsets and
  * the progress observer (carto-etl `etl/etl.py:37-56,159-164`);
  * checkpointed Structured Streaming subsumes both (SURVEY.md §2C). The
  * transforms below are written against plain DataFrames so the SAME
  * code runs in batch (oracle-checkable, q27/q28) and behind
  * `readStream` (StreamingSpec drives it with MemoryStream).
  *
  * Scale: windowed counts shuffle once on (window, type) with partial
  * aggregation; sessionization state is per-user and bounded by the gap
  * timeout — watermarks bound state retention in both.
  */
object EventPipeline {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-based stream source over an events directory (parquet parts). */
  def fromStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Stream-static enrichment + watermarked daily totals: the
    * canonical "join the firehose to a dimension table" pipeline —
    * the dimension is a plain batch DataFrame (broadcast, refreshed
    * per micro-batch by Structured Streaming's stream-static join
    * semantics; never shuffled), events map to a dimension key by
    * `joinKey`, and the output is per-(day, attr) counts + exact
    * cents. Identical code runs in batch for the oracle. At 100 TB
    * the stream side only shuffles on the (window, attr) agg key with
    * partial aggregation; the dimension rides the broadcast. */
  def enrichedDailyTotals(events: DataFrame, dim: DataFrame,
      joinKey: org.apache.spark.sql.Column,
      dimKey: String, attr: String,
      watermarkDelay: String = "1 day",
      streaming: Boolean = true): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", watermarkDelay)
              else events
    val cents = (round(col("value"), 2).cast("decimal(18,2)") * 100)
      .cast("long")
    src.join(broadcast(dim.select(col(dimKey), col(attr))),
        joinKey === col(dimKey))
      .groupBy(window(col("ts"), "1 day"), col(attr))
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
      .select(col("window.start").as("window_start"), col(attr),
        col("n"), col("sum_cents"))
  }

  /** Tumbling-window counts per event type. Works identically in batch
    * and streaming; in streaming the watermark bounds state/lateness. */
  def windowedTypeCounts(events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      streaming: Boolean = true): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", watermarkDelay)
              else events
    src.groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Gap-based sessions via the built-in session_window (the idiomatic
    * form; see `sessionizeWithState` for the custom-state form). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes",
      streaming: Boolean = true): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", watermarkDelay)
              else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup: emit the FIRST occurrence of each key,
    * dropping later duplicates that arrive within the watermark bound
    * (`dropDuplicatesWithinWatermark` — state expires once a key's
    * event time falls behind the watermark, so dedup state is bounded
    * instead of growing with the stream). Batch callers use
    * Dedup.exactDedup; this is the exactly-once stream form the
    * reference's resume offsets can't express. */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes",
      streaming: Boolean = true): DataFrame =
    if (streaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Stream-stream interval join (attribution): pair every `targetType`
    * event with the same user's `sourceType` events that happened in the
    * `within` window before it. In streaming, BOTH sides carry
    * watermarks and the join condition bounds event time on both sides —
    * exactly the shape Structured Streaming needs to expire join state
    * (state retention = watermark delay + interval, not the whole
    * stream). In batch the same code is a plain equi-join on user_id
    * with a pushed range predicate — one shuffle, skew governed by the
    * user_id key like any join.
    *
    * Output: (source_id, target_id, user_id, source_ts, target_ts,
    * value) — value is the target event's. */
  def attributionJoin(events: DataFrame, sourceType: String,
      targetType: String, within: String = "30 minutes",
      watermarkDelay: String = "10 minutes",
      streaming: Boolean = true): DataFrame = {
    def wm(df: DataFrame): DataFrame =
      if (streaming) df.withWatermark("ts", watermarkDelay) else df
    val src = wm(events.filter(col("event_type") === sourceType))
      .select(col("event_id").as("source_id"), col("user_id"),
        col("ts").as("source_ts"))
    val tgt = wm(events.filter(col("event_type") === targetType))
      .select(col("event_id").as("target_id"), col("user_id"),
        col("ts").as("target_ts"), col("value"))
    src.join(tgt, Seq("user_id"))
      .filter(col("source_ts") <= col("target_ts") &&
        col("source_ts") >= col("target_ts") - expr(s"INTERVAL '$within'"))
      .select(col("source_id"), col("target_id"), col("user_id"),
        col("source_ts"), col("target_ts"), col("value"))
  }

  /** Left-outer attribution: every source event emits EXACTLY once —
    * joined per conversion inside the window, or with NULL target
    * columns once the watermark proves no conversion can still arrive
    * (Structured Streaming's outer-join null emission). Two contract
    * points the inner form doesn't exercise:
    *  - the range predicate must live in the JOIN CONDITION, not a
    *    post-filter: filtering after a left join silently drops the
    *    unmatched rows the outer join exists to keep, and in streaming
    *    the ON-clause event-time bound is what lets join state expire
    *    AND null rows finalize;
    *  - the join key cannot be a USING column (both sides keep their
    *    own user_id; the source side's survives the null-extension).
    * Same output shape as [[attributionJoin]]. */
  def attributionJoinOuter(events: DataFrame, sourceType: String,
      targetType: String, within: String = "30 minutes",
      watermarkDelay: String = "10 minutes",
      streaming: Boolean = true): DataFrame = {
    def wm(df: DataFrame): DataFrame =
      if (streaming) df.withWatermark("ts", watermarkDelay) else df
    val src = wm(events.filter(col("event_type") === sourceType))
      .select(col("event_id").as("source_id"), col("user_id"),
        col("ts").as("source_ts"))
    val tgt = wm(events.filter(col("event_type") === targetType))
      .select(col("event_id").as("target_id"),
        col("user_id").as("__t_user"), col("ts").as("target_ts"),
        col("value"))
    src.join(tgt,
        col("user_id") === col("__t_user") &&
          col("source_ts") <= col("target_ts") &&
          col("source_ts") >= col("target_ts") - expr(s"INTERVAL '$within'"),
        "left_outer")
      .select(col("source_id"), col("target_id"), col("user_id"),
        col("source_ts"), col("target_ts"), col("value"))
  }

  // ---- custom-state sessionization (flatMapGroupsWithState) ----------

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  case class CusumAlarm(user_id: Long, event_id: Long)
  case class CusumState(s: Long)

  /** Streaming one-sided CUSUM drift alarms (the stateful twin of
    * TimeSeries.cusum): per-user GroupState carries the CUSUM level
    * s across micro-batches; each event folds
    * s := max(0, s + cents − k) and emits an alarm row when s > h.
    * Events must arrive per-user time-ordered ACROSS batches (a
    * time-partitioned source; within a batch they are sorted here) —
    * the same in-order contract as any streaming fold. State is one
    * long per user, so retention is |users|-bounded, not history-
    * bounded; Append mode makes each alarm emit exactly once.
    * Runs identically in batch (all events in one call) for the
    * oracle/spec. `cents` must already be integral. */
  def cusumAlarms(events: Dataset[Ev], k: Long, h: Long)
      : Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[CusumState]) =>
          // full microsecond order (getTime alone truncates to ms and
          // would tie-break sub-ms siblings wrongly vs the oracle)
          def micros(t: java.sql.Timestamp): Long =
            (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.map(_.s).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[CusumAlarm]()
          for (e <- sorted) {
            val cents = math.round(e.value * 100.0)
            s = math.max(0L, s + cents - k)
            if (s > h) out += CusumAlarm(userId, e.event_id)
          }
          state.update(CusumState(s))
          out.iterator
      }
  }

  /** Custom stateful sessionization: per-user GroupState accumulates the
    * open session; a gap larger than `gapMillis` (or state timeout in
    * streaming) closes it. Demonstrates KeyValueGroupedDataset +
    * flatMapGroupsWithState for semantics session_window can't express
    * (e.g. per-session derived metrics mid-stream). */
  def sessionizeWithState(events: Dataset[Ev], gapMillis: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // batch mode: all of a user's events arrive in one call
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 0, 0.0)
            else if (t - st.last > gapMillis) {
              out += Session(userId, new java.sql.Timestamp(st.start),
                new java.sql.Timestamp(st.last), st.n, st.sum)
              st = SessionState(t, t, 0, 0.0)
            }
            st = st.copy(last = t, n = st.n + 1, sum = st.sum + e.value)
          }
          if (st != null) {
            out += Session(userId, new java.sql.Timestamp(st.start),
              new java.sql.Timestamp(st.last), st.n, st.sum)
            state.remove()
          }
          out.iterator
      }
  }
}
