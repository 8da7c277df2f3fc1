package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing via `transformWithState` (Spark 4's
  * StatefulProcessor API — the successor to flatMapGroupsWithState,
  * which EventPipeline.sessionizeWithState demonstrates): per-key
  * running totals whose state lives in the state store as NAMED typed
  * state variables instead of one opaque case-class blob.
  *
  * Why this API matters at scale: named state composes (add a state
  * variable without rewriting the blob schema), supports per-variable
  * TTL (`TTLConfig`) so abandoned keys expire without a watermark
  * dance, and the state store can evolve each variable independently.
  * State per key here is two fixed-width values — bounded regardless
  * of event volume.
  *
  * Emission: one (user, n_events, total_value) row per key per
  * micro-batch that touched it (Update mode) — the streaming analog of
  * an incrementally-maintained running aggregate (the batch form is
  * IncrementalAgg.mergeDelta).
  */
object StatefulTotals {

  final case class UserEvent(user_id: Long, value: Double)
  final case class RunningTotal(user_id: Long, n_events: Long,
      total_value: Double)

  /** Per-key running count + sum with named ValueState variables. */
  class TotalsProcessor
      extends StatefulProcessor[Long, UserEvent, RunningTotal] {
    @transient private var count: ValueState[Long] = _
    @transient private var total: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig.NONE)
      total = getHandle.getValueState[Double]("total", Encoders.scalaDouble,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      var c = if (count.exists()) count.get() else 0L
      var t = if (total.exists()) total.get() else 0.0
      rows.foreach { e => c += 1L; t += e.value }
      count.update(c)
      total.update(t)
      Iterator.single(RunningTotal(key, c, t))
    }
  }

  /** Wire the processor over a stream (or batch frame — Spark runs
    * transformWithState in batch too, one "micro-batch" over all
    * data). */
  def runningTotals(events: Dataset[UserEvent]): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
