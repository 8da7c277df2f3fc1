package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered per-key time-series folds — the smoothing/anomaly family
  * the event tables feed (monitoring rollups, sensor denoising,
  * per-user engagement trends). The recurrences are inherently
  * sequential per key, so the engine materializes each key's ordered
  * value array ONCE (a sort-free collect_list over a single grouping
  * shuffle, sorted in-array) and folds it with the codegen'd
  * `aggregate` higher-order function — per-key arrays are bounded by
  * per-key cardinality (events per user), NOT corpus size; keys fold
  * in parallel. For keys with unbounded history, window the input
  * first (the q92 gap-fill discipline) — documented trade, same as
  * every per-key sequential recurrence.
  */
object TimeSeries {

  /** Exponentially-weighted moving average per key:
    * y_i = alpha·x_i + (1−alpha)·y_{i−1}, y_0 = first value (the
    * standard adjust=false initialization). Returns one row per key:
    * (keys…, n_obs, last_value, ewma). Order inside a key follows
    * `orderCols` — pass a total order (e.g. ts, event_id) so the fold
    * is deterministic: identical fold order makes the float result
    * bit-stable under any partitioning (and cross-engine, which is
    * what lets a DuckDB oracle replay it exactly).
    *
    * alpha should be an exactly-representable binary fraction (0.25,
    * 0.5, 0.125…) when cross-engine bit-equality matters. */
  def ewma(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
      valueCol: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0,1]")
    val ordKey = struct(orderCols: _*)
    val seq = df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(ordKey.as("o"),
        valueCol.cast("double").as("x")))).as("s"))
      .select(keys.map(col) :+
        transform(col("s"), e => e.getField("x")).as("xs"): _*)
    seq.select(keys.map(col) :+
      size(col("xs")).cast("long").as("n_obs") :+
      element_at(col("xs"), -1).as("last_value") :+
      aggregate(slice(col("xs"), lit(2), size(col("xs"))),
        element_at(col("xs"), 1),
        (acc, x) => x * lit(alpha) + acc * lit(1.0 - alpha)).as("ewma"): _*)
  }

  /** Per-key simple anomaly census on the same ordered fold: counts
    * observations whose absolute jump from the PREVIOUS observation
    * exceeds `tau` (a map of the ordered array, no second shuffle).
    * Returns (keys…, n_obs, n_jumps). Integer output — cross-engine
    * exact regardless of float noise in the values themselves. */
  def jumpCensus(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
      valueCol: Column, tau: Double): DataFrame = {
    val ordKey = struct(orderCols: _*)
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(ordKey.as("o"),
        valueCol.cast("double").as("x")))).as("s"))
      .select(keys.map(col) :+
        size(col("s")).cast("long").as("n_obs") :+
        size(filter(
          zip_with(
            transform(col("s"), e => e.getField("x")),
            slice(transform(col("s"), e => e.getField("x")), lit(2),
              size(col("s"))),
            (prev, cur) => abs(cur - prev) > lit(tau)),
          b => b)).cast("long").as("n_jumps"): _*)
  }
}
