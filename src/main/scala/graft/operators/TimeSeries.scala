package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Holt linear-trend smoothing per key (double exponential
    * smoothing, Holt 1957): level/trend recurrence
    *   l_i = α·x_i + (1−α)(l_{i−1} + t_{i−1})
    *   t_i = β(l_i − l_{i−1}) + (1−β)·t_{i−1}
    * initialized l_1 = x_1, t_1 = 0 — the one-step forecast is
    * l + t. Same engineering as [[ewma]]: one grouping shuffle, the
    * ordered array folded in-array with a STRUCT accumulator (level,
    * trend), α/β as exact binary fractions so the identical fold
    * order yields bit-identical doubles cross-engine (DuckDB replays
    * it with a list_reduce over (l, t) structs — reduce needs acc and
    * element to share a type, so elements enter as (x, 0) structs).
    * l_i appears twice in the step (in t_i too): both engines inline
    * the same pure expression, so the duplication is value-safe. */
  def holt(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
      valueCol: Column, alpha: Double = 0.25, beta: Double = 0.125)
      : DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0,1]")
    require(beta > 0.0 && beta <= 1.0, s"beta ($beta) must be in (0,1]")
    val ordKey = struct(orderCols: _*)
    val seq = df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(ordKey.as("o"),
        valueCol.cast("double").as("x")))).as("s"))
      .select(keys.map(col) :+
        transform(col("s"), e => e.getField("x")).as("xs"): _*)
    def step(acc: Column, x: Column): Column = {
      val lp = x * lit(alpha) +
        (acc.getField("l") + acc.getField("t")) * lit(1.0 - alpha)
      struct(lp.as("l"),
        ((x * lit(alpha) +
          (acc.getField("l") + acc.getField("t")) * lit(1.0 - alpha))
          - acc.getField("l")) * lit(beta) +
          acc.getField("t") * lit(1.0 - beta)).as("t")
    }
    val folded = aggregate(slice(col("xs"), lit(2), size(col("xs"))),
      struct(element_at(col("xs"), 1).as("l"), lit(0.0).as("t")),
      (acc, x) => step(acc, x))
    seq.select(keys.map(col) :+
      size(col("xs")).cast("long").as("n_obs") :+
      folded.getField("l").as("level") :+
      folded.getField("t").as("trend") :+
      (folded.getField("l") + folded.getField("t")).as("forecast1"): _*)
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

  /** Additive-free seasonal index per (key, season bucket): the
    * bucket's mean of `valueCol` relative to the key's overall mean,
    * index = (Σ_b · n_key) / (n_b · Σ_key) — the classical ratio-to-
    * moving-average seasonal factor with the trend term dropped
    * (right for stationary series; detrend upstream otherwise). Both
    * numerator and denominator are exact integer sums; the index is
    * one double expression. Two hash aggregates + a broadcast join.
    * @return (keys…, bucket, n, sum_v, s_index) */
  def seasonalIndex(df: DataFrame, keys: Seq[String], bucketCol: Column,
      valueCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val cells = df.filter(valueCol.isNotNull)
      .groupBy(keyCols :+ bucketCol.as("bucket"): _*)
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_v"))
    val tot = cells.groupBy(keyCols: _*)
      .agg(sum(col("n")).as("__tn"), sum(col("sum_v")).as("__ts"))
    cells.join(broadcast(tot), keys)
      .select(keyCols ++ Seq(col("bucket"), col("n"), col("sum_v"),
        ((col("sum_v").cast("double") * col("__tn").cast("double")) /
          (col("n").cast("double") * col("__ts").cast("double")))
          .as("s_index")): _*)
  }

  /** Lag-1 autocorrelation per key (the serial-dependence probe): the
    * Pearson correlation of (x_{i−1}, x_i) pairs in `orderCols` order,
    * from exact integer moments — squares/products accumulate in
    * DECIMAL(38,0) — with r derived in one rational+sqrt expression.
    * Degenerate keys (either side constant → zero variance) return
    * NULL rather than ±Inf. One lag window + one aggregate.
    * @return (keys…, n_pairs, r1) */
  def lagAutocorr(df: DataFrame, keys: Seq[String],
      orderCols: Seq[Column], valueCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    def d(c: String): Column = col(c).cast("double")
    val moments = df
      .withColumn("__y", valueCol.cast("long"))
      .withColumn("__x", lag(col("__y"), 1).over(w))
      .filter(col("__x").isNotNull)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x").cast("decimal(38,0)") *
          col("__x").cast("decimal(38,0)")).as("__sxx"),
        sum(col("__y").cast("decimal(38,0)") *
          col("__y").cast("decimal(38,0)")).as("__syy"),
        sum(col("__x").cast("decimal(38,0)") *
          col("__y").cast("decimal(38,0)")).as("__sxy"))
    moments.select(keyCols ++ Seq(col("n_pairs"),
      when((d("n_pairs") * d("__sxx") - d("__sx") * d("__sx")) > 0.0 &&
          (d("n_pairs") * d("__syy") - d("__sy") * d("__sy")) > 0.0,
        (d("n_pairs") * d("__sxy") - d("__sx") * d("__sy")) /
          (sqrt(d("n_pairs") * d("__sxx") - d("__sx") * d("__sx")) *
            sqrt(d("n_pairs") * d("__syy") - d("__sy") * d("__sy"))))
        .as("r1")): _*)
  }

  /** One-sided CUSUM drift detector (Page 1954) per key over an
    * INTEGRAL value column (cents): s_i = max(0, s_{i−1} + x_i − k),
    * alarm when s_i > h. The recurrence looks sequential, but the
    * reflection identity rewrites it closed-form:
    *   s_i = y_i − min(0, min_{j≤i} y_j),  y_i = Σ_{1..i}(x_j − k)
    * — a running sum and a running min, i.e. two frames of ONE
    * key-partitioned window. No collect_list, no fold: unlike
    * ewma/holt this scales to unbounded per-key history, and the
    * arithmetic is all BIGINT so any partitioning and any engine
    * agree exactly.
    *
    * @param k the slack (drift allowance) per observation, in value
    *          units; @param h the alarm threshold
    * @return per key: (keys…, n_obs, max_s, final_s, n_alarms) */
  def cusum(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
      valueCol: Column, k: Long, h: Long): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__d", valueCol.cast("long") - lit(k))
      .withColumn("__y", sum(col("__d")).over(w))
      .withColumn("__s", col("__y") - least(lit(0L), min(col("__y")).over(w)))
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_obs"),
        max(col("__s")).as("max_s"),
        // s_n = y_n − min(0, min_j y_j); y_n = Σd, and min over the
        // running-min column equals min over all prefixes — so the
        // last value needs no arg_max, just aggregates
        (sum(col("__d")) - least(lit(0L), min(col("__y"))))
          .as("final_s"),
        sum(when(col("__s") > h, 1L).otherwise(0L)).as("n_alarms"))
  }

  /** Mann–Kendall trend test per key, EXACT: S = Σ_{i<j} sign(x_j −
    * x_i) is a BIGINT pair sum, the tie-corrected variance is carried
    * as the integer var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (= 18·Var)
    * and only the z statistic divides. Pairwise self-join per key —
    * the right tool for MODEST per-key series (daily/hourly rollups,
    * n ≤ ~10⁴ ⇒ ≤ 5·10⁷ pairs/key); aggregate first, don't feed raw
    * events. Keys shuffle independently.
    * @param xCol ordering column (time), `yCol` the measured value —
    *   both integral.
    * @return per key: (keys…, n, s_stat, var18, z) */
  def mannKendall(df: DataFrame, keys: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val b = df.select(keyCols :+ xCol.as("__x") :+ yCol.as("__y"): _*)
    val a = keys.foldLeft(b.toDF())((d, k) =>
      d.withColumnRenamed(k, s"__l_$k"))
      .withColumnRenamed("__x", "__lx").withColumnRenamed("__y", "__ly")
    val pairCond = keys.map(k => col(s"__l_$k") === col(k))
      .reduce(_ && _) && col("__lx") < col("__x")
    val s = a.join(b, pairCond)
      .groupBy(keys.map(k => col(s"__l_$k").as(k)): _*)
      .agg(sum(when(col("__y") > col("__ly"), 1L)
        .when(col("__y") < col("__ly"), -1L).otherwise(0L))
        .as("s_stat"))
    val n = b.groupBy(keyCols: _*).agg(count(lit(1)).as("n"))
    val ties = b.groupBy(keyCols :+ col("__y"): _*)
      .agg(count(lit(1)).as("t"))
      .groupBy(keyCols: _*)
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
        .as("tie18"))
    n.join(ties, keys).join(s, keys)
      .select(keyCols :+ col("n") :+ col("s_stat") :+
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
          - col("tie18")).as("var18") :+
        when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") /
            sqrt((col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
              - col("tie18")).cast("double") / lit(18.0)))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") /
            sqrt((col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
              - col("tie18")).cast("double") / lit(18.0)))
          .otherwise(lit(0.0)).as("z"): _*)
  }

  /** Best single changepoint per key by least-squares cost (the one
    * binary-segmentation step; Scott & Knott style SSE split): for
    * each split after ordered position k, cost = SSE_left + SSE_right
    * with both SSEs derived from EXACT integer prefix sums (Σy, Σy²,
    * k) — the doubles are the same expression both engines evaluate,
    * and the argmin is a (cost, k) row_number, deterministic even
    * under cost ties. Rows order by (x, y) so duplicate-x keys still
    * get a stable prefix (fully-duplicate rows are interchangeable).
    * One ordered window + one partition window + one argmin filter —
    * linear per key, no pairwise work (contrast [[mannKendall]]).
    * @return per key: (keys…, n, split_k, split_x, cost) — split_k =
    *   size of the left segment, split_x its last x */
  def changepoint(df: DataFrame, keys: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__x"), col("__y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(keyCols: _*)
    val b = df.select(keyCols :+ xCol.as("__x") :+
        yCol.cast("long").as("__y"): _*)
      .withColumn("__k", row_number().over(
        Window.partitionBy(keyCols: _*)
          .orderBy(col("__x"), col("__y"))).cast("long"))
      .withColumn("__sl", sum(col("__y")).over(ord))
      .withColumn("__s2l", sum(col("__y") * col("__y")).over(ord))
      .withColumn("__st", sum(col("__y")).over(all))
      .withColumn("__s2t", sum(col("__y") * col("__y")).over(all))
      .withColumn("__n", count(lit(1)).over(all))
    def d(c: Column): Column = c.cast("double")
    val costed = b.filter(col("__k") < col("__n"))
      .withColumn("cost",
        (d(col("__s2l")) - d(col("__sl")) * d(col("__sl")) / d(col("__k")))
          + (d(col("__s2t") - col("__s2l"))
            - d(col("__st") - col("__sl")) * d(col("__st") - col("__sl"))
              / d(col("__n") - col("__k"))))
    costed
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(col("cost"), col("__k"))))
      .filter(col("__rn") === 1)
      .select(keyCols :+ col("__n").as("n") :+ col("__k").as("split_k")
        :+ col("__x").as("split_x") :+ col("cost"): _*)
  }

  /** Theil–Sen slope per key, EXACT median selection: every i<j pair
    * yields the rational slope (y_j−y_i)/(x_j−x_i); pairs sort by
    * (slope double, numerator, denominator) — a total order whose
    * leading key both engines compute as the same one IEEE division —
    * and the LOWER median (row (n+1)÷2) is returned with its integer
    * numerator/denominator. Same pairwise-self-join scale contract as
    * [[mannKendall]].
    * @return per key: (keys…, n_pairs, med_num, med_den, slope) */
  def theilSen(df: DataFrame, keys: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val b = df.select(keyCols :+ xCol.as("__x") :+ yCol.as("__y"): _*)
    val a = keys.foldLeft(b.toDF())((d, k) =>
      d.withColumnRenamed(k, s"__l_$k"))
      .withColumnRenamed("__x", "__lx").withColumnRenamed("__y", "__ly")
    val pairCond = keys.map(k => col(s"__l_$k") === col(k))
      .reduce(_ && _) && col("__lx") < col("__x")
    val pairs = a.join(b, pairCond)
      .select(keyCols ++ Seq(
        (col("__y") - col("__ly")).as("num"),
        (col("__x") - col("__lx")).as("den")): _*)
      .withColumn("slope",
        col("num").cast("double") / col("den").cast("double"))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("slope"), col("num"), col("den"))
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__np", count(lit(1))
        .over(Window.partitionBy(keyCols: _*)))
      // Column./ is always double division — DIV keeps it integral
      .filter(col("__rn") === expr("(__np + 1) div 2"))
      .select(keyCols :+ col("__np").as("n_pairs") :+
        col("num").as("med_num") :+ col("den").as("med_den") :+
        col("slope"): _*)
  }

  /** Linear interpolation of missing values per key — the imputation
    * step between LOCF and model fill: a NULL at time t between known
    * neighbors (t0,v0) and (t1,v1) becomes
    * v0 + (v1 − v0)·(t − t0)/(t1 − t0); a NULL before the first known
    * point backfills, after the last carries forward, and an all-NULL
    * key stays NULL. `tCol` must be numeric (unix micros) and a total
    * order within each key.
    *
    * Two frame-bounded windows (last-before / first-after with
    * ignoreNulls) per key — one grouping sort, no self-join. The
    * interpolation is four IEEE ops in pinned order on exact inputs,
    * so the filled value is bit-stable and oracle-reproducible (the
    * oracle restates the window as arg_max/arg_min self-joins — DuckDB
    * 1.0 has no IGNORE NULLS; see ORACLE_NOTES.md).
    * @return input columns + `<vCol>_filled` + `fill_kind`
    *   (observed/interp/locf/backfill/none) */
  def interpolateLinear(df: DataFrame, keys: Seq[String], tCol: String,
      vCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val known = when(col(vCol).isNotNull,
      struct(col(tCol).cast("double").as("t"),
        col(vCol).cast("double").as("v")))
    val before = Window.partitionBy(keyCols: _*).orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy(keyCols: _*).orderBy(col(tCol))
      .rowsBetween(1, Window.unboundedFollowing)
    df
      .withColumn("__p", last(known, ignoreNulls = true).over(before))
      .withColumn("__n", first(known, ignoreNulls = true).over(after))
      .withColumn(s"${vCol}_filled",
        when(col(vCol).isNotNull, col(vCol).cast("double"))
          .when(col("__p").isNotNull && col("__n").isNotNull,
            col("__p.v") + (col("__n.v") - col("__p.v")) *
              (col(tCol).cast("double") - col("__p.t")) /
              (col("__n.t") - col("__p.t")))
          .when(col("__p").isNotNull, col("__p.v"))
          .when(col("__n").isNotNull, col("__n.v")))
      .withColumn("fill_kind",
        when(col(vCol).isNotNull, lit("observed"))
          .when(col("__p").isNotNull && col("__n").isNotNull,
            lit("interp"))
          .when(col("__p").isNotNull, lit("locf"))
          .when(col("__n").isNotNull, lit("backfill"))
          .otherwise(lit("none")))
      .drop("__p", "__n")
  }
}
