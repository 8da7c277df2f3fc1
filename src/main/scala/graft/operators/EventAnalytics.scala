package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics: gap-based sessionization, ordered-step
  * funnels, and cohort retention — the OLAP half of the engine's event
  * processing (the streaming half lives in streaming/EventPipeline; q28
  * computes sessions with watermarked state, this computes them over the
  * full history).
  *
  * All time arithmetic is integer microseconds (unix_micros here,
  * epoch_us in the DuckDB oracle) — never float seconds — so session
  * boundaries, funnel orderings, and week bucketing compare exactly
  * across engines.
  *
  * Scale design (100 TB of events): every operator here shuffles by
  * user_id exactly once and then works within the per-user partition —
  * windows are PARTITIONED BY user (parallel across users, sequential
  * only within one user's events, which is the semantic grain), funnels
  * are per-step shuffle joins on the user key (bounded by the step
  * count), retention is two hash aggregations. Nothing ever sorts or
  * windows the global event stream.
  */
object EventAnalytics {

  /** Per-event session assignment: a new session starts when the gap to
    * the user's previous event exceeds `gapSeconds`. Adds `__us` (event
    * micros) and `session_idx` (1-based per-user session counter).
    * Ties order deterministically by (ts, idCol). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull
          || col("__us") - lag(col("__us"), 1).over(w) > gapSeconds * 1000000L,
          1).otherwise(0))
      .withColumn("session_idx", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Session summary table: one row per (user, session) with bounds,
    * event count, and summed `valueCol`. */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String, gapSeconds: Long): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col("__us")).as("start_us"), max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))

  /** Ordered-step funnel: how many users reached step i, where step i
    * must occur STRICTLY after that user's first completion of step
    * i−1. Output: (step_idx, step, n_users), one row per step.
    *
    * Each stage is one filter + shuffle join on the user key + min
    * aggregate — the stage count bounds the job, and no stage ever
    * carries more than one row per qualifying user. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = unix_micros(col(tsCol))
    val e = events.select(col(userCol), us.as("__us"), col(typeCol))
    // per-user arrival time of each step, chained on strictly-after
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = e.filter(col(typeCol) === step)
        val chained = prev match {
          case None => hits
          case Some(p) => hits.join(p, Seq(userCol))
            .filter(col("__us") > col("__t"))
        }
        Some(chained.groupBy(col(userCol)).agg(min(col("__us")).as("__t")))
    }.flatten
    stages.zip(steps).zipWithIndex.map { case ((stage, step), i) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step_idx"),
          lit(step).as("step"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Per-event trailing time-window aggregates: for every event, the
    * count and summed `valueCol` of the same user's events in the
    * trailing `windowSeconds` (RANGE frame on integer micros, current
    * row inclusive) — the moving-window complement of q48's ROWS-frame
    * family. Tied timestamps all see the full tie group (RANGE
    * semantics, identical in any engine). One shuffle by user. */
  def trailingWindow(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col("__us"))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .select(col(idCol), col(userCol), col("__us").as("us"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col(valueCol)).over(w).as("sum_trailing"))
  }

  /** Daily resample with gap filling and forward fill — the time-series
    * regularization step (metrics dashboards, per-entity training
    * series): one row per (entity, epoch day) over each entity's
    * [first, last] activity span, missing days synthesized with
    * n_events = 0 and the value carried forward from the last active
    * day (NULL before the first activity — nothing to carry).
    *
    * Day keys are integer epoch days (micros div 86400000000) — exact
    * integer arithmetic end to end, same rule as the session/cohort
    * operators above.
    *
    * Scale design (100 TB of events): the daily pre-aggregate shuffles
    * once by (entity, day); the calendar synthesis is a per-entity
    * sequence() explode bounded by each entity's own span (never a
    * global calendar cross join); the forward fill is a per-entity
    * window — parallel across entities, and the per-entity state is
    * one row per day of span, which is the output's own size.
    *
    * @return (entity, day, n_events, day_value, filled_value) where
    *         day_value is NULL on gap days and filled_value carries the
    *         last observed day_value forward
    */
  def resampleDaily(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val dayUs = 86400000000L
    // FLOOR division (pmod form), not `div` truncation: the two differ
    // for negative epoch micros, so a pre-1970 timestamp would bucket
    // one day later than DuckDB's `//` and break oracle day alignment
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val daily = events
      .select(col(entityCol), floorDivExact(us, dayUs).as("day"),
        col(valueCol).as("__v"))
      .groupBy(col(entityCol), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("day_value"))
    val spans = daily.groupBy(col(entityCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val calendar = spans
      .select(col(entityCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val fillW = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(daily, Seq(entityCol, "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(fillW))
  }

  /** Exponentially weighted moving average per entity — the smoothing
    * primitive behind drift/anomaly monitors: s_1 = x_1,
    * s_t = α·x_t + (1−α)·s_{t−1} over the entity's series in
    * (tsCol, tieCol, value) order — the value itself is the final
    * sort key, so the fold order stays fully deterministic even when
    * (tsCol, tieCol) pairs repeat (callers wanting a different
    * duplicate-timestamp policy should pass a unique tieCol, as q120
    * does with event_id). Computed as ONE deterministic left fold
    * over the entity's sorted value list (`aggregate` with the first
    * element as init), so the IEEE operation sequence is fixed — the
    * same fold DuckDB's list_reduce runs, giving bit-identical results
    * (the q95 array-fold equivalence, applied to a recursive metric no
    * window function can express).
    *
    * Scale: per-entity state is its own series (collect_list bounded
    * by the entity's event count — fine for user/device series; an
    * unbounded stream wants the transformWithState path instead).
    * Output: (entityCol, n_events, ewma). */
  def ewma(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    val xs = transform(
      array_sort(collect_list(struct(col(tsCol), col(tieCol),
        col(valueCol).cast("double").as("__v")))),
      s => s.getField("__v"))
    events.groupBy(col(entityCol))
      .agg(xs.as("__xs"))
      .select(col(entityCol),
        size(col("__xs")).cast("long").as("n_events"),
        aggregate(slice(col("__xs"), lit(2), size(col("__xs")) - 1),
          element_at(col("__xs"), 1),
          (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc).as("ewma"))
  }

  /** Exact floor division of epoch micros by a positive bucket width:
    * the pmod form makes the numerator an exact multiple of d (floor
    * semantics for negatives, matching DuckDB's `//`), and the divide
    * runs in DECIMAL — Column `/` on longs is DOUBLE division, which
    * loses exactness once |us| exceeds 2^53 (a one-bucket shift past
    * ~year 2255). Exact multiples divide exactly in decimal at any
    * magnitude; the final cast truncates an already-integral value. */
  private def floorDivExact(us: Column, d: Long): Column =
    ((us - pmod(us, lit(d))).cast("decimal(38,0)") / lit(d)).cast("long")

  /** Epoch week bucket (exact floor division, mirrors DuckDB's `//`). */
  private def epochWeek(us: Column): Column =
    floorDivExact(us, 604800000000L)

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958) — the
    * retention/lifetime curve with right-censoring done correctly
    * (cohortRetention's share curve treats every disappearance as
    * churn; KM keeps censored subjects in the risk set up to their
    * last observation). Input: one row per subject with an integral
    * duration and an event flag (false = censored at that duration).
    *
    * Per distinct duration t: d_t events, c_t censorings, risk set
    * n_t = total − Σ_{t'<t}(d+c); Ŝ(t) = Π_{t'≤t,d>0}(1 − d/n).
    * All counts are exact integers. The survival product is computed
    * as exp of a cumulative IN-T-ORDER sum of ln(1 − d/n) terms
    * (zero where d = 0) — exactly a SQL running-window sum, so the
    * oracle restates it term for term in the same order and gate
    * rows emit it micro-rounded (the q60 pattern).
    *
    * Scale: one duration-keyed aggregate over subjects, then the SAME
    * two-pass distributed prefix scheme as Evaluation.rocAuc over the
    * range-partitioned per-time table: per-partition cumulative
    * windows plus a partition-count-bounded offset table — never a
    * single-partition window, never a whole-table pack into one row.
    * The risk-set prefix is exact longs (association-free); the
    * ln-term prefix reassociates double additions at partition
    * boundaries, which moves Ŝ(t) by at most last-ulps — the same
    * noise class as cross-engine libm exp/ln, absorbed by the gate's
    * micro-rounding (q60 rule). A caller passing raw-microsecond
    * durations (ignoring the granularity contract) now gets a
    * partitioned k-row plan instead of a driver-sized single-row
    * pack — misuse degrades to a bigger shuffle, not a blown task.
    *
    * @return per duration: (t, n_risk, d, c, survival) */
  def kaplanMeier(subjects: DataFrame, durationCol: Column,
      eventCol: Column): DataFrame = {
    val spark = subjects.sparkSession
    val perT = subjects
      .select(durationCol.cast("long").as("t"),
        when(eventCol, 1L).otherwise(0L).as("__e"))
      .groupBy(col("t"))
      .agg(sum(col("__e")).as("d"),
        sum(lit(1L) - col("__e")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // force the duration-keyed aggregate ONCE before range
    // partitioning: RangePartitioner's sampling pass is a separate
    // job over the child, so an uncached perT would run the big
    // subjects aggregate twice (measured 6× on the q372 gate row)
    perT.count()
    val base = perT.repartitionByRange(col("t"))
      .sortWithinPartitions(col("t"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // pass 1 offsets: per-partition (d+c) totals, scanned on the
    // driver — bounded by the partition COUNT, not the data
    val dcTotals = base.groupBy(col("__pid"))
      .agg(sum(col("d") + col("c")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val nTotal = dcTotals.map(_._2).sum
    val dcOff = spark.createDataFrame(
      dcTotals.map(_._1).zip(dcTotals.scanLeft(0L)(_ + _._2).init)
        .toIndexedSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n_risk = total − Σ_{t'<t}(d+c): EXCLUSIVE prefix, so subtract
    // the row's own mass from the inclusive window sum
    val risked = base.join(broadcast(dcOff), Seq("__pid"))
      .withColumn("n_risk",
        lit(nTotal) - (sum(col("d") + col("c")).over(w) + col("__off")
          - col("d") - col("c")))
      // d < n_risk guards the TERMINAL time (risk set exhausted —
      // survival is exactly 0 there, emitted directly below, and no
      // later rows exist to read the term), so ln(0) never evaluates
      // on either engine; the oracle restates the same CASE
      .withColumn("__term",
        when(col("d") > 0L && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double"))).otherwise(lit(0.0)))
    // pass 2 offsets: per-partition ln-term totals, scanned in
    // partition order (sequential left-fold across partitions)
    val termTotals = risked.groupBy(col("__pid"))
      .agg(sum(col("__term")).as("s"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val termOff = spark.createDataFrame(
      termTotals.map(_._1).zip(termTotals.scanLeft(0.0)(_ + _._2).init)
        .toIndexedSeq).toDF("__pid", "__toff")
    val res = risked.join(broadcast(termOff), Seq("__pid"))
      .withColumn("survival",
        when(col("d") === col("n_risk"), lit(0.0)).otherwise(
          exp(sum(col("__term")).over(w) + col("__toff"))))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        col("survival"))
    // eager localCheckpoint materializes the k-row result BEFORE the
    // persisted base is released (k = distinct durations — bounded by
    // the granularity contract, and merely "larger" on misuse)
    val out = res.localCheckpoint(true)
    base.unpersist()
    perT.unpersist()
    out
  }

  /** Cohort retention: users grouped by first-activity week (cohort);
    * for each (cohort_week, week_offset), the distinct active users and
    * their share of the cohort. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val weeks = events
      .select(col(userCol), epochWeek(unix_micros(col(tsCol))).as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    weeks.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .withColumn("retention",
        col("n_active").cast("double") / col("n_cohort"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for each ordered pair of event types, how often type B
    * immediately follows type A in SOME user's stream, plus the
    * row-normalized transition probability (one integer division —
    * bit-exact cross-engine). Ties order by (ts, idCol) as everywhere
    * in this file.
    *
    * Scale: one user-partitioned lead() window + two hash aggregates;
    * output is bounded by |types|², not the data.
    * @return (from_type, to_type, cnt, row_total, prob) */
  def markovTransitions(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val rowT = pairs.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("row_total"))
    pairs.join(broadcast(rowT), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        col("row_total"),
        (col("cnt").cast("double") / col("row_total").cast("double"))
          .as("prob"))
  }

  /** Inter-arrival / burstiness statistics per user: gap count, exact
    * integer-microsecond gap sum, mean gap, the squared coefficient
    * of variation CV² = n·Σg²/(Σg)² − 1, and the Goh–Barabási
    * burstiness B = (σ−μ)/(σ+μ) = (√CV²−1)/(√CV²+1) ∈ (−1, 1) —
    * B→1 bursty, B→−1 metronomic. Σg² accumulates in DECIMAL(38,0)
    * (µs² passes BIGINT range beyond ~day-long gaps); the derived
    * doubles are rational+sqrt over exact sums, engine-identical.
    * One lag() window + one aggregate, both user-partitioned.
    * Users with fewer than 2 events produce no row.
    * @return (user, n_gaps, sum_gap_us, mean_gap_us, cv2, burstiness) */
  def interArrivalStats(events: DataFrame, userCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap")).as("sum_gap_us"),
        sum(col("__gap").cast("decimal(38,0)") *
          col("__gap").cast("decimal(38,0)")).as("__sg2"))
      .select(col(userCol), col("n_gaps"), col("sum_gap_us"),
        (col("sum_gap_us").cast("double") / col("n_gaps").cast("double"))
          .as("mean_gap_us"),
        ((col("n_gaps").cast("double") * col("__sg2").cast("double")) /
          (col("sum_gap_us").cast("double") *
            col("sum_gap_us").cast("double")) - lit(1.0)).as("cv2"))
      // clamp: float rounding can push an exactly-zero CV² a hair
      // negative, and sqrt(−ε) = NaN would poison the compare
      .withColumn("burstiness",
        (sqrt(greatest(col("cv2"), lit(0.0))) - lit(1.0)) /
          (sqrt(greatest(col("cv2"), lit(0.0))) + lit(1.0)))
  }

  /** Cumulative-distinct curve: for each user and day, how many NEW
    * event types appeared that day and how many distinct types the
    * user has seen up to and including it (the "vocabulary growth"
    * curve; days with no new types produce no row). Never counts
    * distinct-over-a-window (O(n²) state): each (user, type) reduces
    * to its FIRST day, then a per-user running sum over days.
    * @return (user, day, new_types, distinct_so_far) */
  def distinctSoFar(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val firsts = events
      .filter(col(typeCol).isNotNull)
      .groupBy(col(userCol), col(typeCol))
      .agg(min(to_date(col(tsCol))).as("day"))
      .groupBy(col(userCol), col("day"))
      .agg(count(lit(1)).as("new_types"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firsts.withColumn("distinct_so_far", sum(col("new_types")).over(w))
  }

  /** Token-bucket quota enforcement per key (the API-rate-limit
    * replay): a bucket of `capacity` tokens refills `refillPerHour`
    * tokens/hour (integer-floored on elapsed microseconds); each
    * event costs `costPerEvent` and is accepted iff enough tokens are
    * available. ALL state is integral and every intermediate stays
    * below 2^53 (double-exact): the refill floor(elapsed·refill/U)
    * is decomposed as wholeHours·refill + floor(remainder·refill/U)
    * — the identity elapsed = h·U + r makes the two forms equal —
    * with whole hours clamped at the full-bucket point (h ≥
    * capacity div refill + 1 ⇒ gained ≥ capacity), so accepted /
    * rejected censuses are bit-free cross-engine facts even for
    * year-long gaps. Integer budget: elapsed µs < 2^53 (timestamps
    * to year ~2255), remainder·refill ≤ 3.6e9·refill — hence the
    * refillPerHour ≤ 2e6 bound below. Per-key ordered fold (same
    * engineering as TimeSeries.ewma: one grouping shuffle, in-array
    * fold, keys parallel; per-key history bounds the array).
    * @return (key, n_events, n_accepted, n_rejected, final_tokens) */
  def tokenBucket(events: DataFrame, userCol: String, tsCol: String,
      tiebreakCol: String, capacity: Long, costPerEvent: Long,
      refillPerHour: Long): DataFrame = {
    require(capacity >= 0 && costPerEvent >= 1 && refillPerHour >= 0,
      s"bad params cap=$capacity cost=$costPerEvent refill=$refillPerHour")
    require(refillPerHour <= 2000000L && capacity <= (1L << 50),
      s"refill/capacity exceed the exact-integer budget " +
        s"(refill=$refillPerHour > 2e6 or cap=$capacity > 2^50)")
    val usPerHour = 3600000000L
    val seq = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("t"),
        col(tiebreakCol).as("tb")))).as("s"))
      .select(col(userCol),
        transform(col("s"), e => e.getField("t")).as("ts"))
    val cap = lit(capacity)
    val cost = lit(costPerEvent)
    def accept(avail: Column): Column = avail >= cost
    val init = struct(
      when(accept(cap), cap - cost).otherwise(cap).as("tok"),
      element_at(col("ts"), 1).as("pt"),
      when(accept(cap), 1L).otherwise(0L).as("acc"),
      when(accept(cap), 0L).otherwise(1L).as("rej"))
    // whole hours after which the bucket is certainly full again
    val hoursFull =
      if (refillPerHour == 0L) Long.MaxValue
      else capacity / refillPerHour + 1L
    def step(acc: Column, t: Column): Column = {
      val elapsed = t - acc.getField("pt")
      // exact floor div via mod-subtract; operands < 2^53 by the
      // require() budget, so the double division is exact (the q262
      // oracle's `//` mirror computes the undecomposed identity)
      def floorDiv(x: Column, d: Long): Column =
        ((x - pmod(x, lit(d))) / lit(d)).cast("long")
      val hours = floorDiv(elapsed, usPerHour)
      val rem = pmod(elapsed, lit(usPerHour))
      val gained = hours * lit(refillPerHour) +
        floorDiv(rem * lit(refillPerHour), usPerHour)
      val avail = when(hours >= lit(hoursFull), cap)
        .otherwise(least(cap, acc.getField("tok") + gained))
      struct(
        when(accept(avail), avail - cost).otherwise(avail).as("tok"),
        t.as("pt"),
        (acc.getField("acc") + when(accept(avail), 1L).otherwise(0L))
          .as("acc"),
        (acc.getField("rej") + when(accept(avail), 0L).otherwise(1L))
          .as("rej"))
    }
    val folded = aggregate(slice(col("ts"), lit(2), size(col("ts"))),
      init, (acc, t) => step(acc, t))
    seq.select(col(userCol),
      size(col("ts")).cast("long").as("n_events"),
      folded.getField("acc").as("n_accepted"),
      folded.getField("rej").as("n_rejected"),
      folded.getField("tok").as("final_tokens"))
  }

  /** Multi-touch attribution, fully integer: each conversion (an event
    * of `convType`) distributes exactly 1000 milli-credits over the
    * user's PRIOR touches — per-touch share 1000 div n, the remainder
    * 1000 mod n going to the EARLIEST touch (a deterministic largest-
    * remainder stand-in; no float credit ever exists). First-touch and
    * last-touch counts come from the same pair set. Conversions with
    * no prior touch are dropped (reported nowhere — count them
    * upstream if needed). The touch–conversion pair join is per-user;
    * per-user history is the scale bound (same contract as funnel).
    * @return per channel: (channel, n_touch_pairs, first_touch,
    *   last_touch, milli_credit) */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String,
      tiebreakCol: String): DataFrame = {
    val touches = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col(tsCol).as("__tt"),
        col(tiebreakCol).as("__ti"), col(typeCol).as("channel"))
    val convs = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(tsCol).as("__ct"),
        col(tiebreakCol).as("__ci"))
    val pairs = touches.join(convs,
      Seq("__u"), "inner").filter(col("__tt") < col("__ct"))
    val wc = Window.partitionBy(col("__u"), col("__ct"), col("__ci"))
    val ranked = pairs
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("__rk", row_number().over(
        wc.orderBy(col("__tt"), col("__ti"))))
    ranked
      .withColumn("__credit",
        expr("1000 div __n") +
          when(col("__rk") === 1, expr("1000 % __n")).otherwise(0L))
      .withColumn("__isFirst",
        when(col("__rk") === 1, 1L).otherwise(0L))
      .withColumn("__isLast",
        when(col("__rk") === col("__n"), 1L).otherwise(0L))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touch_pairs"),
        sum(col("__isFirst")).as("first_touch"),
        sum(col("__isLast")).as("last_touch"),
        sum(col("__credit")).as("milli_credit"))
  }

  /** Half-life-decayed engagement score at a reference time — the
    * recency-weighted feature every ranking/recommendation pipeline
    * derives: score(key) = Σ_events v · 2^(−age_halflives). Decay is
    * restricted to INTEGRAL half-life counts (age in whole half-life
    * units, floor), which makes every term EXACT float math — v is
    * scaled by a power of two (v / 2^k with 2^k an exact integer→
    * double), so only summation order matters, and the per-key sorted
    * fold (the q60 rule) pins that too. Events older than 62
    * half-lives contribute exactly 0 (the shift budget; they'd be
    * ~4.4e-19 of one unit anyway). One grouping shuffle; the fold
    * runs over per-key arrays (bounded by per-key cardinality — the
    * q92 windowing discipline applies to unbounded histories).
    * @param refMicros reference instant; events after it are excluded
    * @param halfLifeMicros half-life in microseconds (integer)
    * @return (keys…, n_events, decayed_sum) */
  def decayedSum(events: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, refMicros: Long, halfLifeMicros: Long)
      : DataFrame = {
    require(halfLifeMicros > 0, "halfLifeMicros must be positive")
    val keyCols = keys.map(col)
    val age = lit(refMicros) - unix_micros(col(tsCol))
    val k = floorDivExact(age, halfLifeMicros).cast("int")
    val term = when(k <= 62,
      col(valueCol).cast("double") /
        call_function("shiftleft", lit(1L), least(k, lit(62)))
          .cast("double"))
      .otherwise(lit(0.0))
    events.filter(unix_micros(col(tsCol)) <= refMicros)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_events"),
        aggregate(sort_array(collect_list(term)), lit(0.0),
          (acc, x) => acc + x).as("decayed_sum"))
  }
}
