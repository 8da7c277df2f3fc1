package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Batch event analytics: gap sessionization, ordered funnels, cohort
  * retention — hand-computed fixtures. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // events: (user, event_id, ts-seconds, type, value)
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.map { case (u, id, t, ty, v) => (u, id, ts(t), ty, v) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")

  // --------------------------------------------------- sessionize

  test("sessionize splits on gaps and counts sessions per user") {
    // user 1: events at 0s, 100s (same session, gap 100 <= 600),
    // then 1000s (new session, gap 900 > 600)
    // user 2: single event
    val df = ev(
      (1L, 1L, 0L, "view", 1.0), (1L, 2L, 100L, "view", 2.0),
      (1L, 3L, 1000L, "view", 3.0), (2L, 4L, 50L, "view", 4.0))
    val got = EventAnalytics.sessionize(df, "user_id", "ts", "event_id", 600L)
      .select(col("user_id"), col("event_id"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L))
  }

  test("sessionSummary aggregates bounds, counts, and value") {
    val df = ev(
      (1L, 1L, 0L, "view", 1.0), (1L, 2L, 100L, "view", 2.0),
      (1L, 3L, 1000L, "view", 4.0))
    val got = EventAnalytics.sessionSummary(
        df, "user_id", "ts", "event_id", "value", 600L)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    got shouldBe Array(
      (1L, 1L, 0L, 100000000L, 2L, 3.0),
      (1L, 2L, 1000000000L, 1000000000L, 1L, 4.0))
  }

  test("sessionize tie-breaks equal timestamps by event id") {
    // both events at t=0: one session, deterministic regardless of
    // input order
    val df = ev((1L, 2L, 0L, "view", 1.0), (1L, 1L, 0L, "view", 1.0))
    val got = EventAnalytics.sessionize(df, "user_id", "ts", "event_id", 600L)
      .select(col("event_id"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 1L), (2L, 1L))
  }

  // ------------------------------------------------------- funnel

  test("funnel counts users reaching each ordered step") {
    val df = ev(
      // user 1 completes view(10) -> click(20) -> purchase(30)
      (1L, 1L, 10L, "view", 0.0), (1L, 2L, 20L, "click", 0.0),
      (1L, 3L, 30L, "purchase", 0.0),
      // user 2: click BEFORE view -> stops at view
      (2L, 4L, 5L, "click", 0.0), (2L, 5L, 10L, "view", 0.0),
      // user 3: view then click, no purchase
      (3L, 6L, 1L, "view", 0.0), (3L, 7L, 2L, "click", 0.0),
      // user 4: never views
      (4L, 8L, 1L, "purchase", 0.0))
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    got shouldBe Array((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L))
  }

  test("funnel requires strictly-after ordering (same-ts does not count)") {
    val df = ev(
      (1L, 1L, 10L, "view", 0.0), (1L, 2L, 10L, "click", 0.0))
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .orderBy("step_idx").collect().map(r => (r.getInt(0), r.getLong(2)))
    got shouldBe Array((1, 1L), (2, 0L))
  }

  // ----------------------------------------------------- resampleDaily

  test("resampleDaily fills gaps with zero counts and carries value forward") {
    val day = 86400L
    // user 1: day 0 (two events, sum 3), day 3 (one event, 7) -> gap
    // days 1-2 synthesized; user 2: single day, no gaps
    val df = ev(
      (1L, 1L, 10L, "view", 1.0), (1L, 2L, 20L, "view", 2.0),
      (1L, 3L, 3 * day + 5L, "view", 7.0),
      (2L, 4L, day + 1L, "view", 9.0))
    val got = EventAnalytics.resampleDaily(df, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getDouble(4)))
    got shouldBe Array(
      (1L, 0L, 2L, Some(3.0), 3.0),
      (1L, 1L, 0L, None, 3.0),      // gap: zero events, value carried
      (1L, 2L, 0L, None, 3.0),
      (1L, 3L, 1L, Some(7.0), 7.0), // fresh observation replaces carry
      (2L, 1L, 1L, Some(9.0), 9.0))
  }

  // ------------------------------------- batch vs streaming parity

  test("batch sessionize agrees with the streaming session_window form") {
    // the same gap over the real events table must produce identical
    // sessions from EventAnalytics (lag/cumsum) and EventPipeline
    // (session_window, run in batch mode). Boundary semantics differ
    // only at diff == gap exactly (lag rule merges, session_window
    // splits) — measure-zero on microsecond event data.
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val batch = graft.operators.EventAnalytics.sessionSummary(
        events, "user_id", "ts", "event_id", "value", gapSeconds = 7200L)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val stream = graft.streaming.EventPipeline.sessions(
        events, gap = "7200 seconds", streaming = false)
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    batch shouldBe stream
    batch.size should be > 100
  }

  // ---------------------------------------------------- retention

  test("ewma equals the sequential recurrence and is partition-invariant") {
    // s1 = x1; st = 0.25*xt + 0.75*s(t-1) in (ts, id) order
    val rows = Seq(
      ("u1", 3L, 2L, 30.0), ("u1", 1L, 1L, 10.0), ("u1", 2L, 3L, 20.0),
      ("u2", 5L, 4L, 100.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def run(parts: Int) = graft.operators.EventAnalytics
      .ewma(df.repartition(parts), "user_id", "ts", "event_id", "value",
        alpha = 0.25)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val got = run(1)
    got shouldBe run(5)
    val s1 = 10.0
    val s2 = 0.25 * 20.0 + 0.75 * s1
    val s3 = 0.25 * 30.0 + 0.75 * s2
    got("u1") shouldBe ((3L, s3))
    got("u2") shouldBe ((1L, 100.0)) // singleton series: ewma = x1
  }

  test("kaplanMeier: textbook curve — risk sets, censoring, terminal " +
      "extinction at exactly 0") {
    import spark.implicits._
    // durations/events: (1,T) (2,censored) (3,T) (3,T) (4,censored)
    // (5,T) — S: 5/6 at t=1, flat through the censor, 5/12 at t=3,
    // flat again, 0 at t=5 (risk set exhausted)
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    val got = EventAnalytics.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe Seq(
      (1L, 6L, 1L, 0L), (2L, 5L, 0L, 1L), (3L, 4L, 2L, 0L),
      (4L, 2L, 0L, 1L), (5L, 1L, 1L, 0L))
    got(0).getDouble(4) shouldBe (5.0 / 6.0) +- 1e-12
    got(1).getDouble(4) shouldBe (5.0 / 6.0) +- 1e-12
    got(2).getDouble(4) shouldBe (5.0 / 12.0) +- 1e-12
    got(3).getDouble(4) shouldBe (5.0 / 12.0) +- 1e-12
    got(4).getDouble(4) shouldBe 0.0 // exact, never ln(0)
    // partitioning invariance
    EventAnalytics.kaplanMeier(df.repartition(4), col("dur"), col("ev"))
      .orderBy("t").collect().map(_.getDouble(4)).toSeq shouldBe
      got.map(_.getDouble(4)).toSeq
  }

  test("kaplanMeier at k = 1000 distinct durations: the r7 restatement " +
      "(two-pass partition-offset prefix, no single-row pack) stays " +
      "exact against a sequential reference fold") {
    import spark.implicits._
    // 4000 subjects over 1000 distinct durations — the raw-granularity
    // misuse the old collect_list shape packed through ONE row; the
    // restated operator must range-partition it and still match the
    // sequential product to reassociation noise (ulps)
    val subj = (0 until 4000).map(i =>
      (i.toLong % 1000, i % 3 != 0))
    val df = subj.toDF("dur", "ev").repartition(8)
    val got = EventAnalytics.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
    got.length shouldBe 1000
    // sequential reference: exact risk sets, left-fold survival product
    val perT = subj.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toMap
    var atRisk = 4000L
    var surv = 1.0
    for ((r, t) <- got.zipWithIndex) {
      val (d, c) = perT(t.toLong)
      r.getLong(0) shouldBe t.toLong
      r.getLong(1) shouldBe atRisk // exact integer risk set
      r.getLong(2) shouldBe d
      r.getLong(3) shouldBe c
      if (d > 0) surv *= 1.0 - d.toDouble / atRisk
      // partition-boundary reassociation moves the ln-sum by last
      // ulps only — far inside the gate's micro-rounding
      r.getDouble(4) shouldBe surv +- (math.abs(surv) * 1e-9 + 1e-15)
      atRisk -= d + c
    }
  }

  test("cohortRetention buckets by first-activity week") {
    val wk = 604800L // seconds per week
    val df = ev(
      // users 1,2 start week 0; user 1 returns week 1; user 3 starts week 1
      (1L, 1L, 10L, "view", 0.0), (2L, 2L, 20L, "view", 0.0),
      (1L, 3L, wk + 5L, "view", 0.0), (3L, 4L, wk + 10L, "view", 0.0))
    val got = EventAnalytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    got shouldBe Array(
      (0L, 0L, 2L, 2L, 1.0), // cohort week 0: both active at offset 0
      (0L, 1L, 1L, 2L, 0.5), // user 1 retained into week 1
      (1L, 0L, 1L, 1L, 1.0)) // cohort week 1: user 3
  }

  test("markovTransitions counts ordered successors per user") {
    // user 1: a->b->a->b ; user 2: b->a ; user 3: a->c
    val df = ev((1L, 1L, 10L, "a", 0.0), (1L, 2L, 20L, "b", 0.0),
      (1L, 3L, 30L, "a", 0.0), (1L, 4L, 40L, "b", 0.0),
      (2L, 5L, 10L, "b", 0.0), (2L, 6L, 20L, "a", 0.0),
      (3L, 7L, 10L, "a", 0.0), (3L, 8L, 20L, "c", 0.0))
    val got = EventAnalytics
      .markovTransitions(df, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect()
    // from a: a->b twice (user 1), a->c once (user 3) -> 2/3, 1/3
    got shouldBe Array(
      ("a", "b", 2L, 3L, 2.0 / 3.0),
      ("a", "c", 1L, 3L, 1.0 / 3.0),
      ("b", "a", 2L, 2L, 1.0))
    // probabilities sum to 1 within each from_type
    val sums = EventAnalytics
      .markovTransitions(df, "user_id", "ts", "event_id", "event_type")
      .groupBy("from_type").agg(sum("prob")).as[(String, Double)]
      .collect().toMap
    sums.values.foreach(_ shouldBe 1.0 +- 1e-12)
  }

  test("markovTransitions breaks timestamp ties by event_id") {
    val df = ev((1L, 2L, 10L, "b", 0.0), (1L, 1L, 10L, "a", 0.0))
    EventAnalytics
      .markovTransitions(df, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Long, Double)].collect() shouldBe
      Array(("a", "b", 1L, 1L, 1.0))
  }

  test("distinctSoFar: first-day reduction and running total") {
    val day = 86400L
    val df = ev(
      (1L, 1L, 0L, "a", 0.0), (1L, 2L, 10L, "b", 0.0), // day 0: 2 new
      (1L, 3L, day + 5L, "a", 0.0),                     // day 1: repeat
      (1L, 4L, 2 * day, "c", 0.0),                      // day 2: 1 new
      (2L, 5L, day, "a", 0.0))
    val got = EventAnalytics
      .distinctSoFar(df, "user_id", "ts", "event_type")
      .orderBy("user_id", "day")
      .select(col("user_id"), col("new_types"), col("distinct_so_far"))
      .as[(Long, Long, Long)].collect()
    // day-1 repeat produces NO row; totals stay monotone
    got shouldBe Array((1L, 2L, 2L), (1L, 1L, 3L), (2L, 1L, 1L))
  }

  test("tokenBucket: burst drains, hourly refill floor-accrues") {
    // cap 3, cost 1, refill 1/hour: 0s/1s/2s accepted (tok 0), 3s
    // rejected (gained 0); at 7200s the elapsed-from-LAST-EVENT is
    // 7197s -> floor gains 1 token, accepted, final tok 0
    val df = ev(
      (1L, 1L, 0L, "a", 0.0), (1L, 2L, 1L, "a", 0.0),
      (1L, 3L, 2L, "a", 0.0), (1L, 4L, 3L, "a", 0.0),
      (1L, 5L, 7200L, "a", 0.0))
    val got = EventAnalytics.tokenBucket(df, "user_id", "ts",
      "event_id", 3L, 1L, 1L).head()
    (got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      .shouldBe((5L, 4L, 1L, 0L))
    // 59 min 59 s refills NOTHING (floor, not round)
    val edge = ev((2L, 1L, 0L, "a", 0.0), (2L, 2L, 1L, "a", 0.0),
      (2L, 3L, 2L, "a", 0.0), (2L, 4L, 3599L, "a", 0.0))
    val g2 = EventAnalytics.tokenBucket(edge, "user_id", "ts",
      "event_id", 3L, 1L, 1L).head()
    (g2.getLong(2), g2.getLong(3)) shouldBe ((3L, 1L))
  }

  test("attribution: integer milli-credits, remainder to first touch") {
    // user 1: touches a@0, b@10, a@20, conversion @30 (n=3:
    // 333 each + 1 remainder to the a@0 touch), second conversion @15
    // sees only a@0, b@10 (n=2: 500 each)
    val df = ev(
      (1L, 1L, 0L, "a", 0.0), (1L, 2L, 10L, "b", 0.0),
      (1L, 3L, 20L, "a", 0.0),
      (1L, 4L, 30L, "purchase", 0.0), (1L, 5L, 15L, "purchase", 0.0))
    val got = EventAnalytics
      .attribution(df, "user_id", "ts", "event_type", "purchase",
        "event_id")
      .orderBy("channel")
      .as[(String, Long, Long, Long, Long)].collect()
    // a: pairs = a@0,a@20 (conv30) + a@0 (conv15) = 3;
    //    first: conv30->a@0, conv15->a@0 = 2; last: conv30->a@20 = 1
    //    credit: conv30 a@0 333+1(IS rk1? yes rem 1)=334, a@20 333,
    //            conv15 a@0 500+0 rem(1000%2=0) = 500 -> 1167
    // b: pairs 2; first 0; last conv15->b@10 = 1;
    //    credit: conv30 b@10 333, conv15 b@10 500 -> 833
    got shouldBe Array(
      ("a", 3L, 2L, 1L, 1167L),
      ("b", 2L, 0L, 1L, 833L))
    // every conversion's credit sums to exactly 1000
    (1167L + 833L) shouldBe 2000L
  }

  test("decayedSum: exact power-of-two decay, shift budget, ref cutoff") {
    import org.apache.spark.sql.functions.{col, lit}
    val h = 1000000L // 1s half-life in micros
    val mk = (t: Long, v: Double) =>
      ("k", new java.sql.Timestamp(t / 1000), v)
    val df = Seq(
      mk(10000000L, 8.0),  // age 0 -> 8
      mk(9000000L, 8.0),   // age 1 hl -> 4
      mk(7500000L, 8.0),   // age 2.5 hl -> floor 2 -> 2
      mk(11000000L, 99.0)) // after ref: excluded
      .toDF("k", "ts", "v")
    val got = EventAnalytics.decayedSum(df, Seq("k"), "ts", "v",
      refMicros = 10000000L, halfLifeMicros = h).head()
    got.getLong(1) shouldBe 3L
    got.getDouble(2) shouldBe (8.0 + 4.0 + 2.0)
    // ancient event: k > 62 contributes exactly zero
    val old = Seq(mk(10000000L, 1.0),
      mk(10000000L - 70 * h, 512.0)).toDF("k", "ts", "v")
    EventAnalytics.decayedSum(old, Seq("k"), "ts", "v",
      refMicros = 10000000L, halfLifeMicros = h)
      .head().getDouble(2) shouldBe 1.0
  }
}
