package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Evaluation, FuzzyJoin, Graph, Layout,
  Quantiles, TimeSeries, RuntimeFilter, Sampling, Sketches, SpatialJoin}

/** Round-4 analytics / scale-infrastructure operators: explicit runtime
  * filters, exact distributed quantiles, event-stream batch analytics
  * (sessionization, funnels, cohort retention), stratified sampling,
  * fuzzy joins, and data-layout clustering — each oracle-checked.
  */
object QueriesAnalytics {

  // --------------------------------------------------------------- q68
  /** Bloom-pruned semi-join: lineitem rows whose part is size 1,
    * aggregated per returnflag. The bloom over the filtered part keys
    * prunes lineitem MAP-SIDE before any exchange; the exact rescue
    * semi-join makes the result identical to a plain IN-subquery —
    * which is exactly what the oracle runs. */
  private def q68Bloom(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val dim = Tables.load(s, dir, "part").filter(col("p_size") === 1)
    RuntimeFilter.bloomSemiJoin(li, "l_partkey", dim, "p_partkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q68Sql =
    """SELECT l_returnflag, count(*) AS n_items, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q69
  /** Exact distributed percentiles of l_extendedprice — the shuffle
    * carries one row per distinct value (never per row), cumulative
    * counts via the two-pass distributed prefix sum, rank lookup via a
    * broadcast of the six (q, rank) pairs. Both engines compute rank =
    * ceil(q * n) with identical double arithmetic — no reliance on
    * either engine's percentile internals. */
  private def q69Percentiles(s: SparkSession, dir: String): DataFrame =
    Quantiles.exactPercentiles(Tables.load(s, dir, "lineitem"),
        "l_extendedprice", Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99))
      .orderBy(col("q"))

  private val q69Sql =
    """WITH qs AS (
      |  SELECT unnest([CAST(0.01 AS DOUBLE), CAST(0.25 AS DOUBLE),
      |    CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE),
      |    CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
      |counts AS (
      |  SELECT l_extendedprice AS value, count(*) AS c
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
      |cum AS (
      |  SELECT value, c,
      |    sum(c) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts),
      |n AS (SELECT count(l_extendedprice) AS n FROM lineitem),
      |ranks AS (
      |  SELECT q,
      |    GREATEST(1, CAST(ceil(q * CAST(n.n AS DOUBLE)) AS BIGINT)) AS rank
      |  FROM qs, n)
      |SELECT r.q, r.rank, cum.value
      |FROM ranks r JOIN cum
      |  ON r.rank > cum.cum - cum.c AND r.rank <= cum.cum
      |ORDER BY q""".stripMargin

  // --------------------------------------------------------------- q70
  /** Gap-based batch sessionization of the events table (6 h gap): one
    * row per (user, session) with bounds, event count, and summed
    * value. One shuffle by user; windows are per-user — never a global
    * sort. The batch complement of q28's streaming sessions. */
  private def q70Sessions(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.sessionSummary(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "value", gapSeconds = 21600L)
      .orderBy(col("user_id"), col("session_idx"))

  private val q70Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
      |m AS (
      |  SELECT user_id, event_id, us, value,
      |    CASE WHEN lag(us) OVER w IS NULL
      |           OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0 END
      |      AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (
      |  SELECT user_id, us, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM m)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  min(us) AS start_us, max(us) AS end_us,
      |  count(*) AS n_events, sum(value) AS total_value
      |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin

  // --------------------------------------------------------------- q71
  /** Ordered-step funnel view -> click -> purchase: each step must
    * occur strictly after the user's first completion of the previous
    * step. Per-stage shuffle joins on the user key — never more than
    * one row per qualifying user per stage. */
  private def q71Funnel(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.funnel(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy(col("step_idx"))

  private val q71Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (
      |  SELECT user_id, min(us) AS t FROM e
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.us) AS t
      |  FROM e JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.us) AS t
      |  FROM e JOIN s2 ON s2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step_idx, 'view' AS step,
      |    (SELECT count(*) FROM s1) AS n_users
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
      |ORDER BY step_idx""".stripMargin

  // --------------------------------------------------------------- q72
  /** Cohort retention: users bucketed by first-activity epoch week;
    * for each (cohort_week, week_offset) the distinct active users and
    * their share of the cohort. Two hash aggregations — integer week
    * arithmetic, so the comparison is exact. */
  private def q72Retention(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.cohortRetention(Tables.load(s, dir, "events"),
        "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset"))

  private val q72Sql =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1),
      |sizes AS (
      |  SELECT cohort_week, count(*) AS n_cohort FROM cohorts GROUP BY 1),
      |act AS (
      |  SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
      |    count(*) AS n_active
      |  FROM weeks w JOIN cohorts c ON c.user_id = w.user_id GROUP BY 1, 2)
      |SELECT a.cohort_week, a.week_offset, a.n_active, s.n_cohort,
      |  CAST(a.n_active AS DOUBLE) / s.n_cohort AS retention
      |FROM act a JOIN sizes s ON s.cohort_week = a.cohort_week
      |ORDER BY a.cohort_week, a.week_offset""".stripMargin

  // --------------------------------------------------------------- q73
  /** Exact-count stratified sample: 20 docs per source in stable
    * md5-of-id order, via a bounded-heap top-k per stratum (map-side
    * state = 20 items per stratum per partition) — never a
    * row_number window over the full corpus. */
  private def q73Stratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.load(s, dir, "documents"),
        "doc_id", "source", nPerStratum = 20)
      .orderBy(col("source"), col("rk"))

  private val q73Sql =
    """WITH r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM r
      |WHERE rk <= 20 ORDER BY source, rk""".stripMargin

  // --------------------------------------------------------------- q74
  /** Fuzzy self-join on customer names: all pairs within Levenshtein
    * distance 1, found via deletion-neighborhood (FastSS) blocking —
    * the candidate join shuffles len+1 short variant keys per row,
    * never the n² cross product the oracle brute-forces. */
  private def q74Fuzzy(s: SparkSession, dir: String): DataFrame =
    FuzzyJoin.selfJoin(
        Tables.load(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", maxDist = 1)
      .orderBy(col("id1"), col("id2"))

  private val q74Sql =
    """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
      |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      | AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id1, id2""".stripMargin

  // --------------------------------------------------------------- q75
  /** Z-order keys over the synthetic customer grid cells (the q46
    * point recipe before its /10 scaling): the codegen'd magic-mask
    * interleave must equal the oracle's per-bit arithmetic sum — the
    * key the clustered-write layout sorts by (see Layout/LayoutSpec
    * for the write-side clustering property). */
  private def q75Zorder(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        (col("c_custkey") * 7 % 1000).as("cx"),
        (col("c_custkey") * 13 % 800).as("cy"))
    c.withColumn("z", Layout.zkey(col("cx"), col("cy"), bits = 10))
      .orderBy(col("z"), col("c_custkey"))
  }

  private val q75Sql = {
    val terms = (0 until 10).flatMap(i => Seq(
      s"((cx >> $i) & 1) * ${1L << (2 * i)}",
      s"((cy >> $i) & 1) * ${1L << (2 * i + 1)}"))
    s"""WITH c AS (
       |  SELECT c_custkey, (c_custkey * 7) % 1000 AS cx,
       |    (c_custkey * 13) % 800 AS cy
       |  FROM customer)
       |SELECT c_custkey, cx, cy,
       |  ${terms.mkString(" + ")} AS z
       |FROM c ORDER BY z, c_custkey""".stripMargin
  }

  // --------------------------------------------------------------- q76
  /** Point-in-polygon containment join (ST_Contains): deterministic
    * CCW triangles synthesized per nation, customer points from the
    * q46 recipe; the polygon side explodes into bbox grid cells and
    * the join shuffles once on the cell key — the oracle brute-forces
    * the cross join with the identical edge sign tests. */
  private def q76Pip(s: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey").cast("long")
    val ax = (k * 7 % 100 - 50).cast("double")
    val ay = (k * 11 % 80 - 40).cast("double")
    val w = (k % 7 + 5).cast("double")
    val h = (k % 5 + 5).cast("double")
    val polys = Tables.load(s, dir, "nation").select(col("n_nationkey"),
      array(struct(ax.as("x"), ay.as("y")),
        struct((ax + w).as("x"), ay.as("y")),
        struct(ax.as("x"), (ay + h).as("y"))).as("verts"))
    val c = col("c_custkey")
    val points = Tables.load(s, dir, "customer").select(c,
      ((c * 7) % 1000 - 500 ).cast("double")./(10.0).as("px"),
      ((c * 13) % 800 - 400).cast("double")./(10.0).as("py"))
    SpatialJoin.pointInPolygon(points, polys, "c_custkey", "n_nationkey",
        "px", "py", "verts", cellSize = 12.0)
      .groupBy(col("n_nationkey"))
      .agg(count(lit(1)).as("n_points"), min(col("c_custkey")).as("min_cust"),
        max(col("c_custkey")).as("max_cust"))
      .orderBy(col("n_nationkey"))
  }

  private val q76Sql =
    """WITH tri AS (
      |  SELECT n_nationkey,
      |    CAST((n_nationkey * 7) % 100 - 50 AS DOUBLE) AS ax,
      |    CAST((n_nationkey * 11) % 80 - 40 AS DOUBLE) AS ay,
      |    CAST(n_nationkey % 7 + 5 AS DOUBLE) AS w,
      |    CAST(n_nationkey % 5 + 5 AS DOUBLE) AS h
      |  FROM nation),
      |pts AS (
      |  SELECT c_custkey,
      |    CAST((c_custkey * 7) % 1000 - 500 AS DOUBLE) / 10.0 AS px,
      |    CAST((c_custkey * 13) % 800 - 400 AS DOUBLE) / 10.0 AS py
      |  FROM customer),
      |hits AS (
      |  SELECT t.n_nationkey, p.c_custkey
      |  FROM tri t JOIN pts p
      |    ON ((t.ax + t.w) - t.ax) * (p.py - t.ay)
      |         - (t.ay - t.ay) * (p.px - t.ax) >= 0
      |   AND (t.ax - (t.ax + t.w)) * (p.py - t.ay)
      |         - ((t.ay + t.h) - t.ay) * (p.px - (t.ax + t.w)) >= 0
      |   AND (t.ax - t.ax) * (p.py - (t.ay + t.h))
      |         - (t.ay - (t.ay + t.h)) * (p.px - t.ax) >= 0)
      |SELECT n_nationkey, count(*) AS n_points,
      |  min(c_custkey) AS min_cust, max(c_custkey) AS max_cust
      |FROM hits GROUP BY 1 ORDER BY n_nationkey""".stripMargin

  // --------------------------------------------------------------- q77
  /** Winsorized robust aggregation: l_extendedprice clamped to its
    * exact [p01, p99] global cutoffs (one-row broadcast from q69's
    * percentile machinery — the clamp itself is map-only), then
    * per-returnflag counts of clamped rows and the winsorized sum. */
  private def q77Winsorize(s: SparkSession, dir: String): DataFrame =
    Quantiles.winsorize(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice")),
        "l_extendedprice", lo = 0.01, hi = 0.99)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("__lo"), 1).otherwise(0))
          .as("n_lo_clamped"),
        sum(when(col("l_extendedprice") > col("__hi"), 1).otherwise(0))
          .as("n_hi_clamped"),
        sum(col("l_extendedprice_w")).as("sum_w"))
      .orderBy(col("l_returnflag"))

  private val q77Sql =
    """WITH counts AS (
      |  SELECT l_extendedprice AS value, count(*) AS c
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
      |cum AS (
      |  SELECT value, c,
      |    sum(c) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts),
      |n AS (SELECT count(l_extendedprice) AS n FROM lineitem),
      |cuts AS (
      |  SELECT
      |    (SELECT value FROM cum, n
      |     WHERE GREATEST(1, CAST(ceil(CAST(0.01 AS DOUBLE)
      |             * CAST(n.n AS DOUBLE)) AS BIGINT)) > cum.cum - cum.c
      |       AND GREATEST(1, CAST(ceil(CAST(0.01 AS DOUBLE)
      |             * CAST(n.n AS DOUBLE)) AS BIGINT)) <= cum.cum) AS lo,
      |    (SELECT value FROM cum, n
      |     WHERE GREATEST(1, CAST(ceil(CAST(0.99 AS DOUBLE)
      |             * CAST(n.n AS DOUBLE)) AS BIGINT)) > cum.cum - cum.c
      |       AND GREATEST(1, CAST(ceil(CAST(0.99 AS DOUBLE)
      |             * CAST(n.n AS DOUBLE)) AS BIGINT)) <= cum.cum) AS hi)
      |SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CASE WHEN l_extendedprice < cuts.lo THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_lo_clamped,
      |  CAST(sum(CASE WHEN l_extendedprice > cuts.hi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hi_clamped,
      |  sum(LEAST(GREATEST(l_extendedprice, cuts.lo), cuts.hi)) AS sum_w
      |FROM lineitem, cuts
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q78
  /** Triangle counting over a synthetic co-occurrence graph from
    * lineitem keys — degree-ordered edge orientation bounds wedge
    * enumeration at the m^(3/2) classic (a raw self-join pays
    * hub-degree² instead); the oracle brute-forces the three-way
    * canonical join. */
  private def q78Triangles(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.triangleCount(e, "src", "dst")
  }

  private val q78Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |nodes AS (
      |  SELECT DISTINCT n FROM (
      |    SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0))
      |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
      |  (SELECT count(*) FROM e0) AS n_edges,
      |  (SELECT count(*)
      |   FROM e0 a JOIN e0 b ON b.u = a.u AND b.v > a.v
      |        JOIN e0 c ON c.u = a.v AND c.v = b.v) AS n_triangles""".stripMargin

  // -------------------------------------------------------------- q174
  /** Hilbert-curve layout key (Layout.hkey / HilbertIndex) — the
    * locality-preserving complement of q75's z-order: the oracle
    * replays the iterative per-quadrant rotate-and-flip EXACTLY (8
    * unrolled stages of the same integer recurrence, generated from
    * one Scala template), so every index is integer-exact; the
    * adjacency/bijectivity invariants live in LayoutFuzzySpec. Cells
    * are derived 8-bit coordinates from customer keys. */
  private def q174Hilbert(s: SparkSession, dir: String): DataFrame = {
    val hx = (col("c_custkey") % 256).cast("long")
    val hy = (col("c_custkey") * 7 % 256).cast("long")
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), hx.as("hx"), hy.as("hy"),
        Layout.hkey(hx, hy, bits = 8).as("h"))
      .orderBy(col("c_custkey"))
  }

  private val q174Sql = {
    // one stage per bit, s = 128 .. 1: the same rotate-and-flip
    // recurrence HilbertUtil.index executes, with s inlined
    val stages = (7 to 0 by -1).zipWithIndex.map { case (bit, i) =>
      val sVal = 1L << bit
      val prev = if (i == 0) "c0" else s"st${i - 1}"
      s"""st$i AS (
         |  SELECT k, hx, hy,
         |    d + ${sVal * sVal} * xor(
         |      3 * (CASE WHEN (x & $sVal) > 0 THEN 1 ELSE 0 END),
         |      (CASE WHEN (y & $sVal) > 0 THEN 1 ELSE 0 END)) AS d,
         |    CASE WHEN (y & $sVal) > 0 THEN x
         |         WHEN (x & $sVal) > 0 THEN ${sVal - 1} - y
         |         ELSE y END AS x,
         |    CASE WHEN (y & $sVal) > 0 THEN y
         |         WHEN (x & $sVal) > 0 THEN ${sVal - 1} - x
         |         ELSE x END AS y
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""WITH c0 AS (
       |  SELECT c_custkey AS k,
       |    c_custkey % 256 AS hx, (c_custkey * 7) % 256 AS hy,
       |    c_custkey % 256 AS x, (c_custkey * 7) % 256 AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM customer),
       |$stages
       |SELECT k AS c_custkey, hx, hy, d AS h
       |FROM st7 ORDER BY c_custkey""".stripMargin
  }

  // -------------------------------------------------------------- q167
  /** Per-node local clustering coefficient (Graph.clusteringCoefficient,
    * Watts-Strogatz) over the q78 co-occurrence graph — the node-grain
    * complement of q78's global triangle census. Every triangle is
    * found once at its degree-ordered apex, then exploded to its three
    * corners; the coefficient 2t/(d(d-1)) is one exact-integer
    * division, so the doubles are bit-identical cross-engine. Output
    * trimmed to node % 10 = 0 (the graph still computes in full). */
  private def q167Clustering(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.clusteringCoefficient(e, "src", "dst")
      .filter(col("node") % 10 === 0)
      .orderBy(col("node"))
  }

  private val q167Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |deg AS (
      |  SELECT n, count(*) AS d FROM (
      |    SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
      |tri AS (
      |  SELECT a.u AS x, a.v AS y, b.v AS z
      |  FROM e0 a JOIN e0 b ON b.u = a.u AND b.v > a.v
      |       JOIN e0 c ON c.u = a.v AND c.v = b.v),
      |t AS (
      |  SELECT n, count(*) AS t FROM (
      |    SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri) GROUP BY 1)
      |SELECT deg.n AS node, deg.d AS degree,
      |  coalesce(t.t, 0) AS n_triangles,
      |  CASE WHEN deg.d >= 2 THEN
      |    CAST(coalesce(t.t, 0) * 2 AS DOUBLE)
      |      / CAST(deg.d * (deg.d - 1) AS DOUBLE)
      |  ELSE 0.0 END AS coefficient
      |FROM deg LEFT JOIN t ON t.n = deg.n
      |WHERE deg.n % 10 = 0 ORDER BY node""".stripMargin

  // -------------------------------------------------------------- q168
  /** Per-user EWMA + jump census over the events stream
    * (TimeSeries.ewma / jumpCensus): the ordered per-key fold family.
    * The value sequence is totally ordered by (ts, event_id), the
    * recurrence y = x/4 + 3y/4 uses exact binary fractions, and both
    * engines fold the identical sequence in the identical order
    * (Spark aggregate() HOF == DuckDB list_reduce with first-element
    * init), so the float result is bit-stable cross-engine. n_jumps
    * counts adjacent |delta| > 50 — integers, noise-immune. */
  private def q168Ewma(s: SparkSession, dir: String): DataFrame = {
    // NULL values are dropped explicitly: Spark's collect_list skips
    // them silently while DuckDB's list() keeps them — the one
    // cross-engine semantic gap in this fold
    val ev = Tables.load(s, dir, "events").filter(col("value").isNotNull)
    val ew = TimeSeries.ewma(ev, Seq("user_id"),
      Seq(col("ts"), col("event_id")), col("value"), alpha = 0.25)
    val jc = TimeSeries.jumpCensus(ev, Seq("user_id"),
      Seq(col("ts"), col("event_id")), col("value"), tau = 50.0)
      .select(col("user_id"), col("n_jumps"))
    ew.join(jc, Seq("user_id"))
      .select(col("user_id"), col("n_obs"), col("last_value"),
        col("ewma"), col("n_jumps"))
      .orderBy(col("user_id"))
  }

  private val q168Sql =
    """WITH xs AS (
      |  SELECT user_id,
      |    CAST(list(value ORDER BY ts, event_id) AS DOUBLE[]) AS xs
      |  FROM events WHERE value IS NOT NULL GROUP BY 1)
      |SELECT user_id,
      |  CAST(len(xs) AS BIGINT) AS n_obs,
      |  xs[len(xs)] AS last_value,
      |  CASE WHEN len(xs) = 1 THEN xs[1]
      |       ELSE list_reduce(xs, (acc, x) -> x * 0.25 + acc * 0.75)
      |  END AS ewma,
      |  CAST(len(list_filter(list_transform(range(1, len(xs)),
      |    i -> abs(xs[i+1] - xs[i]) > 50.0), b -> b)) AS BIGINT)
      |    AS n_jumps
      |FROM xs ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------- q79
  /** Trailing 24 h moving-window aggregates per event (RANGE frame on
    * integer micros — the interval-window half of the window family
    * that q48's ROWS frames don't cover). One shuffle by user. */
  private def q79Trailing(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.trailingWindow(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "value", windowSeconds = 86400L)
      .orderBy(col("user_id"), col("us"), col("event_id"))

  private val q79Sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
      |SELECT event_id, user_id, us,
      |  count(*) OVER w AS n_trailing,
      |  sum(value) OVER w AS sum_trailing
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
      |  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, us, event_id""".stripMargin

  // --------------------------------------------------------------- q80
  /** SCD Type-2 merge: a deterministic update batch against a
    * versioned customer dimension — no-op updates (every 14th key)
    * must NOT version, changed updates close + reopen, unknown keys
    * insert fresh open versions. The oracle rebuilds the same history
    * as three explicit join arms. */
  /** The versioned customer dimension shared by q80 (the writer) and
    * q97 (the point-in-time reader): base versions open at t=0, a
    * deterministic update batch at t=1000 (no-ops every 14th key,
    * segment changes on the other 7th-key multiples, fresh keys every
    * 500th). */
  private def scd2History(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val dim = c.select(col("c_custkey"), col("c_mktsegment"),
      lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
    val changedOrNoop = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 14 === 0, col("c_mktsegment"))
          .otherwise(concat(lit("NEW-"), col("c_mktsegment")))
          .as("c_mktsegment"),
        lit(1000L).as("ts"))
    val freshKeys = c.filter(col("c_custkey") % 500 === 0)
      .select((col("c_custkey") + 1000000).as("c_custkey"),
        lit("FRESH").as("c_mktsegment"), lit(1000L).as("ts"))
    operators.Scd2(dim, changedOrNoop.unionAll(freshKeys),
      Seq("c_custkey"), Seq("c_mktsegment"), "ts")
  }

  private def q80Scd2(s: SparkSession, dir: String): DataFrame =
    scd2History(s, dir).orderBy(col("c_custkey"), col("valid_from"))

  private val q80Sql =
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from,
      |    CAST(NULL AS BIGINT) AS valid_to
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 14 = 0 THEN c_mktsegment
      |         ELSE 'NEW-' || c_mktsegment END AS seg,
      |    CAST(1000 AS BIGINT) AS ts
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'FRESH', 1000
      |  FROM customer WHERE c_custkey % 500 = 0)
      |SELECT * FROM (
      |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
      |  FROM dim d LEFT JOIN upd u USING (c_custkey)
      |  WHERE u.c_custkey IS NULL OR u.seg = d.c_mktsegment
      |  UNION ALL
      |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, u.ts
      |  FROM dim d JOIN upd u USING (c_custkey)
      |  WHERE u.seg != d.c_mktsegment
      |  UNION ALL
      |  SELECT u.c_custkey, u.seg, u.ts, CAST(NULL AS BIGINT)
      |  FROM upd u LEFT JOIN dim d USING (c_custkey)
      |  WHERE d.c_custkey IS NULL OR u.seg != d.c_mktsegment)
      |ORDER BY c_custkey, valid_from""".stripMargin

  // --------------------------------------------------------------- q81
  /** Per-group exact percentiles: p50/p90/p99 of l_extendedprice
    * within each returnflag — the grouped form of q69 (cumulative
    * window partitioned by group; ranks from a broadcast of
    * group-total × fraction pairs). */
  private def q81Grouped(s: SparkSession, dir: String): DataFrame =
    Quantiles.exactPercentilesByGroup(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", Seq(0.5, 0.9, 0.99))
      .orderBy(col("l_returnflag"), col("q"))

  private val q81Sql =
    """WITH qs AS (
      |  SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
      |    CAST(0.99 AS DOUBLE)]) AS q),
      |counts AS (
      |  SELECT l_returnflag AS g, l_extendedprice AS value, count(*) AS c
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
      |totals AS (SELECT g, sum(c) AS n FROM counts GROUP BY 1),
      |cum AS (
      |  SELECT g, value, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY value
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts),
      |ranks AS (
      |  SELECT t.g, qs.q,
      |    GREATEST(1, CAST(ceil(qs.q * CAST(t.n AS DOUBLE)) AS BIGINT))
      |      AS rank
      |  FROM totals t, qs)
      |SELECT r.g AS l_returnflag, r.q, r.rank, cum.value
      |FROM ranks r JOIN cum
      |  ON cum.g = r.g AND r.rank > cum.cum - cum.c AND r.rank <= cum.cum
      |ORDER BY l_returnflag, q""".stripMargin

  // -------------------------------------------------------------- q104
  /** Deterministic hash-sample percentiles
    * (Quantiles.sampleQuantilesByGroup): per returnflag, the 500 rows
    * with smallest md5 of the (orderkey, linenumber) primary key form a
    * reproducible uniform sample; exact rank-lookup percentiles run on
    * the sample. The bounded-state quantile path for when even
    * one-row-per-distinct-value is too much shuffle — state is k rows
    * per group, the sample is identical on every run/partitioning (a
    * rand() sample is neither), and the oracle reproduces it exactly
    * from the same md5 ordering. Rank error is O(n/√k) by bottom-k
    * sampling theory. */
  private def q104SampleQuantiles(s: SparkSession, dir: String): DataFrame =
    Quantiles.sampleQuantilesByGroup(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice",
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")),
        k = 500, qs = Seq(0.5, 0.9, 0.99))
      .orderBy(col("l_returnflag"), col("q"))

  private val q104Sql =
    """WITH qs AS (
      |  SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
      |    CAST(0.99 AS DOUBLE)]) AS q),
      |sample AS (
      |  SELECT g, value FROM (
      |    SELECT l_returnflag AS g, l_extendedprice AS value,
      |      row_number() OVER (PARTITION BY l_returnflag
      |        ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' ||
      |                     CAST(l_linenumber AS VARCHAR))) AS rk
      |    FROM lineitem WHERE l_extendedprice IS NOT NULL)
      |  WHERE rk <= 500),
      |counts AS (SELECT g, value, count(*) AS c FROM sample GROUP BY 1, 2),
      |totals AS (SELECT g, sum(c) AS n FROM counts GROUP BY 1),
      |cum AS (
      |  SELECT g, value, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY value
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts),
      |ranks AS (
      |  SELECT t.g, qs.q,
      |    GREATEST(1, CAST(ceil(qs.q * CAST(t.n AS DOUBLE)) AS BIGINT))
      |      AS rank
      |  FROM totals t, qs)
      |SELECT r.g AS l_returnflag, r.q, r.rank, cum.value
      |FROM ranks r JOIN cum
      |  ON cum.g = r.g AND r.rank > cum.cum - cum.c AND r.rank <= cum.cum
      |ORDER BY l_returnflag, q""".stripMargin

  // --------------------------------------------------------------- q82
  /** URL canonicalization + per-domain census over deterministically
    * messy synthetic URLs (uppercase scheme/host, default port,
    * unsorted query params, fragments): the Spark normalizer and the
    * DuckDB oracle run the IDENTICAL regex/list pipeline (Java ∩ RE2
    * patterns), then aggregate by registered domain. */
  private def q82Urls(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UrlFunctions
    val d = Tables.load(s, dir, "documents")
    val raw = concat(lit("HTTPS://WWW.Site"),
      (col("doc_id") % 50).cast("string"),
      lit("-Example.COM:443/docs/"), col("doc_id").cast("string"),
      when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
      lit("?b=2&a=1"),
      when(col("doc_id") % 2 === 0, lit("#frag")).otherwise(lit("")))
    d.select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"), UrlFunctions.normalizeUrl(col("raw")).as("url"),
        UrlFunctions.registeredDomain(col("raw")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_urls"),
        min(col("url")).as("first_url"))
      .orderBy(col("domain"))
  }

  private val q82Sql =
    """WITH raw AS (
      |  SELECT doc_id,
      |    'HTTPS://WWW.Site' || CAST(doc_id % 50 AS VARCHAR) ||
      |    '-Example.COM:443/docs/' || CAST(doc_id AS VARCHAR) ||
      |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
      |    '?b=2&a=1' ||
      |    CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END AS u
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(u,
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(u,
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)),
      |      ':(443|80)$', '') AS host,
      |    regexp_extract(u,
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS path0,
      |    regexp_extract(u,
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS q
      |  FROM raw),
      |norm AS (
      |  SELECT doc_id,
      |    scheme || '://' || host ||
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
      |    CASE WHEN q = '' THEN ''
      |         ELSE '?' || array_to_string(list_sort(
      |           list_filter(string_split(q, '&'), x -> x != '')), '&') END
      |      AS url,
      |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
      |  FROM parts)
      |SELECT domain, count(*) AS n_docs,
      |  count(DISTINCT url) AS n_urls, min(url) AS first_url
      |FROM norm GROUP BY 1 ORDER BY domain""".stripMargin

  // --------------------------------------------------------------- q85
  /** Large×large interval overlap join via fixed-width binning
    * (IntervalJoin.overlapJoin): every 50th order opens a 14-day
    * window from its order date; each lineitem occupies a
    * [ship, ship + (linenumber % 7) + 1]-day service interval; count +
    * quantity of overlapping lineitems per window. q26's range join
    * broadcasts one side — this is the both-sides-large formulation:
    * explode to 16-day bins, hash-join on the bin, dedup-free via the
    * max-start-bin rule, exact overlap as a post-filter. The oracle
    * runs the plain theta join. */
  private def q85Interval(s: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01")
    val orders = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), epoch).cast("long").as("w_start"))
      .withColumn("w_end", col("w_start") + 14)
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        datediff(to_date(col("l_shipdate")), epoch).cast("long").as("l_start"),
        (datediff(to_date(col("l_shipdate")), epoch) +
          (col("l_linenumber") % 7) + 1).cast("long").as("l_end"))
    graft.operators.IntervalJoin.overlapJoin(
        li, "l_start", "l_end", orders, "w_start", "w_end", binWidth = 16L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  private val q85Sql =
    """WITH w AS (
      |  SELECT o_orderkey,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ws,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 14 AS we
      |  FROM orders WHERE o_orderkey % 50 = 0),
      |li AS (
      |  SELECT l_quantity,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ls,
      |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |      + (l_linenumber % 7) + 1 AS le
      |  FROM lineitem)
      |SELECT w.o_orderkey, count(*) AS n_items, sum(li.l_quantity) AS sum_qty
      |FROM w JOIN li ON li.ls <= w.we AND w.ws <= li.le
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q86
  /** Multi-source BFS hop distances (Graph.bfsDistances) over the q78
    * co-occurrence graph: minimum hops (<= 6) from the 20 anchor nodes
    * (node % 1000 = 0) to every reachable node. Per round only the
    * FRONTIER joins the pre-partitioned adjacency cache; the oracle is
    * the depth-capped recursive-CTE reachability with a final min. */
  private def q86Bfs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    val sources = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .filter(col("node") % 1000 === 0).distinct()
    Graph.bfsDistances(e, "src", "dst", sources, maxHops = 6)
      .orderBy(col("node"))
  }

  private val q86Sql =
    """WITH RECURSIVE e AS (
      |  SELECT l_orderkey % 20000 AS a, (l_partkey * 7) % 20000 AS b
      |  FROM lineitem
      |  UNION
      |  SELECT (l_partkey * 7) % 20000, l_orderkey % 20000 FROM lineitem),
      |srcs AS (SELECT DISTINCT a AS node FROM e WHERE a % 1000 = 0),
      |reach AS (
      |  SELECT node, 0 AS d FROM srcs
      |  UNION
      |  SELECT e.b AS node, r.d + 1 AS d
      |  FROM reach r JOIN e ON e.a = r.node WHERE r.d < 6)
      |SELECT node, CAST(min(d) AS BIGINT) AS hops
      |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q123
  /** Entity resolution end to end (EntityResolution.resolve): a
    * block-structured synthetic name per customer — the group id
    * written TWICE (so names of different groups differ in ≥2 edits
    * and can never fuzzy-chain across entities, unlike raw
    * Customer#... names whose single-digit neighbors merge the whole
    * table into one cluster) plus a per-parity spelling variant one
    * edit away. Resolution must recover exactly the groups: match →
    * transitive cluster → survive, census per entity. The oracle
    * enumerates the same pairs with levenshtein and closes them with a
    * recursive CTE (the q40 pattern). */
  private def q123Entities(s: SparkSession, dir: String): DataFrame = {
    val g = ((col("c_custkey") - col("c_custkey") % 10) / 10).cast("long")
    val rows = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        concat(lit("E"), g.cast("string"), lit("."), g.cast("string"),
          when(col("c_custkey") % 2 === 0, lit("")).otherwise(lit("x")))
          .as("ent_name"))
    graft.operators.EntityResolution.resolve(rows,
        "c_custkey", "ent_name", maxDist = 1)
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("ent_name")).as("canonical_name"),
        countDistinct(col("ent_name")).as("n_spellings"))
      .orderBy(col("entity_id"))
  }

  /** The q123 entity-clustering CTE chain (… → assigned(c_custkey,
    * entity_id, ent_name)) — shared with the q348 golden-record
    * composition. Callers prepend WITH RECURSIVE. */
  private val entityAssignedCtes =
    """c AS (
      |  SELECT c_custkey,
      |    'E' || CAST((c_custkey - c_custkey % 10) // 10 AS VARCHAR) ||
      |    '.' || CAST((c_custkey - c_custkey % 10) // 10 AS VARCHAR) ||
      |    CASE WHEN c_custkey % 2 = 0 THEN '' ELSE 'x' END AS ent_name
      |  FROM customer),
      |pairs AS (
      |  SELECT a.c_custkey AS id1, b.c_custkey AS id2
      |  FROM c a JOIN c b
      |    ON a.c_custkey < b.c_custkey
      |   AND levenshtein(a.ent_name, b.ent_name) <= 1),
      |edges AS (
      |  SELECT id1 AS src, id2 AS dst FROM pairs
      |  UNION ALL SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT src AS node, src AS lbl FROM edges
      |  UNION
      |  SELECT e.src AS node, r.lbl
      |  FROM edges e JOIN reach r ON r.node = e.dst),
      |labels AS (SELECT node, min(lbl) AS ent FROM reach GROUP BY 1),
      |assigned AS (
      |  SELECT c.c_custkey, coalesce(l.ent, c.c_custkey) AS entity_id,
      |    c.ent_name
      |  FROM c LEFT JOIN labels l ON l.node = c.c_custkey)""".stripMargin

  private val q123Sql =
    s"""WITH RECURSIVE $entityAssignedCtes
       |SELECT entity_id, count(*) AS n_members,
       |  min(ent_name) AS canonical_name,
       |  count(DISTINCT ent_name) AS n_spellings
       |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q120
  /** Per-user EWMA of event values (EventAnalytics.ewma, α = 0.25):
    * the recursive smoothing metric no window frame can express,
    * computed as one deterministic left fold per user — DuckDB's
    * list_reduce runs the IDENTICAL fold (first element as init,
    * accumulator-first lambda), so doubles match bit for bit. */
  private def q120Ewma(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.ewma(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "value", alpha = 0.25)
      .orderBy(col("user_id"))

  private val q120Sql =
    """SELECT user_id, count(*) AS n_events,
      |  list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
      |    (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q116
  /** Weighted multi-source shortest paths (Graph.shortestPaths):
    * Bellman-Ford with frontier-only relaxation over the q86 graph
    * made DIRECTED and weighted (w = 1 + linenumber % 5, parallel
    * edges collapsed to their cheapest). Both sides bound the walk at
    * 4 edges — the engine by maxIter, the oracle by a hop counter in
    * the recursive CTE — so the row set and distances are the
    * ≤-4-edge minima by construction, exactly (integer weights: no FP
    * anywhere, the pageRank determinism contract). Completes the
    * graph family: connectivity (q40), communities (q100), ranking
    * (q88), hops (q86), triangles (q78), and now weighted distance. */
  private def q116Sssp(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"),
      (lit(1) + col("l_linenumber") % 5).as("w"))
      // self-loop filter BEFORE source selection: the oracle's srcs CTE
      // reads the filtered edge set, so a node appearing only in
      // self-loop rows must not become a Spark-side source either
      // (shortestPaths drops the loops internally regardless)
      .filter(col("src") =!= col("dst"))
    val sources = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .filter(col("node") % 1000 === 0).distinct()
    Graph.shortestPaths(e, "src", "dst", "w", sources, maxIter = 4)
      .orderBy(col("node"))
  }

  private val q116Sql =
    """WITH RECURSIVE e AS (
      |  SELECT l_orderkey % 20000 AS a, (l_partkey * 7) % 20000 AS b,
      |    min(1 + l_linenumber % 5) AS w
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |  GROUP BY 1, 2),
      |srcs AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      |  WHERE node % 1000 = 0),
      |walk AS (
      |  SELECT node, 0 AS hops, CAST(0 AS BIGINT) AS d FROM srcs
      |  UNION
      |  SELECT e.b AS node, w.hops + 1 AS hops, w.d + e.w AS d
      |  FROM walk w JOIN e ON e.a = w.node WHERE w.hops < 4)
      |SELECT node, CAST(min(d) AS BIGINT) AS dist
      |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q87
  /** Robust outlier census (Quantiles.madOutlierCensus): modified
    * z-score M = 0.6745·(x − median)/MAD per returnflag group over a
    * deterministically spiked price column (every 997th order × 25 —
    * the planted heavy tail a mean/stddev rule would smear into its own
    * cutoffs; the median/MAD cutoffs ignore it). Two exact-percentile
    * passes + one census aggregate; the oracle composes the q81
    * grouped-percentile CTE form twice. */
  private def q87Mad(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val spiked = li.filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"),
        when(col("l_orderkey") % 997 === 0, col("l_extendedprice") * 25)
          .otherwise(col("l_extendedprice")).as("x"))
    Quantiles.madOutlierCensus(spiked, "l_returnflag", "x", threshold = 3.5)
      .orderBy(col("l_returnflag"))
  }

  private val q87Sql =
    """WITH src AS (
      |  SELECT l_returnflag AS g,
      |    CASE WHEN l_orderkey % 997 = 0 THEN l_extendedprice * 25
      |         ELSE l_extendedprice END AS x
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |c1 AS (SELECT g, x AS value, count(*) AS c FROM src GROUP BY 1, 2),
      |t1 AS (SELECT g, sum(c) AS n FROM c1 GROUP BY 1),
      |cum1 AS (
      |  SELECT g, value, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY value
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM c1),
      |r1 AS (
      |  SELECT g, GREATEST(1,
      |    CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT)) AS rank
      |  FROM t1),
      |med AS (
      |  SELECT r1.g, cum1.value AS med
      |  FROM r1 JOIN cum1
      |    ON cum1.g = r1.g AND r1.rank > cum1.cum - cum1.c
      |      AND r1.rank <= cum1.cum),
      |dev AS (
      |  SELECT src.g, abs(src.x - med.med) AS dv, med.med AS med
      |  FROM src JOIN med ON med.g = src.g),
      |c2 AS (SELECT g, dv AS value, count(*) AS c FROM dev GROUP BY 1, 2),
      |t2 AS (SELECT g, sum(c) AS n FROM c2 GROUP BY 1),
      |cum2 AS (
      |  SELECT g, value, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY value
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM c2),
      |r2 AS (
      |  SELECT g, GREATEST(1,
      |    CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT)) AS rank
      |  FROM t2),
      |mad AS (
      |  SELECT r2.g, cum2.value AS mad
      |  FROM r2 JOIN cum2
      |    ON cum2.g = r2.g AND r2.rank > cum2.cum - cum2.c
      |      AND r2.rank <= cum2.cum)
      |SELECT dev.g AS l_returnflag, count(*) AS n,
      |  max(dev.med) AS median, max(mad.mad) AS mad,
      |  CAST(sum(CASE WHEN CASE WHEN mad.mad = 0 THEN dev.dv > 0
      |    ELSE 0.6745 * dev.dv / mad.mad > 3.5 END
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev JOIN mad ON mad.g = dev.g
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q88
  /** PageRank (3 iterations, damping 85/100) over the q78/q86
    * co-occurrence graph, DIRECTED — in scaled-integer arithmetic
    * (Graph.pageRank): ranks are BIGINT multiples of 1e-12 and every
    * step is integer division, so the iterative result is bit-exact,
    * partition-independent, and oracle-checkable — a float PageRank's
    * in-neighbor sums are order-dependent and can never hash-match.
    * The oracle unrolls the same three rounds as chained CTEs with
    * `//`. Per round the engine shuffles only the n-row rank table —
    * the out-degree-annotated adjacency is cached pre-partitioned on
    * the join key (the BFS/CC edge-cache discipline). */
  private def q88Pagerank(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.pageRank(e, "src", "dst", iterations = 3)
      .orderBy(col("node"))
  }

  private val q88Sql = {
    def sumCte(k: Int): String =
      s"""s$k AS (
         |  SELECT e.d AS node, CAST(sum(r${k - 1}.r // deg.od) AS BIGINT) AS m
         |  FROM r${k - 1} JOIN e ON e.s = r${k - 1}.node
         |  JOIN deg ON deg.s = r${k - 1}.node
         |  GROUP BY 1)""".stripMargin
    def rankCte(k: Int): String =
      s"""r$k AS (
         |  SELECT nodes.n AS node,
         |    ((1000000000000 // p.n) * 15) // 100
         |      + (85 * COALESCE(s$k.m, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN p
         |  LEFT JOIN s$k ON s$k.node = nodes.n)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT l_orderkey % 20000 AS s, (l_partkey * 7) % 20000 AS d
       |  FROM lineitem
       |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)),
       |nodes AS (
       |  SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
       |deg AS (SELECT s, count(*) AS od FROM e GROUP BY 1),
       |p AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT nodes.n AS node, 1000000000000 // p.n AS r
       |       FROM nodes CROSS JOIN p),
       |${sumCte(1)},
       |${rankCte(1)},
       |${sumCte(2)},
       |${rankCte(2)},
       |${sumCte(3)},
       |${rankCte(3)}
       |SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3
       |ORDER BY node""".stripMargin
  }

  // -------------------------------------------------------------- q180
  /** Personalized PageRank (Haveliwala 2002): teleport mass
    * concentrates on the source set (nodes ≡ 0 mod 100) instead of
    * uniformly — the trust-propagation / "recommendations near these
    * seeds" variant. Same scaled-integer arithmetic as q88, so the
    * iterate is bit-exact and the oracle unrolls the identical three
    * rounds with the source-conditional teleport. Non-seed nodes
    * start (and teleport) at 0; rank flows only through edges. */
  private def q180PersonalizedPr(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    val seeds = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .filter(col("node") % 100 === 0).distinct()
    Graph.pageRank(e, "src", "dst", iterations = 3,
        teleportTo = Some(seeds))
      .filter(col("rank_scaled") > 0)
      .orderBy(col("node"))
  }

  private val q180Sql = {
    def sumCte(k: Int): String =
      s"""s$k AS (
         |  SELECT e.d AS node, CAST(sum(r${k - 1}.r // deg.od) AS BIGINT) AS m
         |  FROM r${k - 1} JOIN e ON e.s = r${k - 1}.node
         |  JOIN deg ON deg.s = r${k - 1}.node
         |  GROUP BY 1)""".stripMargin
    def rankCte(k: Int): String =
      s"""r$k AS (
         |  SELECT nodes.n AS node,
         |    (CASE WHEN nodes.n % 100 = 0
         |       THEN ((1000000000000 // p.ns) * 15) // 100 ELSE 0 END)
         |      + (85 * COALESCE(s$k.m, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN p
         |  LEFT JOIN s$k ON s$k.node = nodes.n)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT l_orderkey % 20000 AS s, (l_partkey * 7) % 20000 AS d
       |  FROM lineitem
       |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)),
       |nodes AS (
       |  SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
       |deg AS (SELECT s, count(*) AS od FROM e GROUP BY 1),
       |p AS (SELECT count(*) AS ns FROM nodes WHERE n % 100 = 0),
       |r0 AS (SELECT nodes.n AS node,
       |         CASE WHEN nodes.n % 100 = 0
       |           THEN 1000000000000 // p.ns ELSE 0 END AS r
       |       FROM nodes CROSS JOIN p),
       |${sumCte(1)},
       |${rankCte(1)},
       |${sumCte(2)},
       |${rankCte(2)},
       |${sumCte(3)},
       |${rankCte(3)}
       |SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3
       |WHERE r > 0 ORDER BY node""".stripMargin
  }

  // --------------------------------------------------------------- q92
  /** Daily resample + gap fill + forward fill of the events table
    * (EventAnalytics.resampleDaily): one row per (user, epoch day) over
    * each user's activity span; missing days get n_events = 0 and the
    * last observed daily value carried forward. Integer epoch-day keys;
    * the calendar explode is bounded per user by its own span and the
    * fill window is per-user — never a global calendar or sort. */
  private def q92GapFill(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.resampleDaily(Tables.load(s, dir, "events"),
        "user_id", "ts", "value")
      .orderBy(col("user_id"), col("day"))

  private val q92Sql =
    """WITH daily AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS n_events, sum(value) AS day_value
      |  FROM events GROUP BY 1, 2),
      |spans AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      |cal AS (
      |  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM spans)
      |SELECT c.user_id, c.day,
      |  COALESCE(d.n_events, 0) AS n_events, d.day_value,
      |  last_value(d.day_value IGNORE NULLS) OVER (
      |    PARTITION BY c.user_id ORDER BY c.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM cal c LEFT JOIN daily d USING (user_id, day)
      |ORDER BY user_id, day""".stripMargin

  // --------------------------------------------------------------- q97
  /** Point-in-time (temporal) join: each order resolves the q80
    * customer-dimension VERSION valid at the order's own synthetic
    * event time (o_orderkey % 2000 — half before the t=1000 update
    * batch, half after), then a census per as-of segment. The read-side
    * half of SCD Type-2: joining the CURRENT version would back-date
    * history onto old facts. Plans as a plain equi-join on the
    * dimension key with the validity range as a residual filter —
    * never a range explosion. */
  private def q97Pit(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
        (col("o_orderkey") % 2000).as("ts_f"))
    operators.Scd2.pointInTime(facts, scd2History(s, dir),
        Seq("c_custkey"), "ts_f")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        min(col("o_orderkey")).as("min_order"),
        max(col("o_orderkey")).as("max_order"))
      .orderBy(col("c_mktsegment"))
  }

  private val q97Sql =
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from,
      |    CAST(NULL AS BIGINT) AS valid_to
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 14 = 0 THEN c_mktsegment
      |         ELSE 'NEW-' || c_mktsegment END AS seg,
      |    CAST(1000 AS BIGINT) AS ts
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'FRESH', 1000
      |  FROM customer WHERE c_custkey % 500 = 0),
      |hist AS (
      |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
      |  FROM dim d LEFT JOIN upd u USING (c_custkey)
      |  WHERE u.c_custkey IS NULL OR u.seg = d.c_mktsegment
      |  UNION ALL
      |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, u.ts
      |  FROM dim d JOIN upd u USING (c_custkey)
      |  WHERE u.seg != d.c_mktsegment
      |  UNION ALL
      |  SELECT u.c_custkey, u.seg, u.ts, CAST(NULL AS BIGINT)
      |  FROM upd u LEFT JOIN dim d USING (c_custkey)
      |  WHERE d.c_custkey IS NULL OR u.seg != d.c_mktsegment),
      |f AS (
      |  SELECT o_orderkey, o_custkey AS c_custkey,
      |    o_orderkey % 2000 AS ts_f
      |  FROM orders)
      |SELECT h.c_mktsegment, count(*) AS n_orders,
      |  count(DISTINCT f.c_custkey) AS n_customers,
      |  min(f.o_orderkey) AS min_order, max(f.o_orderkey) AS max_order
      |FROM f LEFT JOIN hist h
      |  ON h.c_custkey = f.c_custkey AND h.valid_from <= f.ts_f
      |  AND (h.valid_to IS NULL OR f.ts_f < h.valid_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q100
  /** Deterministic label propagation (2 synchronous rounds) over the
    * q78/q86 co-occurrence graph — community detection beside q40's
    * connectivity clustering: most-frequent-neighbor-label with
    * smallest-label tie-break, integer counts and labels throughout,
    * so the iterative result is bit-stable and the oracle unrolls the
    * same two rounds (randomized-order LPA could never hash-match).
    * Per round only the label table and the (neighbor, label) counts
    * shuffle against the pre-partitioned adjacency cache. */
  private def q100Lpa(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.labelPropagation(e, "src", "dst", iterations = 2)
      .orderBy(col("node"))
  }

  private val q100Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (
      |  SELECT u AS a, v AS b FROM e0 UNION ALL SELECT v, u FROM e0),
      |l0 AS (SELECT DISTINCT a AS node FROM adj),
      |c1 AS (
      |  SELECT adj.b AS node, l.node AS label, count(*) AS c
      |  FROM l0 l JOIN adj ON adj.a = l.node GROUP BY 1, 2),
      |r1 AS (
      |  SELECT node, label FROM (
      |    SELECT node, label,
      |      row_number() OVER (PARTITION BY node ORDER BY c DESC, label) rn
      |    FROM c1) WHERE rn = 1),
      |c2 AS (
      |  SELECT adj.b AS node, r.label, count(*) AS c
      |  FROM r1 r JOIN adj ON adj.a = r.node GROUP BY 1, 2),
      |r2 AS (
      |  SELECT node, label FROM (
      |    SELECT node, label,
      |      row_number() OVER (PARTITION BY node ORDER BY c DESC, label) rn
      |    FROM c2) WHERE rn = 1)
      |SELECT node, label FROM r2 ORDER BY node""".stripMargin

  // -------------------------------------------------------------- q147
  /** k-core decomposition (bounded form, k=35, two peels) over the
    * supplier–part co-occurrence graph: round 1 drops 180 of 400
    * nodes, round 2 drops 4 more — both peel rounds do real work at
    * sf0.01. The oracle unrolls the two rounds as nested CTEs (the
    * round invariant is a pure function of the input graph — the
    * q88/q116 unrolled-iteration pattern); the FIXPOINT form is
    * GraphSpec-pinned (triangle-plus-tail, bounded-vs-fixpoint
    * agreement). An early-converging engine run stays correct against
    * a longer unroll because peeling is idempotent at the fixpoint. */
  private def q147Kcore(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") % 300 + 10000).as("p"))
    Graph.kCore(e, "s", "p", k = 35, maxRounds = 2)
      .orderBy(col("node"))
  }

  private val q147Sql =
    """WITH d0 AS (
      |  SELECT l_suppkey AS a, l_partkey % 300 + 10000 AS b
      |  FROM lineitem WHERE l_orderkey % 5 = 0),
      |e0 AS (SELECT DISTINCT a, b FROM (
      |  SELECT a, b FROM d0 WHERE a != b
      |  UNION ALL SELECT b, a FROM d0 WHERE a != b)),
      |d1 AS (SELECT a, count(*) AS c FROM e0 GROUP BY 1),
      |a1 AS (SELECT a FROM d1 WHERE c >= 35),
      |e1 AS (SELECT e0.a, e0.b FROM e0
      |  JOIN a1 x ON e0.a = x.a JOIN a1 y ON e0.b = y.a),
      |d2 AS (SELECT a, count(*) AS c FROM e1 GROUP BY 1),
      |a2 AS (SELECT a FROM d2 WHERE c >= 35),
      |e2 AS (SELECT e1.a, e1.b FROM e1
      |  JOIN a2 x ON e1.a = x.a JOIN a2 y ON e1.b = y.a)
      |SELECT a AS node, count(*) AS degree FROM e2
      |GROUP BY 1 ORDER BY node""".stripMargin

  // -------------------------------------------------------------- q189
  /** Tukey-fence outlier census per return flag, entirely in exact
    * integer cents: discrete quartiles come from
    * Quantiles.exactPercentilesByGroup (rank-lookup, a value FROM the
    * input set), the 1.5·IQR fences use `div` (non-negative operand ⇒
    * floor == trunc, engine-identical), and the below/above counts are
    * one more aggregate over the hashed cents — the standard
    * robust-outlier screen (Tukey 1977) as a two-pass distributed
    * plan: distinct-value shuffle for quartiles, map-side-combined
    * count for the census. No doubles anywhere. */
  private def q189OutlierFences(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    val quart = Quantiles.exactPercentilesByGroup(
      cents, "l_returnflag", "cents", Seq(0.25, 0.75))
      .groupBy(col("l_returnflag"))
      .agg(max(when(col("q") === 0.25, col("value"))).as("q1c"),
        max(when(col("q") === 0.75, col("value"))).as("q3c"))
      .withColumn("iqr", col("q3c") - col("q1c"))
      .withColumn("lo", col("q1c") - expr("(3 * iqr) div 2"))
      .withColumn("hi", col("q3c") + expr("(3 * iqr) div 2"))
    cents.join(broadcast(quart), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), col("q1c"), col("q3c"), col("iqr"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("cents") < col("lo"), 1)).as("n_below"),
        count(when(col("cents") > col("hi"), 1)).as("n_above"))
      .orderBy(col("l_returnflag"))
  }

  private val q189Sql =
    """WITH cents0 AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |counts AS (
      |  SELECT l_returnflag AS g, cents AS value, count(*) AS c
      |  FROM cents0 WHERE cents IS NOT NULL GROUP BY 1, 2),
      |totals AS (SELECT g, sum(c) AS n FROM counts GROUP BY 1),
      |cum AS (
      |  SELECT g, value, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY value
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts),
      |ranks AS (
      |  SELECT t.g, qs.q,
      |    GREATEST(1, CAST(ceil(qs.q * CAST(t.n AS DOUBLE)) AS BIGINT))
      |      AS rank
      |  FROM totals t,
      |    (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.75 AS DOUBLE)])
      |       AS q) qs),
      |quart AS (
      |  SELECT r.g,
      |    max(CASE WHEN r.q = 0.25 THEN cum.value END) AS q1c,
      |    max(CASE WHEN r.q = 0.75 THEN cum.value END) AS q3c
      |  FROM ranks r JOIN cum
      |    ON cum.g = r.g AND r.rank > cum.cum - cum.c
      |      AND r.rank <= cum.cum
      |  GROUP BY 1),
      |fence AS (
      |  SELECT g, q1c, q3c, q3c - q1c AS iqr,
      |    q1c - (3 * (q3c - q1c)) // 2 AS lo,
      |    q3c + (3 * (q3c - q1c)) // 2 AS hi
      |  FROM quart)
      |SELECT c0.l_returnflag, f.q1c, f.q3c, f.iqr, f.lo, f.hi,
      |  count(*) AS n_total,
      |  CAST(count(CASE WHEN c0.cents < f.lo THEN 1 END) AS BIGINT)
      |    AS n_below,
      |  CAST(count(CASE WHEN c0.cents > f.hi THEN 1 END) AS BIGINT)
      |    AS n_above
      |FROM cents0 c0 JOIN fence f ON c0.l_returnflag = f.g
      |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------- q191
  /** 2-D Pareto frontier (Skyline.frontier2D) of orders maximizing
    * (price, recency) — the best-trade-off query, run entirely in
    * exact integers (price cents × epoch days). The distributed shape
    * under test is the textbook one this operator exists to avoid:
    * the x-descending running max runs as parallel per-partition
    * windows plus a partition-count-bounded prefix table — never a
    * data-scale single-partition window. Oracle: the same scan as one
    * window over grouped points. */
  private def q191Skyline(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("price_cents"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("order_day"))
    graft.operators.Skyline.frontier2D(o, "price_cents", "order_day")
      .orderBy(col("price_cents"))
  }

  private val q191Sql =
    """WITH pts0 AS (
      |  SELECT
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_cents,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day
      |  FROM orders
      |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
      |pts AS (SELECT price_cents, max(order_day) AS order_day
      |        FROM pts0 GROUP BY 1),
      |m AS (
      |  SELECT price_cents, order_day,
      |    max(order_day) OVER (ORDER BY price_cents DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM pts)
      |SELECT price_cents, order_day FROM m
      |WHERE pm IS NULL OR order_day > pm
      |ORDER BY price_cents""".stripMargin

  // -------------------------------------------------------------- q202
  /** Holt linear-trend smoothing (TimeSeries.holt): the level+trend
    * upgrade of q168's EWMA, per user over the totally-ordered event
    * values, with exact binary α=1/4, β=1/8. The oracle replays the
    * recurrence with a RECURSIVE CTE rather than a struct-state
    * list_reduce: DuckDB 1.0 evaluates struct_pack fields in a
    * reduce accumulator SEQUENTIALLY IN PLACE (field 2's expression
    * sees field 1's already-updated value — measured: two identical
    * field expressions return different values), so a two-component
    * fold state cannot be restated faithfully that way. The CTE
    * steps (user, i) → (user, i+1) with both components updated from
    * the same old state — identical fold order ⇒ identical double
    * bits. */
  private def q202Holt(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events").filter(col("value").isNotNull)
    TimeSeries.holt(ev, Seq("user_id"), Seq(col("ts"), col("event_id")),
        col("value"))
      .orderBy(col("user_id"))
  }

  private val q202Sql =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(value AS DOUBLE) AS x,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events WHERE value IS NOT NULL),
      |nn AS (SELECT user_id, max(rn) AS m FROM ev GROUP BY 1),
      |rec AS (
      |  SELECT e.user_id, 1 AS i, e.x AS l, CAST(0.0 AS DOUBLE) AS t
      |  FROM ev e WHERE e.rn = 1
      |  UNION ALL
      |  SELECT r.user_id, r.i + 1,
      |    e.x * 0.25 + (r.l + r.t) * 0.75,
      |    ((e.x * 0.25 + (r.l + r.t) * 0.75) - r.l) * 0.125
      |      + r.t * 0.875
      |  FROM rec r JOIN ev e
      |    ON e.user_id = r.user_id AND e.rn = r.i + 1)
      |SELECT r.user_id, CAST(nn.m AS BIGINT) AS n_obs, r.l AS level,
      |  r.t AS trend, r.l + r.t AS forecast1
      |FROM rec r JOIN nn ON nn.user_id = r.user_id AND r.i = nn.m
      |ORDER BY r.user_id""".stripMargin

  // -------------------------------------------------------------- q203
  /** Categorical encoders (FeatureEncoding.frequencyEncode /
    * targetEncode m=8) over customer market segments with account-
    * balance cents as the target: the two standard high-cardinality
    * encodings, both ending in one/two divisions of exact integer
    * sums — bit-identical doubles cross-engine. One category groupBy
    * + a broadcast 1-row global aggregate; the encoder table joins
    * back by broadcast at feature time. */
  private def q203Encoding(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select(col("c_mktsegment"),
      (col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long").as("bal_cents"))
    val fe = graft.operators.FeatureEncoding
      .frequencyEncode(c, "c_mktsegment")
    val te = graft.operators.FeatureEncoding
      .targetEncode(c, "c_mktsegment", "bal_cents", smoothing = 8)
      .withColumnRenamed("cnt", "cnt_t")
    fe.join(te, Seq("c_mktsegment"))
      .select(col("c_mktsegment"), col("cnt"), col("freq"),
        col("sum_y"), col("enc"))
      .orderBy(col("c_mktsegment"))
  }

  private val q203Sql =
    """WITH b AS (
      |  SELECT c_mktsegment,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS bal_cents
      |  FROM customer),
      |agg AS (
      |  SELECT c_mktsegment, count(*) AS cnt,
      |    CAST(sum(bal_cents) AS BIGINT) AS sum_y
      |  FROM b WHERE bal_cents IS NOT NULL GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(sum_y) AS BIGINT) AS ts,
      |    CAST(sum(cnt) AS BIGINT) AS tc,
      |    CAST(sum(cnt) AS BIGINT) AS n
      |  FROM agg)
      |SELECT a.c_mktsegment, a.cnt,
      |  CAST(a.cnt AS DOUBLE) / t.n AS freq,
      |  a.sum_y,
      |  (CAST(a.sum_y AS DOUBLE)
      |    + 8.0 * (CAST(t.ts AS DOUBLE) / CAST(t.tc AS DOUBLE)))
      |    / CAST(a.cnt + 8 AS DOUBLE) AS enc
      |FROM agg a CROSS JOIN tot t
      |ORDER BY a.c_mktsegment""".stripMargin

  // -------------------------------------------------------------- q199
  /** Weighted discrete percentiles
    * (Quantiles.weightedPercentilesByGroup): per returnflag, the
    * price below which 50% / 90% of the shipped QUANTITY falls —
    * mass-weighted, not row-weighted. Both value and weight are
    * exact integer cents; the rank is ceil(q·ΣW) with the identical
    * double ceil both engines. */
  private def q199WeightedPctile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(col("l_returnflag"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"),
      (col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("long").as("wq"))
    Quantiles.weightedPercentilesByGroup(li, "l_returnflag", "cents",
        "wq", Seq(0.5, 0.9))
      .orderBy(col("l_returnflag"), col("q"))
  }

  private val q199Sql =
    """WITH b AS (
      |  SELECT l_returnflag AS g,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS value,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      |counts AS (
      |  SELECT g, value, CAST(sum(w) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2),
      |totals AS (SELECT g, sum(c) AS n FROM counts GROUP BY 1),
      |cum AS (
      |  SELECT g, value, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY value
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts),
      |ranks AS (
      |  SELECT t.g, qs.q,
      |    GREATEST(1, CAST(ceil(qs.q * CAST(t.n AS DOUBLE)) AS BIGINT))
      |      AS rank
      |  FROM totals t,
      |    (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)])
      |       AS q) qs)
      |SELECT r.g AS l_returnflag, r.q, r.rank, cum.value
      |FROM ranks r JOIN cum
      |  ON cum.g = r.g AND r.rank > cum.cum - cum.c
      |    AND r.rank <= cum.cum
      |ORDER BY l_returnflag, q""".stripMargin

  // -------------------------------------------------------------- q200
  /** Common-neighbor census (Graph.commonNeighborCensus) over the q78
    * graph with the center-degree cap ACTUALLY engaged (cap 10): the
    * link-prediction feature distribution, with the capped-center
    * count in-row so the documented undercount is auditable. The
    * oracle replays the cap. */
  private def q200CommonNeighbors(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.commonNeighborCensus(e, "src", "dst", maxCenterDegree = 10)
      .orderBy(col("cn"))
  }

  private val q200Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (SELECT u AS c, v AS x FROM e0
      |        UNION ALL SELECT v, u FROM e0),
      |deg AS (SELECT c, count(*) AS d FROM adj GROUP BY 1),
      |kept AS (SELECT adj.c, adj.x FROM adj JOIN deg USING (c)
      |         WHERE deg.d <= 10),
      |pairs AS (
      |  SELECT a.x AS a, b.x AS b, count(*) AS cn
      |  FROM kept a JOIN kept b ON a.c = b.c AND a.x < b.x
      |  GROUP BY 1, 2),
      |census AS (SELECT cn, count(*) AS n_pairs FROM pairs GROUP BY 1),
      |capped AS (
      |  SELECT CAST(sum(CASE WHEN d > 10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_capped_centers
      |  FROM deg)
      |SELECT cn, n_pairs, n_capped_centers
      |FROM census CROSS JOIN capped ORDER BY cn""".stripMargin

  // -------------------------------------------------------------- q201
  /** Equi-depth binning (Quantiles.equiDepthBuckets, k=10) over price
    * cents: rank-derived histogram boundaries — ~n/10 rows per bucket
    * however skewed the distribution, bucket = ceil(cum·k/n) in pure
    * integer arithmetic (ntile's row-order-among-duplicates hazard
    * engineered out). */
  private def q201EquiDepth(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.load(s, dir, "lineitem").select(
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"))
    Quantiles.equiDepthBuckets(v, "cents", k = 10).orderBy(col("bucket"))
  }

  private val q201Sql =
    """WITH v AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT) AS value
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |c AS (SELECT value, count(*) AS cnt FROM v GROUP BY 1),
      |t AS (SELECT sum(cnt) AS n FROM c),
      |cu AS (
      |  SELECT value, cnt,
      |    sum(cnt) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM c),
      |b AS (
      |  SELECT (cum * 10 + t.n - 1) // t.n AS bucket, value, cnt
      |  FROM cu CROSS JOIN t)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  count(*) AS n_values, min(value) AS lo, max(value) AS hi
      |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------- q204
  /** Exact ROC-AUC (Evaluation.rocAuc): purchase-vs-rest ranked by
    * event value cents, tie-corrected Mann–Whitney. The doubled U
    * numerator is a pure integer (two-pass distributed prefix over
    * distinct scores — never a global sort); auc is one division. */
  private def q204RocAuc(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select((col("event_type") === "purchase").as("pos"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("score"))
    graft.operators.Evaluation.rocAuc(ev, col("pos"), col("score"))
  }

  private val q204Sql =
    """WITH b AS (
      |  SELECT (event_type = 'purchase') AS pos,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |c AS (
      |  SELECT score,
      |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_c,
      |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS neg_c
      |  FROM b GROUP BY 1),
      |cum AS (
      |  SELECT pos_c, neg_c,
      |    sum(neg_c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
      |      AS cumneg
      |  FROM c)
      |SELECT CAST(sum(pos_c) AS BIGINT) AS n_pos,
      |  CAST(sum(neg_c) AS BIGINT) AS n_neg,
      |  CAST(sum(pos_c * (2 * (cumneg - neg_c) + neg_c)) AS BIGINT)
      |    AS u2,
      |  CAST(sum(pos_c * (2 * (cumneg - neg_c) + neg_c)) AS DOUBLE)
      |    / (2.0 * CAST(sum(pos_c) AS DOUBLE)
      |      * CAST(sum(neg_c) AS DOUBLE)) AS auc
      |FROM cum""".stripMargin

  // -------------------------------------------------------------- q205
  /** First-order Markov transition matrix
    * (EventAnalytics.markovTransitions) over per-user event streams:
    * |types|²-bounded output, one lead() window + two aggregates,
    * transition probability as a single integer division. */
  private def q205Markov(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.markovTransitions(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"), col("to_type"))

  private val q205Sql =
    """WITH p AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS cnt
      |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |r AS (
      |  SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total
      |  FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.cnt, r.row_total,
      |  CAST(c.cnt AS DOUBLE) / CAST(r.row_total AS DOUBLE) AS prob
      |FROM c JOIN r USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // -------------------------------------------------------------- q206
  /** Chi-square independence test (Evaluation.chiSquare) of event
    * type × epoch-weekday: exact integer contingency from three hash
    * aggregates; the order-sensitive double sum of (o−e)²/e folds the
    * ≤|A|·|B| cell terms in sorted key order on both engines. */
  private def q206Chi2(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"),
        (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("wd"))
    graft.operators.Evaluation.chiSquare(ev, "event_type", "wd")
  }

  private val q206Sql =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
      |      AS BIGINT) AS wd
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
      |cells AS (
      |  SELECT event_type AS a, wd AS b, count(*) AS o
      |  FROM b GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
      |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
      |nn AS (SELECT count(*) AS n_a, CAST(sum(ra) AS BIGINT) AS n FROM rt),
      |nb AS (SELECT count(*) AS n_b FROM ct),
      |t AS (
      |  SELECT nn.n, nn.n_a,
      |    CAST(cells.a AS VARCHAR) || '|' || CAST(cells.b AS VARCHAR)
      |      AS k,
      |    (CAST(cells.o AS DOUBLE)
      |      - CAST(rt.ra AS DOUBLE) * CAST(ct.cb AS DOUBLE)
      |        / CAST(nn.n AS DOUBLE))
      |    * (CAST(cells.o AS DOUBLE)
      |      - CAST(rt.ra AS DOUBLE) * CAST(ct.cb AS DOUBLE)
      |        / CAST(nn.n AS DOUBLE))
      |    / (CAST(rt.ra AS DOUBLE) * CAST(ct.cb AS DOUBLE)
      |      / CAST(nn.n AS DOUBLE)) AS term
      |  FROM cells JOIN rt USING (a) JOIN ct ON ct.b = cells.b
      |    CROSS JOIN nn),
      |fold AS (
      |  SELECT n, n_a, list(term ORDER BY k) AS ts FROM t GROUP BY 1, 2)
      |SELECT f.n, f.n_a, nb.n_b,
      |  CAST((f.n_a - 1) * (nb.n_b - 1) AS BIGINT) AS dof,
      |  list_reduce(f.ts, (acc, x) -> acc + x) AS chi2
      |FROM fold f CROSS JOIN nb""".stripMargin

  // -------------------------------------------------------------- q207
  /** CUSUM drift detection (TimeSeries.cusum, k=10000¢ slack,
    * h=50000¢ alarm bar) per user over event value cents. The Page
    * recurrence runs as its reflection closed form — running sum minus
    * running min in ONE user-partitioned window, all BIGINT — so the
    * per-key history never needs collecting, unlike the ewma/holt
    * folds. */
  private def q207Cusum(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.TimeSeries.cusum(ev, Seq("user_id"),
        Seq(unix_micros(col("ts")), col("event_id")), col("cents"),
        k = 10000L, h = 50000L)
      .orderBy(col("user_id"))
  }

  private val q207Sql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) - 10000
      |      AS d
      |  FROM events WHERE value IS NOT NULL),
      |y AS (
      |  SELECT user_id, us, event_id, d,
      |    sum(d) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS y
      |  FROM b),
      |sc AS (
      |  SELECT user_id, d, y,
      |    y - least(0, min(y) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)) AS s
      |  FROM y)
      |SELECT user_id, count(*) AS n_obs,
      |  CAST(max(s) AS BIGINT) AS max_s,
      |  CAST(sum(d) - least(0, min(y)) AS BIGINT) AS final_s,
      |  CAST(sum(CASE WHEN s > 50000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_alarms
      |FROM sc GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q208
  /** Cumulative-distinct (vocabulary-growth) curve
    * (EventAnalytics.distinctSoFar): per user/day new event types and
    * running distinct total — each (user, type) reduced to its first
    * day, then a per-user running sum; distinct is never windowed. */
  private def q208DistinctSoFar(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.distinctSoFar(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_type")
      .orderBy(col("user_id"), col("day"))

  private val q208Sql =
    """WITH f AS (
      |  SELECT user_id, event_type, min(CAST(ts AS DATE)) AS day
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |d AS (
      |  SELECT user_id, day, count(*) AS new_types
      |  FROM f GROUP BY 1, 2)
      |SELECT user_id, day, new_types,
      |  CAST(sum(new_types) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_so_far
      |FROM d ORDER BY user_id, day""".stripMargin

  // -------------------------------------------------------------- q209
  /** Welch's unequal-variance t-test (Evaluation.welchTTest):
    * purchase-vs-view event values in cents. Moments are exact
    * (Σx² in DECIMAL(38,0) — BIGINT drowns near 10⁹ rows); t and the
    * Welch–Satterthwaite dof are single rational+sqrt expressions
    * over them, identical both engines. */
  private def q209Welch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.Evaluation.welchTTest(ev, "event_type", "cents",
      "purchase", "view")
  }

  private val q209Sql =
    """WITH a AS (
      |  SELECT count(*) AS n_a,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS s_a,
      |    sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        AS DECIMAL(38,0))
      |      * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        AS DECIMAL(38,0))) AS ss_a
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |b AS (
      |  SELECT count(*) AS n_b,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS s_b,
      |    sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        AS DECIMAL(38,0))
      |      * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        AS DECIMAL(38,0))) AS ss_b
      |  FROM events WHERE event_type = 'view' AND value IS NOT NULL),
      |m AS (
      |  SELECT n_a, n_b,
      |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
      |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
      |    (CAST(ss_a AS DOUBLE)
      |      - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
      |        / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
      |      AS var_a,
      |    (CAST(ss_b AS DOUBLE)
      |      - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
      |        / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
      |      AS var_b
      |  FROM a CROSS JOIN b),
      |se AS (
      |  SELECT *, var_a / CAST(n_a AS DOUBLE) AS sea,
      |    var_b / CAST(n_b AS DOUBLE) AS seb
      |  FROM m)
      |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
      |  (mean_a - mean_b) / sqrt(sea + seb) AS t_stat,
      |  ((sea + seb) * (sea + seb))
      |    / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
      |      + seb * seb / (CAST(n_b AS DOUBLE) - 1.0)) AS dof
      |FROM se""".stripMargin

  // -------------------------------------------------------------- q210
  /** Gini concentration per returnflag (Evaluation.giniByGroup) over
    * price cents: rank formula from distinct-value mass (tie-safe),
    * DECIMAL(38,0) rank·value accumulation, G as one double
    * expression. */
  private def q210Gini(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.Evaluation.giniByGroup(li, "l_returnflag", "cents")
      .orderBy(col("l_returnflag"))
  }

  private val q210Sql =
    """WITH b AS (
      |  SELECT l_returnflag AS g,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS v
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |c AS (SELECT g, v, count(*) AS c FROM b GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, v, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM c),
      |r AS (SELECT g, v, c, cum, (c * (c + 1)) // 2 AS tri FROM cum),
      |a AS (
      |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
      |    sum(CAST(c AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)))
      |      AS sv,
      |    sum((CAST(c AS DECIMAL(38,0)) * CAST(cum - c AS DECIMAL(38,0))
      |        + CAST(tri AS DECIMAL(38,0)))
      |      * CAST(v AS DECIMAL(38,0))) AS srx
      |  FROM r GROUP BY 1)
      |SELECT g AS l_returnflag, n, CAST(sv AS BIGINT) AS sum_v,
      |  (2.0 * CAST(srx AS DOUBLE)
      |    - (CAST(n AS DOUBLE) + 1.0) * CAST(sv AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)) AS gini
      |FROM a ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------- q215
  /** Isotonic regression / PAVA calibration (Isotonic.fitByGroup):
    * per-user monotone fit of purchase propensity (y = 100·is_purchase)
    * against the value-cents score. The engine runs real
    * stack-based PAVA per group (exact integer block state,
    * cross-multiplied violation test); the oracle replays it through
    * the min–max representation ŷᵢ = min_{k≥i} max_{j≤i} avg(j..k) —
    * O(n²) pairs but algebraically the same fit, and since rounding
    * rationals to doubles is monotone, min/max of the rounded
    * averages lands on the identical block-mean division both
    * engines. */
  private def q215Isotonic(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("x"),
        when(col("event_type") === "purchase", 100L).otherwise(0L)
          .as("y"))
    graft.operators.Isotonic.fitByGroup(ev, "user_id", "x", "y")
      .orderBy(col("user_id"), col("x"))
  }

  private val q215Sql =
    """WITH b AS (
      |  SELECT user_id AS g,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
      |    CASE WHEN event_type = 'purchase' THEN 100 ELSE 0 END AS y
      |  FROM events WHERE value IS NOT NULL),
      |cells AS (
      |  SELECT g, x, count(*) AS w, CAST(sum(y) AS BIGINT) AS s
      |  FROM b GROUP BY 1, 2),
      |ord AS (
      |  SELECT g, x, w, s,
      |    row_number() OVER (PARTITION BY g ORDER BY x) AS rn
      |  FROM cells),
      |pre AS (
      |  SELECT g, x, w, s, rn,
      |    sum(w) OVER (PARTITION BY g ORDER BY rn
      |      ROWS UNBOUNDED PRECEDING) AS cw,
      |    sum(s) OVER (PARTITION BY g ORDER BY rn
      |      ROWS UNBOUNDED PRECEDING) AS cs
      |  FROM ord),
      |p0 AS (SELECT g, rn, cw, cs FROM pre
      |       UNION ALL
      |       SELECT g, 0, 0, 0 FROM (SELECT DISTINCT g FROM pre)),
      |pairs AS (
      |  SELECT p.g, jj.rn + 1 AS j, p.rn AS k,
      |    CAST(p.cs - jj.cs AS DOUBLE) / CAST(p.cw - jj.cw AS DOUBLE)
      |      AS a
      |  FROM pre p JOIN p0 jj ON jj.g = p.g AND jj.rn < p.rn),
      |mx AS (SELECT g, j, k,
      |  max(a) OVER (PARTITION BY g, k ORDER BY j
      |    ROWS UNBOUNDED PRECEDING) AS m
      |  FROM pairs),
      |mn AS (SELECT g, j, k,
      |  min(m) OVER (PARTITION BY g, j ORDER BY k DESC
      |    ROWS UNBOUNDED PRECEDING) AS f
      |  FROM mx),
      |fit AS (SELECT g AS fg, j AS rn, f FROM mn WHERE k = j)
      |SELECT o.g AS user_id, o.x, o.w, fit.f AS fit
      |FROM ord o JOIN fit ON fit.fg = o.g AND fit.rn = o.rn
      |ORDER BY user_id, x""".stripMargin

  // -------------------------------------------------------------- q216
  /** Gains / decile-lift chart (Evaluation.gainsChart, k=10):
    * purchase capture by value-cents decile — equi-depth integer
    * bucketing, per-decile rate and lift, cumulative gain from the
    * top decile via a k×k triangular self-join (no global window).
    * Every ratio a single division of exact counts. */
  private def q216Gains(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select((col("event_type") === "purchase").as("pos"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("score"))
    graft.operators.Evaluation
      .gainsChart(ev, col("pos"), col("score"), k = 10)
      .orderBy(col("bucket"))
  }

  private val q216Sql =
    """WITH b AS (
      |  SELECT (event_type = 'purchase') AS pos,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |c AS (
      |  SELECT score, count(*) AS all_c,
      |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_c
      |  FROM b GROUP BY 1),
      |t AS (SELECT sum(all_c) AS n FROM c),
      |cum AS (
      |  SELECT score, all_c, pos_c,
      |    sum(all_c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
      |      AS cm
      |  FROM c),
      |bk AS (
      |  SELECT (cm * 10 + t.n - 1) // t.n AS bucket, all_c, pos_c
      |  FROM cum CROSS JOIN t),
      |agg AS (
      |  SELECT bucket, CAST(sum(all_c) AS BIGINT) AS n_rows,
      |    CAST(sum(pos_c) AS BIGINT) AS n_pos
      |  FROM bk GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n_rows) AS BIGINT) AS tn,
      |    CAST(sum(n_pos) AS BIGINT) AS tp
      |  FROM agg),
      |cg AS (
      |  SELECT a.bucket, CAST(sum(c2.n_pos) AS BIGINT) AS cum_pos
      |  FROM agg a JOIN agg c2 ON c2.bucket >= a.bucket
      |  GROUP BY 1)
      |SELECT CAST(a.bucket AS BIGINT) AS bucket, a.n_rows, a.n_pos,
      |  CAST(a.n_pos AS DOUBLE) / CAST(a.n_rows AS DOUBLE) AS rate,
      |  (CAST(a.n_pos AS DOUBLE) * CAST(tot.tn AS DOUBLE))
      |    / (CAST(a.n_rows AS DOUBLE) * CAST(tot.tp AS DOUBLE)) AS lift,
      |  cg.cum_pos,
      |  CAST(cg.cum_pos AS DOUBLE) / CAST(tot.tp AS DOUBLE) AS cum_gain
      |FROM agg a JOIN cg ON cg.bucket = a.bucket CROSS JOIN tot
      |ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------- q217
  /** Concentration battery (Evaluation.concentrationByGroup):
    * language-mix concentration per document source — Simpson's λ,
    * HHI, top share. Log-free diversity (Shannon's ln is libm-
    * dependent; these are pure rationals over exact counts). */
  private def q217Concentration(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation.concentrationByGroup(
        Tables.load(s, dir, "documents"), "source", "lang")
      .orderBy(col("source"))

  private val q217Sql =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS c
      |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
      |a AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
      |    count(*) AS n_cats,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS simpson_num,
      |    CAST(sum(c * c) AS BIGINT) AS sq_num,
      |    CAST(max(c) AS BIGINT) AS top_c
      |  FROM cells GROUP BY 1)
      |SELECT source, n, n_cats, simpson_num, sq_num, top_c,
      |  CASE WHEN n > 1 THEN CAST(simpson_num AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |    ELSE 0.0 END AS simpson,
      |  CAST(sq_num AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS hhi,
      |  CAST(top_c AS DOUBLE) / CAST(n AS DOUBLE) AS top_share
      |FROM a ORDER BY source""".stripMargin

  // -------------------------------------------------------------- q218
  /** Inter-arrival burstiness (EventAnalytics.interArrivalStats):
    * per-user gap stats in exact integer microseconds, CV² and the
    * Goh–Barabási burstiness from rational+sqrt derivations. One
    * user-partitioned lag window + one aggregate. */
  private def q218Burstiness(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.interArrivalStats(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_id")
      .orderBy(col("user_id"))

  private val q218Sql =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events),
      |a AS (
      |  SELECT user_id, count(*) AS n_gaps,
      |    CAST(sum(gap) AS BIGINT) AS sum_gap_us,
      |    sum(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
      |      AS sg2
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
      |d AS (
      |  SELECT user_id, n_gaps, sum_gap_us,
      |    CAST(sum_gap_us AS DOUBLE) / CAST(n_gaps AS DOUBLE)
      |      AS mean_gap_us,
      |    (CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE))
      |      / (CAST(sum_gap_us AS DOUBLE) * CAST(sum_gap_us AS DOUBLE))
      |      - 1.0 AS cv2
      |  FROM a)
      |SELECT user_id, n_gaps, sum_gap_us, mean_gap_us, cv2,
      |  (sqrt(greatest(cv2, 0.0)) - 1.0)
      |    / (sqrt(greatest(cv2, 0.0)) + 1.0) AS burstiness
      |FROM d ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q220
  /** Weekday seasonal index (TimeSeries.seasonalIndex): per event
    * type, each epoch-weekday's mean value cents relative to the
    * type's overall mean — exact integer sums, index one double
    * expression. Two aggregates + a broadcast join. */
  private def q220Seasonal(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("wd"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.TimeSeries.seasonalIndex(ev, Seq("event_type"),
        col("wd"), col("cents"))
      .orderBy(col("event_type"), col("bucket"))
  }

  private val q220Sql =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
      |      AS BIGINT) AS wd,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL
      |    AND ts IS NOT NULL),
      |cells AS (
      |  SELECT event_type, wd AS bucket, count(*) AS n,
      |    CAST(sum(cents) AS BIGINT) AS sum_v
      |  FROM b GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS tn,
      |    CAST(sum(sum_v) AS BIGINT) AS ts
      |  FROM cells GROUP BY 1)
      |SELECT c.event_type, c.bucket, c.n, c.sum_v,
      |  (CAST(c.sum_v AS DOUBLE) * CAST(t.tn AS DOUBLE))
      |    / (CAST(c.n AS DOUBLE) * CAST(t.ts AS DOUBLE)) AS s_index
      |FROM cells c JOIN tot t USING (event_type)
      |ORDER BY event_type, bucket""".stripMargin

  // -------------------------------------------------------------- q221
  /** Lag-1 autocorrelation (TimeSeries.lagAutocorr) of per-user event
    * value cents: serial dependence from exact integer moments
    * (DECIMAL(38,0) products), r in one rational+sqrt expression,
    * NULL on degenerate variance. */
  private def q221Autocorr(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.TimeSeries.lagAutocorr(ev, Seq("user_id"),
        Seq(unix_micros(col("ts")), col("event_id")), col("cents"))
      .orderBy(col("user_id"))
  }

  private val q221Sql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM events WHERE value IS NOT NULL),
      |p AS (
      |  SELECT user_id, y,
      |    lag(y) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS x
      |  FROM b),
      |m AS (
      |  SELECT user_id, count(*) AS n_pairs,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
      |      AS sxx,
      |    sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
      |      AS syy,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
      |      AS sxy
      |  FROM p WHERE x IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_pairs,
      |  CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0
      |      AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
      |    THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    ELSE NULL END AS r1
      |FROM m ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q223
  /** Neighborhood Jaccard for existing edges
    * (Graph.neighborhoodJaccard) over the q200 graph with the
    * center-degree cap engaged (10): per-edge common-neighbor count,
    * endpoint degrees, and J = cn/(du+dv−2−cn) — exact counts, one
    * division, isolated edges pinned to 0. The oracle replays the
    * cap. */
  private def q223NeighborhoodJaccard(s: SparkSession,
      dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.neighborhoodJaccard(e, "src", "dst", maxCenterDegree = 10)
      .orderBy(col("u"), col("v"))
  }

  private val q223Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (SELECT u AS c, v AS x FROM e0
      |        UNION ALL SELECT v, u FROM e0),
      |deg AS (SELECT c, count(*) AS d FROM adj GROUP BY 1),
      |kept AS (SELECT adj.c, adj.x FROM adj JOIN deg USING (c)
      |         WHERE deg.d <= 10),
      |cn AS (
      |  SELECT a.x AS a, b.x AS b, count(*) AS cn
      |  FROM kept a JOIN kept b ON a.c = b.c AND a.x < b.x
      |  GROUP BY 1, 2)
      |SELECT e0.u, e0.v, coalesce(cn.cn, 0) AS cn,
      |  d1.d AS du, d2.d AS dv,
      |  CASE WHEN d1.d + d2.d - 2 - coalesce(cn.cn, 0) > 0
      |    THEN CAST(coalesce(cn.cn, 0) AS DOUBLE)
      |      / CAST(d1.d + d2.d - 2 - coalesce(cn.cn, 0) AS DOUBLE)
      |    ELSE 0.0 END AS jaccard
      |FROM e0
      |  LEFT JOIN cn ON cn.a = e0.u AND cn.b = e0.v
      |  JOIN deg d1 ON d1.c = e0.u
      |  JOIN deg d2 ON d2.c = e0.v
      |ORDER BY u, v""".stripMargin

  // -------------------------------------------------------------- q227
  /** Stratified ROC-AUC (Evaluation.rocAucByGroup): per user cohort
    * (user_id mod 5), the tie-corrected Mann–Whitney AUC of
    * purchase-vs-rest on value cents — group-partitioned prefix over
    * distinct-score mass, integer u2, one division. */
  private def q227AucByGroup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(pmod(col("user_id"), lit(5L)).as("cohort"),
        (col("event_type") === "purchase").as("pos"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("score"))
    graft.operators.Evaluation
      .rocAucByGroup(ev, "cohort", col("pos"), col("score"))
      .orderBy(col("cohort"))
  }

  private val q227Sql =
    """WITH b AS (
      |  SELECT user_id % 5 AS cohort,
      |    (event_type = 'purchase') AS pos,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |c AS (
      |  SELECT cohort, score,
      |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
      |      AS pos_c,
      |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
      |      AS neg_c
      |  FROM b GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, pos_c, neg_c,
      |    sum(neg_c) OVER (PARTITION BY cohort ORDER BY score
      |      ROWS UNBOUNDED PRECEDING) AS cumneg
      |  FROM c)
      |SELECT cohort, CAST(sum(pos_c) AS BIGINT) AS n_pos,
      |  CAST(sum(neg_c) AS BIGINT) AS n_neg,
      |  CAST(sum(pos_c * (2 * (cumneg - neg_c) + neg_c)) AS BIGINT)
      |    AS u2,
      |  CAST(sum(pos_c * (2 * (cumneg - neg_c) + neg_c)) AS DOUBLE)
      |    / (2.0 * CAST(sum(pos_c) AS DOUBLE)
      |      * CAST(sum(neg_c) AS DOUBLE)) AS auc
      |FROM cum GROUP BY cohort ORDER BY cohort""".stripMargin

  // -------------------------------------------------------------- q228
  /** Exact two-sample Kolmogorov–Smirnov (Evaluation.ksTest):
    * purchase vs view value distributions — the D argmax decided by
    * the integer cross-multiplied ECDF gap |cum_a·n_b − cum_b·n_a|,
    * only the final D a division. Two-pass distributed prefix, no
    * global sort. */
  private def q228KsTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
    graft.operators.Evaluation.ksTest(ev, "event_type", "cents",
      "purchase", "view")
  }

  private val q228Sql =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL
      |    AND event_type IN ('purchase', 'view')),
      |c AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM b GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS na,
      |    CAST(sum(cb) AS BIGINT) AS nb
      |  FROM c),
      |cum AS (
      |  SELECT v,
      |    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
      |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM c)
      |SELECT t.na AS n_a, t.nb AS n_b,
      |  CAST(max(abs(cuma * t.nb - cumb * t.na)) AS BIGINT) AS d_num,
      |  CAST(max(abs(cuma * t.nb - cumb * t.na)) AS DOUBLE)
      |    / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS d
      |FROM cum CROSS JOIN t GROUP BY t.na, t.nb""".stripMargin

  // -------------------------------------------------------------- q233
  /** Spearman rank correlation (Evaluation.spearmanByGroup) between
    * value cents and user id per event type — tie-averaged ranks
    * carried as doubled integers, BIGINT moments, one double ρ. */
  private def q233Spearman(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("x"),
        col("user_id").as("y"))
    graft.operators.Evaluation
      .spearmanByGroup(ev, "g", col("x"), col("y"))
      .orderBy(col("g"))
  }

  private val q233Sql =
    """WITH b AS (
      |  SELECT event_type AS g,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
      |    user_id AS y
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT g,
      |    2 * rank() OVER (PARTITION BY g ORDER BY x)
      |      + count(*) OVER (PARTITION BY g, x) - 1 AS u,
      |    2 * rank() OVER (PARTITION BY g ORDER BY y)
      |      + count(*) OVER (PARTITION BY g, y) - 1 AS v
      |  FROM b),
      |m AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
      |    CAST(sum(u * v) AS BIGINT) AS suv,
      |    CAST(sum(u * u) AS BIGINT) AS su2,
      |    CAST(sum(v * v) AS BIGINT) AS sv2
      |  FROM r GROUP BY g)
      |SELECT g, n, su, sv, suv, su2, sv2,
      |  (CAST(n AS DOUBLE) * CAST(suv AS DOUBLE)
      |    - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE))
      |  / sqrt((CAST(n AS DOUBLE) * CAST(su2 AS DOUBLE)
      |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
      |    * (CAST(n AS DOUBLE) * CAST(sv2 AS DOUBLE)
      |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))) AS rho
      |FROM m ORDER BY g""".stripMargin

  // -------------------------------------------------------------- q234
  /** Degree assortativity (Graph.degreeAssortativity) of the synthetic
    * order–part graph — symmetric stub moments as BIGINTs, Newman's r
    * one double derivation. */
  private def q234Assortativity(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    graft.operators.Graph.degreeAssortativity(e, "src", "dst")
  }

  private val q234Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE l_orderkey % 20000 <> (l_partkey * 7) % 20000),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
      |    SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
      |  GROUP BY n),
      |j AS (
      |  SELECT d1.d AS du, d2.d AS dv
      |  FROM e0 JOIN deg d1 ON d1.n = e0.u
      |    JOIN deg d2 ON d2.n = e0.v),
      |st AS (
      |  SELECT du AS x, dv AS y FROM j
      |  UNION ALL SELECT dv, du FROM j),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m2,
      |    CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sx2,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM st)
      |SELECT m2, sx, sx2, sxy,
      |  (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |  / (CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS r
      |FROM m""".stripMargin

  // -------------------------------------------------------------- q235
  /** Mann–Kendall trend test (TimeSeries.mannKendall) on daily cents
    * totals per event type — integer S and var18, z the only
    * division. */
  private def q235MannKendall(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        col("ts").cast("date").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy(col("g"), col("day")).agg(sum(col("cents")).as("tot"))
    graft.operators.TimeSeries
      .mannKendall(d, Seq("g"), col("day"), col("tot"))
      .orderBy(col("g"))
  }

  private val q235Sql =
    """WITH d AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS tot
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |p AS (
      |  SELECT a.g AS g,
      |    CASE WHEN b.tot > a.tot THEN 1
      |         WHEN b.tot < a.tot THEN -1 ELSE 0 END AS sgn
      |  FROM d a JOIN d b ON a.g = b.g AND a.day < b.day),
      |s AS (SELECT g, CAST(sum(sgn) AS BIGINT) AS s_stat
      |  FROM p GROUP BY g),
      |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY g),
      |ties AS (
      |  SELECT g, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
      |    AS tie18
      |  FROM (SELECT g, tot, CAST(count(*) AS BIGINT) AS t FROM d
      |        GROUP BY 1, 2) GROUP BY g)
      |SELECT n.g AS g, n.n AS n, s.s_stat AS s_stat,
      |  n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18 AS var18,
      |  CASE WHEN s.s_stat > 0 THEN
      |      CAST(s.s_stat - 1 AS DOUBLE)
      |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18
      |          AS DOUBLE) / 18.0)
      |    WHEN s.s_stat < 0 THEN
      |      CAST(s.s_stat + 1 AS DOUBLE)
      |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18
      |          AS DOUBLE) / 18.0)
      |    ELSE 0.0 END AS z
      |FROM n JOIN ties ON n.g = ties.g JOIN s ON n.g = s.g
      |ORDER BY g""".stripMargin

  // -------------------------------------------------------------- q236
  /** Theil–Sen slope (TimeSeries.theilSen) of daily cents totals per
    * event type — lower median of the pairwise rational slopes, picked
    * on a (slope, num, den) total order; integer num/den returned. */
  private def q236TheilSen(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        col("ts").cast("date").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy(col("g"), col("day")).agg(sum(col("cents")).as("tot"))
    graft.operators.TimeSeries
      .theilSen(d, Seq("g"),
        datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"),
        col("tot"))
      .orderBy(col("g"))
  }

  private val q236Sql =
    """WITH d AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS tot
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |p AS (
      |  SELECT a.g AS g, b.tot - a.tot AS num,
      |    date_diff('day', a.day, b.day) AS den
      |  FROM d a JOIN d b ON a.g = b.g AND a.day < b.day),
      |q AS (
      |  SELECT g, num, den,
      |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope,
      |    row_number() OVER (PARTITION BY g ORDER BY
      |      CAST(num AS DOUBLE) / CAST(den AS DOUBLE), num, den) AS rn,
      |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS np
      |  FROM p)
      |SELECT g, np AS n_pairs, num AS med_num,
      |  CAST(den AS BIGINT) AS med_den, slope
      |FROM q WHERE rn = (np + 1) // 2 ORDER BY g""".stripMargin

  // -------------------------------------------------------------- q238
  /** Multi-touch attribution (EventAnalytics.attribution): purchases
    * distribute exactly 1000 integer milli-credits over the user's
    * prior touches — per-touch 1000 div n, remainder to the earliest
    * touch — plus first/last-touch counts. No float credit exists. */
  private def q238Attribution(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics
      .attribution(Tables.load(s, dir, "events"), "user_id", "ts",
        "event_type", convType = "purchase", tiebreakCol = "event_id")
      .orderBy(col("channel"))

  private val q238Sql =
    """WITH t AS (
      |  SELECT user_id AS u, ts AS tt, event_id AS ti,
      |    event_type AS channel
      |  FROM events WHERE event_type <> 'purchase'),
      |c AS (
      |  SELECT user_id AS u, ts AS ct, event_id AS ci
      |  FROM events WHERE event_type = 'purchase'),
      |p AS (
      |  SELECT t.channel,
      |    count(*) OVER (PARTITION BY t.u, c.ct, c.ci) AS n,
      |    row_number() OVER (PARTITION BY t.u, c.ct, c.ci
      |      ORDER BY t.tt, t.ti) AS rk
      |  FROM t JOIN c ON t.u = c.u AND t.tt < c.ct)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_touch_pairs,
      |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS first_touch,
      |  CAST(sum(CASE WHEN rk = n THEN 1 ELSE 0 END) AS BIGINT)
      |    AS last_touch,
      |  CAST(sum(1000 // n
      |    + CASE WHEN rk = 1 THEN 1000 % n ELSE 0 END) AS BIGINT)
      |    AS milli_credit
      |FROM p GROUP BY channel ORDER BY channel""".stripMargin

  // -------------------------------------------------------------- q241
  /** RFM segmentation on ECDF quintiles (Quantiles.valueBuckets):
    * score = ⌈5·cum/n⌉ per metric VALUE — ties share a score, the
    * prefix sum is the two-pass distributed form, and no global ntile
    * sort exists (a single ntile(5) over all users is a one-partition
    * exchange — the plan lint rejects it). 3-digit segment rollup. */
  private def q241Rfm(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quantiles
    // persisted: m feeds three valueBuckets passes (each runs an
    // eager count() plus an ecdf aggregate) AND three join branches —
    // unpersisted, the events scan+aggregate reruns ~7 times
    val m = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(col("ts").cast("date")).as("last_day"),
        count(lit(1)).as("f"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      .persist()
    def scoreMap(vc: String, out: String): DataFrame =
      Quantiles.valueBuckets(m.select(col(vc).as("value")), "value", 5)
        .select(col("value").as(vc), col("bucket").as(out))
    val sc = m
      .join(scoreMap("last_day", "r_score"), Seq("last_day"))
      .join(scoreMap("f", "f_score"), Seq("f"))
      .join(scoreMap("cents", "m_score"), Seq("cents"))
    sc.groupBy((col("r_score") * 100 + col("f_score") * 10 +
        col("m_score")).cast("long").as("segment"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("segment"))
  }

  private val q241Sql =
    """WITH m AS (
      |  SELECT user_id,
      |    max(CAST(ts AS DATE)) AS last_day,
      |    CAST(count(*) AS BIGINT) AS f,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
      |rb AS (SELECT v, (cum * 5 + n.n - 1) // n.n AS s FROM (
      |    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS cum
      |    FROM (SELECT last_day AS v, count(*) AS c FROM m GROUP BY 1))
      |  CROSS JOIN n),
      |fb AS (SELECT v, (cum * 5 + n.n - 1) // n.n AS s FROM (
      |    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS cum
      |    FROM (SELECT f AS v, count(*) AS c FROM m GROUP BY 1))
      |  CROSS JOIN n),
      |mb AS (SELECT v, (cum * 5 + n.n - 1) // n.n AS s FROM (
      |    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS cum
      |    FROM (SELECT cents AS v, count(*) AS c FROM m GROUP BY 1))
      |  CROSS JOIN n),
      |sc AS (
      |  SELECT m.cents, rb.s AS r_score, fb.s AS f_score,
      |    mb.s AS m_score
      |  FROM m JOIN rb ON rb.v = m.last_day
      |    JOIN fb ON fb.v = m.f
      |    JOIN mb ON mb.v = m.cents)
      |SELECT
      |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
      |    AS segment,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q242
  /** Benford first-digit census in one SQL text: exact digit counts,
    * observed share, and per-digit χ² terms against log10(1+1/d)
    * expectations pinned as E0 double literals — identical constants,
    * identical derivation, no transcendental evaluated at runtime. */
  private def q242Benford(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql(q242Sql)
  }

  private val q242Sql =
    """WITH v AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    AS cents
      |  FROM events WHERE value IS NOT NULL
      |    AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
      |d AS (
      |  SELECT substring(CAST(cents AS STRING), 1, 1) AS digit,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM v GROUP BY 1),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM d),
      |e AS (
      |  SELECT digit, cnt,
      |    CASE digit WHEN '1' THEN 0.30102999566398120E0
      |      WHEN '2' THEN 0.17609125905568124E0
      |      WHEN '3' THEN 0.12493873660829993E0
      |      WHEN '4' THEN 0.09691001300805642E0
      |      WHEN '5' THEN 0.07918124604762482E0
      |      WHEN '6' THEN 0.06694678963061322E0
      |      WHEN '7' THEN 0.05799194697768673E0
      |      WHEN '8' THEN 0.05115252244738129E0
      |      WHEN '9' THEN 0.04575749056067514E0
      |    END AS exp_p
      |  FROM d)
      |SELECT e.digit AS digit, e.cnt AS cnt,
      |  CAST(e.cnt AS DOUBLE) / CAST(t.n AS DOUBLE) AS obs_p,
      |  e.exp_p AS exp_p,
      |  (CAST(e.cnt AS DOUBLE) - e.exp_p * CAST(t.n AS DOUBLE))
      |    * (CAST(e.cnt AS DOUBLE) - e.exp_p * CAST(t.n AS DOUBLE))
      |    / (e.exp_p * CAST(t.n AS DOUBLE)) AS chi2_term
      |FROM e CROSS JOIN t ORDER BY digit""".stripMargin

  // -------------------------------------------------------------- q243
  /** Kaplan–Meier survival (Evaluation.kaplanMeier): day-of-month
    * durations per event type, event_id-mod censoring; d/n integers
    * exact, S(t) an ordered prefix fold the oracle's list_reduce
    * replays in the identical association. */
  private def q243KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events").select(
      col("event_type").as("g"),
      dayofmonth(col("ts")).cast("long").as("dur"),
      (col("event_id") % 4 =!= 0).as("ev"))
    graft.operators.Evaluation.kaplanMeier(ev, "g", col("dur"),
      col("ev")).orderBy(col("g"), col("t"))
  }

  private val q243Sql =
    """WITH b AS (
      |  SELECT event_type AS g,
      |    CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS t,
      |    (event_id % 4 <> 0) AS ev
      |  FROM events),
      |c AS (
      |  SELECT g, t,
      |    CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS cc
      |  FROM b GROUP BY 1, 2),
      |a AS (
      |  SELECT g, t, d,
      |    CAST(sum(d + cc) OVER (PARTITION BY g)
      |      - (sum(d + cc) OVER (PARTITION BY g ORDER BY t
      |           ROWS UNBOUNDED PRECEDING) - d - cc) AS BIGINT) AS n
      |  FROM c),
      |st AS (
      |  SELECT g, t, d, n,
      |    1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS f
      |  FROM a WHERE d > 0),
      |ag AS (
      |  SELECT g,
      |    list_sort(list({'t': t, 'd': d, 'n': n, 'f': f})) AS s
      |  FROM st GROUP BY g),
      |ex AS (
      |  SELECT g, s, list_transform(s, e -> e.f) AS fs,
      |    unnest(generate_series(1, len(s))) AS i
      |  FROM ag)
      |SELECT g, s[i].t AS t, s[i].d AS d, s[i].n AS n_risk,
      |  list_reduce(fs[1:i], (acc, x) -> acc * x) AS survival
      |FROM ex ORDER BY g, t""".stripMargin

  // -------------------------------------------------------------- q245
  /** Best single changepoint (TimeSeries.changepoint) on daily cents
    * totals per event type: split cost from exact integer prefix
    * sums, argmin on a (cost, k) total order. */
  private def q245Changepoint(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        col("ts").cast("date").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy(col("g"), col("day")).agg(sum(col("cents")).as("tot"))
    graft.operators.TimeSeries
      .changepoint(d, Seq("g"), col("day"), col("tot"))
      .orderBy(col("g"))
  }

  private val q245Sql =
    """WITH d AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |w AS (
      |  SELECT g, day, y,
      |    CAST(row_number() OVER (PARTITION BY g ORDER BY day)
      |      AS BIGINT) AS k,
      |    CAST(sum(y) OVER (PARTITION BY g ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
      |    CAST(sum(y * y) OVER (PARTITION BY g ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s2l,
      |    CAST(sum(y) OVER (PARTITION BY g) AS BIGINT) AS st,
      |    CAST(sum(y * y) OVER (PARTITION BY g) AS BIGINT) AS s2t,
      |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
      |  FROM d),
      |c AS (
      |  SELECT g, n, k, day,
      |    (CAST(s2l AS DOUBLE)
      |      - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
      |        / CAST(k AS DOUBLE))
      |    + (CAST(s2t - s2l AS DOUBLE)
      |      - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
      |        / CAST(n - k AS DOUBLE)) AS cost
      |  FROM w WHERE k < n),
      |r AS (
      |  SELECT g, n, k, day, cost,
      |    row_number() OVER (PARTITION BY g ORDER BY cost, k) AS rn
      |  FROM c)
      |SELECT g, n, k AS split_k, day AS split_x, cost
      |FROM r WHERE rn = 1 ORDER BY g""".stripMargin

  // -------------------------------------------------------------- q254
  /** Calibration / reliability bins: purchase rate per fixed-width
    * score decile — exact integer counts, rate the only division.
    * value >= 0 is filtered explicitly so Spark `div` (truncating)
    * == DuckDB `//` (flooring): both operands non-negative. */
  private def q254Calibration(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("value") >= 0)
      .select(expr(
        "(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 1000)" +
          " div 100").as("bin"),
        (col("event_type") === "purchase").as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("rate"))
      .orderBy(col("bin"))
  }

  private val q254Sql =
    """SELECT
      |  (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 1000)
      |    // 100 AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_pos,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS rate
      |FROM events WHERE value IS NOT NULL AND value >= 0
      |GROUP BY 1 ORDER BY bin""".stripMargin

  // -------------------------------------------------------------- q255
  /** Gaps-and-islands: maximal runs of the same event type per user
    * via the classic row_number-difference grouping, over the (ts,
    * event_id) total order — one SQL text both engines run. */
  private def q255GapsIslands(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql(q255Sql)
  }

  private val q255Sql =
    """WITH b AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rnt
      |  FROM events)
      |SELECT user_id, event_type, min(ts) AS run_start,
      |  CAST(count(*) AS BIGINT) AS run_len,
      |  min(event_id) AS first_event
      |FROM b GROUP BY user_id, event_type, rn - rnt
      |ORDER BY user_id, run_start, first_event""".stripMargin

  // -------------------------------------------------------------- q256
  /** Event path trigrams: top 3-step event-type paths per the (ts,
    * event_id) order, via two lead() columns — linear, no self-join;
    * one SQL text both engines run. */
  private def q256EventTrigrams(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events").createOrReplaceTempView("events")
    s.sql(q256Sql)
  }

  private val q256Sql =
    """WITH b AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t3
      |  FROM events)
      |SELECT event_type || '>' || t2 || '>' || t3 AS path,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM b WHERE t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 40""".stripMargin

  // -------------------------------------------------------------- q257
  /** ABC / Pareto revenue classes per brand: parts ranked by
    * revenue inside each brand partition (parallel windows, no global
    * sort), class thresholds decided by INTEGER cross-multiplication
    * (cum·5 ≤ tot·4 is the 80% line — no float compare). One SQL
    * text both engines run. */
  private def q257AbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    Tables.load(s, dir, "part").createOrReplaceTempView("part")
    s.sql(q257Sql)
  }

  private val q257Sql =
    """WITH r AS (
      |  SELECT p.p_brand AS brand, l.l_partkey AS pk,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT brand, pk, rev,
      |    sum(rev) OVER (PARTITION BY brand ORDER BY rev DESC, pk
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(rev) OVER (PARTITION BY brand) AS tot
      |  FROM r),
      |k AS (
      |  SELECT brand, rev,
      |    CASE WHEN cum * 5 <= tot * 4 THEN 'A'
      |         WHEN cum * 20 <= tot * 19 THEN 'B'
      |         ELSE 'C' END AS abc
      |  FROM c)
      |SELECT brand, abc, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(rev) AS BIGINT) AS revenue
      |FROM k GROUP BY 1, 2 ORDER BY brand, abc""".stripMargin

  // -------------------------------------------------------------- q261
  /** Batch hopping windows via the built-in window() function (24 h
    * duration, 6 h slide → every event lands in exactly 4 windows,
    * epoch-aligned). The oracle replays the window arithmetic in
    * integer microseconds: start = ⌊t/slide⌋·slide − i·slide. */
  private def q261HoppingWindows(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "24 hours", "6 hours"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_cents"))
      .orderBy(col("w_start"), col("event_type"))

  private val q261Sql =
    """WITH b AS (
      |  SELECT event_type, epoch_us(ts) AS t,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |w AS (
      |  SELECT event_type, cents,
      |    make_timestamp((t // 21600000000) * 21600000000
      |      - i.i * 21600000000) AS w_start
      |  FROM b, (SELECT unnest([0, 1, 2, 3]) AS i) i)
      |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  // -------------------------------------------------------------- q262
  /** Token-bucket rate-limit replay (EventAnalytics.tokenBucket):
    * capacity 3, cost 1, refill 1/hour — all state integral, the
    * oracle steps the same recurrence with a RECURSIVE CTE (DuckDB's
    * struct-fold lambda is unusable for multi-field state; see
    * ORACLE_NOTES). */
  private def q262TokenBucket(s: SparkSession, dir: String): DataFrame =
    graft.operators.EventAnalytics
      .tokenBucket(Tables.load(s, dir, "events"), "user_id", "ts",
        "event_id", capacity = 3L, costPerEvent = 1L,
        refillPerHour = 1L)
      .orderBy(col("user_id"))

  private val q262Sql =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, epoch_us(ts) AS t,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |nn AS (SELECT user_id, max(rn) AS m FROM ev GROUP BY 1),
      |rec AS (
      |  -- capacity 3 >= cost 1: the first event is always accepted
      |  SELECT e.user_id, CAST(1 AS BIGINT) AS i, e.t AS pt,
      |    CAST(2 AS BIGINT) AS tok, CAST(1 AS BIGINT) AS acc,
      |    CAST(0 AS BIGINT) AS rej
      |  FROM ev e WHERE e.rn = 1
      |  UNION ALL
      |  SELECT r.user_id, r.i + 1, e.t,
      |    CASE WHEN least(3, r.tok + (e.t - r.pt) // 3600000000) >= 1
      |      THEN least(3, r.tok + (e.t - r.pt) // 3600000000) - 1
      |      ELSE least(3, r.tok + (e.t - r.pt) // 3600000000) END,
      |    r.acc + CASE WHEN least(3,
      |      r.tok + (e.t - r.pt) // 3600000000) >= 1
      |      THEN 1 ELSE 0 END,
      |    r.rej + CASE WHEN least(3,
      |      r.tok + (e.t - r.pt) // 3600000000) >= 1
      |      THEN 0 ELSE 1 END
      |  FROM rec r JOIN ev e
      |    ON e.user_id = r.user_id AND e.rn = r.i + 1)
      |SELECT r.user_id AS user_id, nn.m AS n_events,
      |  r.acc AS n_accepted, r.rej AS n_rejected,
      |  r.tok AS final_tokens
      |FROM rec r JOIN nn ON nn.user_id = r.user_id AND r.i = nn.m
      |ORDER BY r.user_id""".stripMargin

  // -------------------------------------------------------------- q263
  /** One-way ANOVA F on cents by event type: per-group moments are
    * exact BIGINTs; the 5 per-group double terms s²/n are summed by
    * an ORDERED fold (sorted by group, left fold — a 5-element sum is
    * still order-sensitive in floats), and F is one expression. */
  private def q263Anova(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sq"))
    val agg = g.agg(
      count(lit(1)).as("k"),
      sum(col("n")).as("n_tot"), sum(col("sx")).as("sx_tot"),
      sum(col("sq")).as("sq_tot"),
      sort_array(collect_list(struct(col("g"),
        (col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double")).as("term")))).as("terms"))
    val ssbPart = aggregate(col("terms"), lit(0.0),
      (acc, t) => acc + t.getField("term"))
    agg.select(col("k"), col("n_tot"),
        ssbPart.as("__sp"), col("sx_tot"), col("sq_tot"))
      .select(col("k"), col("n_tot"),
        (col("__sp") - col("sx_tot").cast("double") *
          col("sx_tot").cast("double") / col("n_tot").cast("double"))
          .as("ssb"),
        (col("sq_tot").cast("double") - col("__sp")).as("ssw"))
      .select(col("k"), col("n_tot"), col("ssb"), col("ssw"),
        ((col("ssb") / (col("k") - 1).cast("double")) /
          (col("ssw") / (col("n_tot") - col("k")).cast("double")))
          .as("f_stat"))
  }

  private val q263Sql =
    """WITH g AS (
      |  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS sq
      |  FROM (SELECT event_type,
      |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      |    FROM events WHERE value IS NOT NULL)
      |  GROUP BY 1),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(n) AS BIGINT) AS n_tot,
      |    CAST(sum(sx) AS BIGINT) AS sx_tot,
      |    CAST(sum(sq) AS BIGINT) AS sq_tot,
      |    list_reduce(list_transform(
      |      list_sort(list({'g': g, 'term':
      |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |          / CAST(n AS DOUBLE)})),
      |      e -> e.term), (x, y) -> x + y) AS sp
      |  FROM g),
      |b AS (
      |  SELECT k, n_tot,
      |    sp - CAST(sx_tot AS DOUBLE) * CAST(sx_tot AS DOUBLE)
      |      / CAST(n_tot AS DOUBLE) AS ssb,
      |    CAST(sq_tot AS DOUBLE) - sp AS ssw
      |  FROM a)
      |SELECT k, n_tot, ssb, ssw,
      |  (ssb / CAST(k - 1 AS DOUBLE))
      |    / (ssw / CAST(n_tot - k AS DOUBLE)) AS f_stat
      |FROM b""".stripMargin

  // -------------------------------------------------------------- q264
  /** Cohen's kappa between two deterministic raters (high-value rule
    * vs event-id parity): 2×2 confusion counts are exact, p_o/p_e/κ
    * closed-form from the four cells — no order-sensitive float sum
    * exists. */
  private def q264CohensKappa(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(
        ((col("value").cast("decimal(18,2)") * 100).cast("long")
          > 5000000L).as("r1"),
        (col("event_id") % 3 === 0).as("r2"))
    def cnt(c1: Boolean, c2: Boolean): Column =
      sum(when(col("r1") === c1 && col("r2") === c2, 1L)
        .otherwise(0L))
    def d(c: Column): Column = c.cast("double")
    b.agg(cnt(true, true).as("a"), cnt(true, false).as("b"),
        cnt(false, true).as("c"), cnt(false, false).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        d(col("a") + col("b") + col("c") + col("d")).as("__n"),
        d(col("a") + col("d")).as("__diag"),
        (d(col("a") + col("b")) * d(col("a") + col("c"))
          + d(col("c") + col("d")) * d(col("b") + col("d")))
          .as("__pen"))
      .select(col("a"), col("b"), col("c"), col("d"),
        (col("__diag") / col("__n")).as("po"),
        (col("__pen") / (col("__n") * col("__n"))).as("pe"),
        ((col("__diag") / col("__n")
          - col("__pen") / (col("__n") * col("__n")))
          / (lit(1.0) - col("__pen") / (col("__n") * col("__n"))))
          .as("kappa"))
  }

  private val q264Sql =
    """WITH b AS (
      |  SELECT
      |    (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      > 5000000) AS r1,
      |    (event_id % 3 = 0) AS r2
      |  FROM events WHERE value IS NOT NULL),
      |m AS (
      |  SELECT
      |    CAST(sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS a,
      |    CAST(sum(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN NOT r1 AND r2 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN NOT r1 AND NOT r2 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM b),
      |e AS (
      |  SELECT a, b, c, d,
      |    CAST(a + b + c + d AS DOUBLE) AS n,
      |    CAST(a + d AS DOUBLE) AS diag,
      |    CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
      |      + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE) AS pen
      |  FROM m)
      |SELECT a, b, c, d,
      |  diag / n AS po,
      |  pen / (n * n) AS pe,
      |  (diag / n - pen / (n * n)) / (1.0 - pen / (n * n)) AS kappa
      |FROM e""".stripMargin

  // -------------------------------------------------------------- q265
  /** Decision-stump split (Evaluation.giniSplitByGroup): best
    * purchase-vs-rest threshold on bucketed cents per user cohort —
    * prefix counts exact, weighted Gini one identical double, argmin
    * on a (gini, t) total order. value >= 0 filtered explicitly so
    * Spark `div` == DuckDB `//` (non-negative operands). */
  private def q265GiniSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("value") >= 0)
      .select(pmod(col("user_id"), lit(5L)).as("g"),
        (col("event_type") === "purchase").as("y"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " div 1000").as("t"))
    graft.operators.Evaluation
      .giniSplitByGroup(ev, "g", col("y"), col("t"))
      .orderBy(col("g"))
  }

  private val q265Sql =
    """WITH b AS (
      |  SELECT user_id % 5 AS g, (event_type = 'purchase') AS y,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000
      |      AS t
      |  FROM events WHERE value IS NOT NULL AND value >= 0
      |    AND event_type IS NOT NULL),
      |c AS (
      |  SELECT g, t, CAST(count(*) AS BIGINT) AS nv,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pv
      |  FROM b GROUP BY 1, 2),
      |w AS (
      |  SELECT g, t,
      |    CAST(sum(nv) OVER (PARTITION BY g ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
      |    CAST(sum(pv) OVER (PARTITION BY g ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
      |    CAST(sum(nv) OVER (PARTITION BY g) AS BIGINT) AS n,
      |    CAST(sum(pv) OVER (PARTITION BY g) AS BIGINT) AS p
      |  FROM c),
      |sc AS (
      |  SELECT g, t, nl, pl, n, p,
      |    (CAST(nl AS DOUBLE) * (1.0
      |        - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
      |          * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
      |        - (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))
      |          * (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)))
      |      + CAST(n - nl AS DOUBLE) * (1.0
      |        - (CAST(p - pl AS DOUBLE) / CAST(n - nl AS DOUBLE))
      |          * (CAST(p - pl AS DOUBLE) / CAST(n - nl AS DOUBLE))
      |        - (CAST((n - nl) - (p - pl) AS DOUBLE)
      |            / CAST(n - nl AS DOUBLE))
      |          * (CAST((n - nl) - (p - pl) AS DOUBLE)
      |            / CAST(n - nl AS DOUBLE))))
      |      / CAST(n AS DOUBLE) AS gini
      |  FROM w WHERE nl < n),
      |r AS (
      |  SELECT g, n, p, t, nl, pl, gini,
      |    row_number() OVER (PARTITION BY g ORDER BY gini, t) AS rn
      |  FROM sc)
      |SELECT g, n AS n_tot, p AS pos_tot, t AS split_t, nl, pl, gini
      |FROM r WHERE rn = 1 ORDER BY g""".stripMargin

  // -------------------------------------------------------------- export

  // -------------------------------------------------------------- q271
  /** HITS hubs & authorities (Graph.hits, Kleinberg 1999) over the
    * q88 co-occurrence graph — two full rounds of the UNNORMALIZED
    * exact-integer iterate (a = Σ in-hubs, h = Σ out-authorities from
    * h₀ ≡ 1): values are path counts, exact BIGINTs, so the result is
    * bit-stable across partitionings where the textbook L2-normalized
    * fixpoint could never hash-match. The oracle unrolls the same two
    * rounds as chained CTEs. */
  private def q271Hits(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.hits(e, "src", "dst", iterations = 2)
      .orderBy(col("node"))
  }

  private val q271Sql =
    """WITH e AS (
      |  SELECT DISTINCT l_orderkey % 20000 AS s,
      |    (l_partkey * 7) % 20000 AS d
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)),
      |nodes AS (
      |  SELECT DISTINCT n
      |  FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
      |h0 AS (SELECT n AS node, CAST(1 AS BIGINT) AS h FROM nodes),
      |a1 AS (
      |  SELECT nodes.n AS node, CAST(COALESCE(x.sa, 0) AS BIGINT) AS a
      |  FROM nodes LEFT JOIN (
      |    SELECT e.d AS d, sum(h0.h) AS sa
      |    FROM h0 JOIN e ON e.s = h0.node GROUP BY 1) x
      |    ON x.d = nodes.n),
      |h1 AS (
      |  SELECT nodes.n AS node, CAST(COALESCE(x.sh, 0) AS BIGINT) AS h
      |  FROM nodes LEFT JOIN (
      |    SELECT e.s AS s, sum(a1.a) AS sh
      |    FROM a1 JOIN e ON e.d = a1.node GROUP BY 1) x
      |    ON x.s = nodes.n),
      |a2 AS (
      |  SELECT nodes.n AS node, CAST(COALESCE(x.sa, 0) AS BIGINT) AS a
      |  FROM nodes LEFT JOIN (
      |    SELECT e.d AS d, sum(h1.h) AS sa
      |    FROM h1 JOIN e ON e.s = h1.node GROUP BY 1) x
      |    ON x.d = nodes.n),
      |h2 AS (
      |  SELECT nodes.n AS node, CAST(COALESCE(x.sh, 0) AS BIGINT) AS h
      |  FROM nodes LEFT JOIN (
      |    SELECT e.s AS s, sum(a2.a) AS sh
      |    FROM a2 JOIN e ON e.d = a2.node GROUP BY 1) x
      |    ON x.s = nodes.n)
      |SELECT a2.node AS node, a2.a AS auth, h2.h AS hub
      |FROM a2 JOIN h2 ON h2.node = a2.node
      |ORDER BY a2.node""".stripMargin

  // -------------------------------------------------------------- q274
  /** Strongly connected components
    * (Graph.stronglyConnectedComponents, FW-BW min-label coloring)
    * over a SPARSE derived graph (~2 edges/node — supercritical:
    * one giant SCC of ~320 nodes plus ~990 tendril singletons, so
    * both the trim phase and the coloring phase do real work — 5
    * trim rounds + 1 coloring round, measured). The oracle computes
    * ground truth from the recursive transitive closure (feasible at
    * 1500 nodes; the engine never materializes a closure). Census by
    * SCC size. */
  private def q274Scc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1 && col("l_orderkey") % 3 === 0)
      .select((col("l_orderkey") % 1500).as("src"),
        (col("l_partkey") * 7 % 1500).as("dst"))
    Graph.stronglyConnectedComponents(e, "src", "dst")
      .groupBy(col("scc")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("scc_size"))
      .agg(count(lit(1)).as("n_sccs"), sum(col("scc")).as("sum_scc_id"))
      .orderBy(col("scc_size"))
  }

  private val q274Sql =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT l_orderkey % 1500 AS s,
      |    (l_partkey * 7) % 1500 AS d
      |  FROM lineitem
      |  WHERE l_linenumber = 1 AND l_orderkey % 3 = 0
      |    AND (l_orderkey % 1500) != ((l_partkey * 7) % 1500)),
      |nodes AS (
      |  SELECT DISTINCT n
      |  FROM (SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
      |reach AS (
      |  SELECT s, d FROM e
      |  UNION
      |  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d),
      |mutual AS (
      |  SELECT a.s AS u, a.d AS v
      |  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s),
      |scc AS (
      |  SELECT nodes.n AS node,
      |    least(nodes.n, coalesce(min(m.v), nodes.n)) AS scc
      |  FROM nodes LEFT JOIN mutual m ON m.u = nodes.n
      |  GROUP BY nodes.n),
      |sizes AS (
      |  SELECT scc, CAST(count(*) AS BIGINT) AS sz
      |  FROM scc GROUP BY 1)
      |SELECT sz AS scc_size, CAST(count(*) AS BIGINT) AS n_sccs,
      |  CAST(sum(scc) AS BIGINT) AS sum_scc_id
      |FROM sizes GROUP BY 1 ORDER BY scc_size""".stripMargin

  // -------------------------------------------------------------- q282
  /** Newman modularity of a given partition (Graph.modularity) — the
    * community-quality score for LPA/CC output, gated here on the
    * deterministic attribute partition node % 50 over the q88 edge
    * fixture. Everything upstream of the one division is exact BIGINT
    * (e_c, d_c, 4m·e_c − d_c² over 4m²), so the score is
    * partitioning-invariant and the oracle restates it as plain joins.
    * The operator's overflow budget (m ≤ 1.5e9) is a require, not a
    * silent wrap. */
  private def q282Modularity(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    val assign = Graph.canonicalEdges(e, "src", "dst")
      .select(explode(array(col("u"), col("v"))).as("node")).distinct()
      .select(col("node"), (col("node") % 50).as("comm"))
    Graph.modularity(e, "src", "dst", assign, "node", "comm")
      .orderBy(col("comm"))
  }

  private val q282Sql =
    """WITH raw AS (
      |  SELECT l_orderkey % 20000 AS s, (l_partkey * 7) % 20000 AS d
      |  FROM lineitem),
      |e AS (
      |  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
      |  FROM raw WHERE least(s, d) IS NOT NULL
      |    AND least(s, d) != greatest(s, d)),
      |m AS (SELECT count(*) AS m FROM e),
      |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
      |sizes AS (
      |  SELECT node % 50 AS comm, count(*) AS n_nodes
      |  FROM nodes GROUP BY 1),
      |intra AS (
      |  SELECT u % 50 AS comm, count(*) AS intra_edges
      |  FROM e WHERE u % 50 = v % 50 GROUP BY 1),
      |deg AS (
      |  SELECT node % 50 AS comm, count(*) AS degree_sum
      |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY 1)
      |SELECT s.comm, s.n_nodes,
      |  coalesce(i.intra_edges, 0) AS intra_edges,
      |  coalesce(d.degree_sum, 0) AS degree_sum,
      |  4 * m.m * coalesce(i.intra_edges, 0)
      |    - coalesce(d.degree_sum, 0) * coalesce(d.degree_sum, 0)
      |    AS q_num,
      |  CAST(4 * m.m * coalesce(i.intra_edges, 0)
      |    - coalesce(d.degree_sum, 0) * coalesce(d.degree_sum, 0)
      |    AS DOUBLE) / (4.0 * m.m * m.m) AS contribution
      |FROM sizes s LEFT JOIN deg d USING (comm)
      |  LEFT JOIN intra i USING (comm), m
      |ORDER BY comm""".stripMargin

  // -------------------------------------------------------------- q284
  /** Grid-density clustering (Clustering.gridDbscan) — the distributed
    * DBSCAN approximation: density per grid cell, clusters = connected
    * core cells (8-neighborhood, min-cell-id label), border points
    * take the minimum adjacent core cluster, the rest is noise. The
    * whole plan is hash aggregates + ≤9× bounded neighbor fan-out +
    * the Dedup CC loop — no distance self-join at any scale. Gate
    * clusters events in (value, user_id) space and emits per-cluster
    * population counts; the oracle replays the grid, the recursive
    * min-label closure, and the border rule in exact integers. */
  private def q284GridDbscan(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Clustering
    val pts = Tables.load(s, dir, "events")
      .select(col("event_id"), col("value"),
        col("user_id").cast("double").as("y"))
    Clustering.gridDbscan(pts, "event_id", "value", "y",
        cell = 10.0, minPts = 120L)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        count_distinct(col("cx") * 10000 + col("cy")).as("n_cells"))
      .orderBy(col("cluster"))
  }

  private val q284Sql =
    """WITH RECURSIVE pts AS (
      |  SELECT event_id,
      |    CAST(floor(value / 10.0) AS BIGINT) AS cx,
      |    CAST(floor(CAST(user_id AS DOUBLE) / 10.0) AS BIGINT) AS cy
      |  FROM events),
      |cells AS (
      |  SELECT cx, cy, count(*) AS n,
      |    (cx + 1073741824) * 2147483648 + (cy + 1073741824) AS cell
      |  FROM pts GROUP BY 1, 2),
      |core AS (SELECT cx, cy, cell FROM cells WHERE n >= 120),
      |adj AS (
      |  SELECT a.cell AS c1, b.cell AS c2
      |  FROM core a JOIN core b
      |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
      |    AND a.cell != b.cell),
      |reach AS (
      |  SELECT cell AS node, cell AS lbl FROM core
      |  UNION
      |  SELECT a.c2 AS node, r.lbl
      |  FROM reach r JOIN adj a ON a.c1 = r.node),
      |lab AS (
      |  SELECT c.cx, c.cy, min(r.lbl) AS cl
      |  FROM core c JOIN reach r ON r.node = c.cell
      |  GROUP BY 1, 2),
      |near AS (
      |  SELECT p.cx, p.cy, min(l.cl) AS near_cl
      |  FROM (SELECT DISTINCT cx, cy FROM pts) p
      |  JOIN lab l
      |    ON abs(l.cx - p.cx) <= 1 AND abs(l.cy - p.cy) <= 1
      |  GROUP BY 1, 2),
      |labeled AS (
      |  SELECT p.event_id,
      |    coalesce(o.cl, n.near_cl, -1) AS cluster, p.cx, p.cy
      |  FROM pts p
      |  LEFT JOIN lab o ON o.cx = p.cx AND o.cy = p.cy
      |  LEFT JOIN near n ON n.cx = p.cx AND n.cy = p.cy)
      |SELECT cluster, count(*) AS n_points,
      |  count(DISTINCT cx * 10000 + cy) AS n_cells
      |FROM labeled GROUP BY 1 ORDER BY cluster""".stripMargin

  // -------------------------------------------------------------- q285
  /** Exact trimmed mean (Quantiles.trimmedMeanByGroup): per-priority
    * order totals in integer cents, lowest/highest 10% of ranks
    * dropped via the mass-table kept-multiplicity scheme — the robust
    * location estimate between q77's winsorize (clamp) and q87's
    * median. Shuffle carries distinct values, never rows; the mean is
    * the single float division. Oracle ranks rows directly
    * (row_number ties are interchangeable equal values, so the kept
    * multiset is identical). */
  private def q285TrimmedMean(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    Quantiles.trimmedMeanByGroup(v, "o_orderpriority", "cents",
        trim = 0.1)
      .orderBy(col("o_orderpriority"))
  }

  private val q285Sql =
    """WITH v AS (
      |  SELECT o_orderpriority,
      |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority, c,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY c)
      |      AS rk,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM v),
      |k AS (
      |  SELECT o_orderpriority, c, n,
      |    CAST(floor(0.1 * n) AS BIGINT) AS lo
      |  FROM r WHERE rk > floor(0.1 * n) AND rk <= n - floor(0.1 * n))
      |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
      |  count(*) AS n_kept,
      |  CAST(sum(c) AS BIGINT) AS kept_sum,
      |  CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS trimmed_mean
      |FROM k GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------- q288
  /** Linear interpolation imputation (TimeSeries.interpolateLinear):
    * per-user event series with every 7th value NULLed, filled by the
    * two frame-bounded ignoreNulls windows — interior gaps
    * interpolate, edges LOCF/backfill. The DuckDB oracle has no
    * IGNORE NULLS, so it restates the neighbors as arg_max/arg_min
    * joins over the known rows (ORACLE_NOTES rule); the interpolation
    * itself is four pinned IEEE ops on exact inputs. Gate aggregates
    * per (user bucket, fill_kind) in integer micro-units to keep the
    * output compact. */
  private def q288Interpolate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("event_id") <= 5000)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"),
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
    TimeSeries.interpolateLinear(ev, Seq("user_id"), "t", "v")
      .groupBy((col("user_id") % 10).as("user_bucket"), col("fill_kind"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v_filled") * 1000000.0 + 0.5).cast("long"))
          .as("sum_micro"))
      .orderBy(col("user_bucket"), col("fill_kind"))
  }

  private val q288Sql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events WHERE event_id <= 5000),
      |known AS (SELECT user_id, t, v FROM ev WHERE v IS NOT NULL),
      |prevs AS (
      |  SELECT e.user_id, e.event_id,
      |    max(k.t) AS pt, arg_max(k.v, k.t) AS pv
      |  FROM ev e JOIN known k
      |    ON k.user_id = e.user_id AND k.t < e.t
      |  WHERE e.v IS NULL GROUP BY 1, 2),
      |nexts AS (
      |  SELECT e.user_id, e.event_id,
      |    min(k.t) AS nt, arg_min(k.v, k.t) AS nv
      |  FROM ev e JOIN known k
      |    ON k.user_id = e.user_id AND k.t > e.t
      |  WHERE e.v IS NULL GROUP BY 1, 2),
      |filled AS (
      |  SELECT e.user_id, e.event_id, e.t, e.v,
      |    CASE
      |      WHEN e.v IS NOT NULL THEN e.v
      |      WHEN p.pt IS NOT NULL AND n.nt IS NOT NULL THEN
      |        p.pv + (n.nv - p.pv) * (CAST(e.t AS DOUBLE) - p.pt)
      |          / (CAST(n.nt AS DOUBLE) - p.pt)
      |      WHEN p.pt IS NOT NULL THEN p.pv
      |      WHEN n.nt IS NOT NULL THEN n.nv
      |    END AS v_filled,
      |    CASE
      |      WHEN e.v IS NOT NULL THEN 'observed'
      |      WHEN p.pt IS NOT NULL AND n.nt IS NOT NULL THEN 'interp'
      |      WHEN p.pt IS NOT NULL THEN 'locf'
      |      WHEN n.nt IS NOT NULL THEN 'backfill'
      |      ELSE 'none'
      |    END AS fill_kind
      |  FROM ev e
      |  LEFT JOIN prevs p
      |    ON p.user_id = e.user_id AND p.event_id = e.event_id
      |  LEFT JOIN nexts n
      |    ON n.user_id = e.user_id AND n.event_id = e.event_id)
      |SELECT user_id % 10 AS user_bucket, fill_kind, count(*) AS n,
      |  CAST(sum(CAST(floor(v_filled * 1000000.0 + 0.5) AS BIGINT))
      |    AS BIGINT) AS sum_micro
      |FROM filled GROUP BY 1, 2
      |ORDER BY user_bucket, fill_kind""".stripMargin

  // -------------------------------------------------------------- q298
  /** Dyad census + reciprocity (Graph.dyadCensus, Holland & Leinhardt
    * 1970) of the DIRECTED q88 edge fixture: mutual/asymmetric/null
    * pair counts from one reverse self-join and pure arithmetic —
    * C(n,2) is never enumerated. Exact integers, one division. */
  private def q298DyadCensus(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 2000).as("src"),
      (col("l_partkey") * 7 % 2000).as("dst"))
    Graph.dyadCensus(e, "src", "dst")
  }

  private val q298Sql =
    """WITH e AS (
      |  SELECT DISTINCT l_orderkey % 2000 AS s,
      |    (l_partkey * 7) % 2000 AS d
      |  FROM lineitem WHERE l_orderkey % 2000 != (l_partkey * 7) % 2000),
      |und AS (
      |  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v FROM e),
      |m AS (
      |  SELECT count(*) AS mutual FROM e a
      |  WHERE a.s < a.d AND EXISTS (
      |    SELECT 1 FROM e b WHERE b.s = a.d AND b.d = a.s)),
      |nn AS (
      |  SELECT count(*) AS n_nodes
      |  FROM (SELECT s AS n FROM e UNION SELECT d FROM e)),
      |c AS (
      |  SELECT nn.n_nodes,
      |    (SELECT count(*) FROM e) AS n_edges_directed,
      |    m.mutual,
      |    (SELECT count(*) FROM und) AS pairs
      |  FROM nn, m)
      |SELECT n_nodes, n_edges_directed, mutual,
      |  pairs - mutual AS asym,
      |  n_nodes * (n_nodes - 1) // 2 - pairs AS nulls,
      |  CASE WHEN pairs > 0 THEN CAST(mutual AS DOUBLE)
      |    / CAST(pairs AS DOUBLE) END AS reciprocity
      |FROM c""".stripMargin

  // -------------------------------------------------------------- q299
  /** Rich-club coefficients (Graph.richClub) at four thresholds over
    * the q88 fixture — does the hub set densify relative to the graph?
    * Degree aggregate once, per-threshold semi-join edge counts,
    * exact integers, one division per row. */
  private def q299RichClub(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.richClub(e, "src", "dst", Seq(2, 4, 8, 16))
      .orderBy(col("k"))
  }

  private val q299Sql =
    """WITH raw AS (
      |  SELECT l_orderkey % 20000 AS s, (l_partkey * 7) % 20000 AS d
      |  FROM lineitem),
      |und AS (
      |  SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
      |  FROM raw WHERE s != d),
      |deg AS (
      |  SELECT n, count(*) AS dg FROM (
      |    SELECT u AS n FROM und UNION ALL SELECT v FROM und)
      |  GROUP BY 1),
      |ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
      |nk AS (
      |  SELECT k.k, count(deg.n) AS n_rich
      |  FROM ks k LEFT JOIN deg ON deg.dg > k.k GROUP BY 1),
      |ek AS (
      |  SELECT k.k, count(*) AS e_rich
      |  FROM ks k CROSS JOIN und
      |  JOIN deg a ON a.n = und.u JOIN deg b ON b.n = und.v
      |  WHERE a.dg > k.k AND b.dg > k.k GROUP BY 1)
      |SELECT k.k, coalesce(nk.n_rich, 0) AS n_rich,
      |  coalesce(ek.e_rich, 0) AS e_rich,
      |  CASE WHEN coalesce(nk.n_rich, 0) >= 2 THEN
      |    2.0 * coalesce(ek.e_rich, 0)
      |      / (CAST(nk.n_rich AS DOUBLE) * (CAST(nk.n_rich AS DOUBLE) - 1.0))
      |  END AS phi
      |FROM ks k LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)
      |ORDER BY k""".stripMargin

  // -------------------------------------------------------------- q300
  /** Hilbert range-query decomposition (Layout.hilbertRanges /
    * hilbertBoxFilter) — the READ half of the q174 Hilbert layout: a
    * 2-D cell box becomes ≤16 inclusive 1-D key ranges (quadtree
    * descent — contained quads are contiguous curve runs — plus
    * smallest-gap coalescing) AND the residual box predicate, the
    * standard space-filling-curve index probe. On an hkey-sorted
    * layout the ranges prune files via plain min/max stats. The
    * oracle answers the same box DIRECTLY from the cell coordinates —
    * equality pins that ranges+residual lose and invent nothing. */
  private def q300HilbertRange(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val pts = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        Layout.cell(col("value"), 0.0, 2.0, 8).as("cx"),
        Layout.cell(col("user_id").cast("double"), 0.0, 1.0, 8).as("cy"))
      .withColumn("hk", Layout.hkey(col("cx"), col("cy"), 8))
    pts.filter(Layout.hilbertBoxFilter(col("hk"), col("cx"), col("cy"),
        x0 = 20, y0 = 40, x1 = 90, y1 = 120, bits = 8, maxRanges = 16))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cx")).as("sum_cx"),
        sum(col("cy")).as("sum_cy"))
      .orderBy(col("event_type"))
  }

  private val q300Sql =
    """WITH p AS (
      |  SELECT event_type,
      |    greatest(0, least(CAST(floor((value - 0.0) / 2.0) AS BIGINT),
      |      255)) AS cx,
      |    greatest(0, least(CAST(floor((CAST(user_id AS DOUBLE) - 0.0)
      |      / 1.0) AS BIGINT), 255)) AS cy
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(cx) AS BIGINT) AS sum_cx,
      |  CAST(sum(cy) AS BIGINT) AS sum_cy
      |FROM p
      |WHERE cx BETWEEN 20 AND 90 AND cy BETWEEN 40 AND 120
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q301
  /** Half-life-decayed engagement score (EventAnalytics.decayedSum):
    * recency weighting with INTEGRAL half-life counts so every term is
    * exact float math — v/2^k only shifts the exponent — and the
    * per-key sorted fold pins summation order (q60 rule). Ref instant
    * 2024-02-01, half-life 3 days over the January event window. */
  private def q301DecayedSum(s: SparkSession, dir: String): DataFrame =
    EventAnalytics.decayedSum(Tables.load(s, dir, "events"),
        Seq("event_type"), "ts", "value",
        refMicros = 1706745600000000L,
        halfLifeMicros = 259200000000L)
      .orderBy(col("event_type"))

  private val q301Sql =
    """WITH t AS (
      |  SELECT event_type, value,
      |    (1706745600000000 - epoch_us(ts)) // 259200000000 AS k
      |  FROM events WHERE epoch_us(ts) <= 1706745600000000)
      |SELECT event_type, count(*) AS n_events,
      |  list_aggregate(list_sort(list(
      |    CASE WHEN k <= 62 THEN
      |      value / CAST((CAST(1 AS BIGINT) << CAST(k AS INTEGER))
      |        AS DOUBLE)
      |    ELSE 0.0 END)), 'sum') AS decayed_sum
      |FROM t GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q303
  /** pass@k evaluation (Evaluation.passAtK; Chen et al. 2021) — the
    * LLM-eval estimator as exact combinatorics: per task,
    * 1 − Π_{i<5}(n−c−i)/(n−i) with both products exact BIGINTs and
    * one division+subtraction in pinned order. Tasks from user
    * buckets, "passed" a deterministic value threshold. */
  private def q303PassAtK(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation.passAtK(
        Tables.load(s, dir, "events")
          .select((col("user_id") % 50).as("task"), col("value")),
        "task", col("value") > 30.0, k = 5)
      .orderBy(col("task"))

  private val q303Sql =
    """WITH t AS (
      |  SELECT user_id % 50 AS task, count(*) AS n,
      |    CAST(sum(CASE WHEN value > 30.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c
      |  FROM events GROUP BY 1)
      |SELECT task, n, c,
      |  greatest((n - c) * (n - c - 1) * (n - c - 2) * (n - c - 3)
      |    * (n - c - 4), 0) AS fail_num,
      |  n * (n - 1) * (n - 2) * (n - 3) * (n - 4) AS den,
      |  1.0 - CAST(greatest((n - c) * (n - c - 1) * (n - c - 2)
      |      * (n - c - 3) * (n - c - 4), 0) AS DOUBLE)
      |    / CAST(n * (n - 1) * (n - 2) * (n - 3) * (n - 4) AS DOUBLE)
      |    AS pass_at_k
      |FROM t WHERE n >= 5 ORDER BY task""".stripMargin

  // -------------------------------------------------------------- q304
  /** Two-proportion z-test (Evaluation.twoProportionZ) — the A/B
    * decision primitive: even/odd user arms, purchase conversion.
    * Exact counts; z is a fixed chain of correctly-rounded IEEE ops
    * (one sqrt), bit-stable cross-engine. */
  private def q304AbTest(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation.twoProportionZ(Tables.load(s, dir, "events"),
      armCol = col("user_id") % 2 === 0,
      successCol = col("event_type") === "purchase")

  private val q304Sql =
    """WITH a AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN user_id % 2 = 0
      |      AND event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x1,
      |    CAST(sum(CASE WHEN user_id % 2 != 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN user_id % 2 != 0
      |      AND event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x2
      |  FROM events),
      |b AS (
      |  SELECT n1, x1, n2, x2,
      |    CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |    CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
      |    (CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))
      |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS p
      |  FROM a)
      |SELECT n1, x1, n2, x2, p1, p2,
      |  CASE WHEN n1 > 0 AND n2 > 0 AND p > 0.0 AND p < 1.0 THEN
      |    (p1 - p2) / sqrt(p * (1.0 - p)
      |      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
      |  END AS z
      |FROM b""".stripMargin

  // -------------------------------------------------------------- q306
  /** AMS tug-of-war F2 sketch (Sketches.amsF2) over a 500-key zipfy
    * stream: 9 md5-signed ±1 estimators, median by selection, every
    * intermediate an exact BIGINT — the classic streaming moment
    * estimator with the exact F2 in-row as the error audit. */
  private def q306AmsF2(s: SparkSession, dir: String): DataFrame =
    Sketches.amsF2(Tables.load(s, dir, "events"),
      col("user_id") % 500, rows = 9)

  private val q306Sql =
    """WITH signed AS (
      |  SELECT r.r AS r,
      |    CASE WHEN ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
      |        || CAST(user_id % 500 AS VARCHAR)), 1, 15))::BIGINT
      |        % 2 = 0
      |      THEN 1 ELSE -1 END AS sign
      |  FROM events, range(0, 9) r(r)),
      |ests AS (
      |  SELECT CAST(sum(sign) AS BIGINT) * CAST(sum(sign) AS BIGINT)
      |    AS s2
      |  FROM signed GROUP BY r),
      |med AS (SELECT s2 AS f2_est FROM ests ORDER BY s2
      |        LIMIT 1 OFFSET 4),
      |ex AS (
      |  SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact
      |  FROM (SELECT count(*) AS f FROM events GROUP BY user_id % 500))
      |SELECT f2_exact, f2_est,
      |  CAST(abs(f2_est - f2_exact) AS DOUBLE)
      |    / CAST(f2_exact AS DOUBLE) AS rel_err
      |FROM ex CROSS JOIN med""".stripMargin

  // -------------------------------------------------------------- q307
  /** Deterministic-hash bootstrap CI (Sampling.bootstrapCi) of the
    * mean order value: 40 half-sample replicates by stable md5
    * predicate, replicate means as exact-cents/exact-count divisions,
    * 95% interval by pure order statistics — reproducible uncertainty
    * quantification with no RNG state. */
  private def q307BootstrapCi(s: SparkSession, dir: String): DataFrame =
    Sampling.bootstrapCi(Tables.load(s, dir, "orders"), "o_orderkey",
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
      b = 40, lo = 1)

  private val q307Sql =
    """WITH reps AS (
      |  SELECT r.r AS r,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS c
      |  FROM orders, range(0, 40) r(r)
      |  WHERE ('0x' || substr(md5(CAST(o_orderkey * 80 + r.r
      |    AS VARCHAR)), 1, 8))::BIGINT % 2 = 0),
      |m AS (
      |  SELECT CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS m
      |  FROM reps GROUP BY r),
      |lo AS (SELECT m AS ci_lo FROM m ORDER BY m LIMIT 1 OFFSET 1),
      |hi AS (SELECT m AS ci_hi FROM m ORDER BY m DESC LIMIT 1 OFFSET 1),
      |f AS (
      |  SELECT CAST(40 AS BIGINT) AS b, count(*) AS n_full,
      |    CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS mean_full
      |  FROM orders)
      |SELECT b, n_full, mean_full, ci_lo, ci_hi
      |FROM f CROSS JOIN lo CROSS JOIN hi""".stripMargin

  // -------------------------------------------------------------- q308
  /** Two-feature OLS by exact moments + Cramer (Evaluation.ols2ByGroup):
    * quantity ~ discount + tax per return flag, every moment an exact
    * BIGINT of cent-scaled inputs and the betas a pinned double
    * expression — multi-feature regression with the q126
    * accumulation-order hazard engineered out. */
  private def q308Ols2(s: SparkSession, dir: String): DataFrame = {
    def cents(c: String): Column =
      (col(c).cast("decimal(18,2)") * 100).cast("long")
    Evaluation.ols2ByGroup(Tables.load(s, dir, "lineitem"),
        "l_returnflag", cents("l_quantity"), cents("l_discount"),
        cents("l_tax"))
      .withColumnRenamed("l_returnflag", "flag")
      .orderBy(col("flag"))
  }

  private val q308Sql =
    """WITH t AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
      |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x1,
      |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2
      |  FROM lineitem),
      |mo AS (
      |  SELECT flag, count(*) AS n,
      |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
      |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
      |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
      |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
      |    CAST(sum(x2 * y) AS BIGINT) AS s2y
      |  FROM t GROUP BY 1),
      |d AS (
      |  SELECT flag, n, s1, s2, sy, s11, s12, s22, s1y, s2y,
      |    CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
      |    CAST(s2 AS DOUBLE) AS d2, CAST(sy AS DOUBLE) AS dy,
      |    CAST(s11 AS DOUBLE) AS d11, CAST(s12 AS DOUBLE) AS d12,
      |    CAST(s22 AS DOUBLE) AS d22, CAST(s1y AS DOUBLE) AS d1y,
      |    CAST(s2y AS DOUBLE) AS d2y
      |  FROM mo),
      |dd AS (
      |  SELECT *,
      |    dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
      |      + d2 * (d1 * d12 - d11 * d2) AS det
      |  FROM d)
      |SELECT flag, n, s1, s2, sy, s11, s12, s22, s1y, s2y,
      |  CASE WHEN det != 0.0 THEN
      |    (dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
      |      + d2 * (d1y * d12 - d11 * d2y)) / det END AS beta0,
      |  CASE WHEN det != 0.0 THEN
      |    (dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
      |      + d2 * (d1 * d2y - d1y * d2)) / det END AS beta1,
      |  CASE WHEN det != 0.0 THEN
      |    (dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
      |      + dy * (d1 * d12 - d11 * d2)) / det END AS beta2
      |FROM dd ORDER BY flag""".stripMargin

  // -------------------------------------------------------------- q312
  /** Weisfeiler–Lehman color refinement (Graph.wlRefine, 2 rounds)
    * over the q200 graph: per-round color-class census (n_colors,
    * n_nodes, max_class) — the structural-fingerprint partition and
    * its refinement, every color an engine-portable md5 of sorted
    * neighbor colors. The oracle unrolls both rounds as CTE stages. */
  private def q312WlColors(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.wlRefine(e, "src", "dst", rounds = 2)
      .groupBy(col("round"), col("color")).agg(count(lit(1)).as("sz"))
      .groupBy(col("round"))
      .agg(count(lit(1)).as("n_colors"), sum(col("sz")).as("n_nodes"),
        max(col("sz")).as("max_class"))
      .orderBy(col("round"))
  }

  private val q312Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (SELECT u AS node, v AS x FROM e0
      |        UNION ALL SELECT v, u FROM e0),
      |c0 AS (SELECT node, CAST(count(*) AS VARCHAR) AS color
      |       FROM adj GROUP BY 1),
      |s1 AS (SELECT a.node, string_agg(n.color, ',' ORDER BY n.color)
      |         AS sig
      |       FROM adj a JOIN c0 n ON n.node = a.x GROUP BY 1),
      |c1 AS (SELECT s1.node, md5(c.color || '|' || s1.sig) AS color
      |       FROM s1 JOIN c0 c ON c.node = s1.node),
      |s2 AS (SELECT a.node, string_agg(n.color, ',' ORDER BY n.color)
      |         AS sig
      |       FROM adj a JOIN c1 n ON n.node = a.x GROUP BY 1),
      |c2 AS (SELECT s2.node, md5(c.color || '|' || s2.sig) AS color
      |       FROM s2 JOIN c1 c ON c.node = s2.node),
      |allc AS (
      |  SELECT 0 AS round, node, color FROM c0
      |  UNION ALL SELECT 1, node, color FROM c1
      |  UNION ALL SELECT 2, node, color FROM c2),
      |cls AS (SELECT round, color, count(*) AS sz
      |        FROM allc GROUP BY 1, 2)
      |SELECT round, count(*) AS n_colors,
      |  CAST(sum(sz) AS BIGINT) AS n_nodes, max(sz) AS max_class
      |FROM cls GROUP BY 1 ORDER BY round""".stripMargin

  // -------------------------------------------------------------- q313
  /** Resource-allocation link prediction (Graph.resourceAllocation)
    * over the q200 graph with the same center cap: candidate pairs
    * with ≥2 common neighbors scored Σ 1/deg(z) in sorted-fold order
    * — degree-penalized common-neighbor evidence, bit-stable (one
    * division per term, no logs). */
  private def q313ResourceAlloc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.resourceAllocation(e, "src", "dst", maxCenterDegree = 10,
        minCn = 2)
      .orderBy(col("a"), col("b"))
  }

  private val q313Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (SELECT u AS c, v AS x FROM e0
      |        UNION ALL SELECT v, u FROM e0),
      |deg AS (SELECT c, count(*) AS d FROM adj GROUP BY 1),
      |kept AS (SELECT adj.c, adj.x, deg.d FROM adj JOIN deg USING (c)
      |         WHERE deg.d <= 10)
      |SELECT a.x AS a, b.x AS b, count(*) AS cn,
      |  list_aggregate(list_sort(list(1.0 / CAST(a.d AS DOUBLE))),
      |    'sum') AS ra
      |FROM kept a JOIN kept b ON a.c = b.c AND a.x < b.x
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY a, b""".stripMargin

  // -------------------------------------------------------------- q315
  /** CUPED variance reduction (Evaluation.cuped): users as units,
    * even/odd arms, first-half-of-January spend as the pre-period
    * covariate, second half as the metric. θ, both variances, and
    * both effect estimates all derive from ONE set of exact BIGINT
    * moments — the industry-standard A/B sensitivity boost with zero
    * accumulation-order hazard. */
  private def q315Cuped(s: SparkSession, dir: String): DataFrame = {
    def cents: Column = (col("value").cast("decimal(18,2)") * 100)
      .cast("long")
    val cut = lit("2024-01-16").cast("timestamp")
    Evaluation.cuped(Tables.load(s, dir, "events"),
      unit = col("user_id"), arm = col("user_id") % 2 === 0,
      pre = when(col("ts") < cut, cents).otherwise(0L),
      post = when(col("ts") >= cut, cents).otherwise(0L))
  }

  private val q315Sql =
    """WITH pu AS (
      |  SELECT user_id AS u,
      |    max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS t,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(t) AS BIGINT) AS n1,
      |    CAST(sum(t * x) AS BIGINT) AS sx1,
      |    CAST(sum(t * y) AS BIGINT) AS sy1
      |  FROM pu),
      |d AS (
      |  SELECT n, sx, sy, sxx, sxy, syy, n1,
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_x,
      |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_y,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov_xy,
      |    CASE WHEN n1 > 0 AND n1 < n THEN
      |      CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - (CAST(sy AS DOUBLE) - CAST(sy1 AS DOUBLE))
      |        / (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE)) END AS diff_raw,
      |    CASE WHEN n1 > 0 AND n1 < n THEN
      |      CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) - CAST(sx1 AS DOUBLE))
      |        / (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE)) END AS diff_x
      |  FROM m),
      |e AS (
      |  SELECT *, CASE WHEN var_x > 0.0 THEN cov_xy / var_x END
      |    AS theta
      |  FROM d)
      |SELECT n, sx, sy, sxx, sxy, syy, n1, var_x, var_y, cov_xy,
      |  diff_raw, theta,
      |  CASE WHEN var_x > 0.0 THEN var_y - 2.0 * theta * cov_xy
      |    + theta * theta * var_x END AS var_cuped,
      |  CASE WHEN var_y > 0.0 THEN (var_y - 2.0 * theta * cov_xy
      |    + theta * theta * var_x) / var_y END AS var_reduction,
      |  diff_raw - theta * diff_x AS diff_cuped
      |FROM e""".stripMargin

  // -------------------------------------------------------------- q317
  /** AMS join-size estimation (Sketches.amsJoinSize): orders ⋈
    * customer on custkey forecast from two independently-built ±1
    * sign sketches (9 longs each) vs the exact per-key-count join —
    * the constant-size statistic a planner consults before picking a
    * shuffle strategy. All-integer, median by selection. */
  private def q317AmsJoinSize(s: SparkSession, dir: String): DataFrame =
    Sketches.amsJoinSize(
      Tables.load(s, dir, "orders"), col("o_custkey"),
      Tables.load(s, dir, "customer"), col("c_custkey"), rows = 9)

  private val q317Sql =
    """WITH sa AS (
      |  SELECT r.r AS r, CAST(sum(CASE WHEN ('0x' || substr(md5(
      |      CAST(r.r AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)),
      |      1, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS s
      |  FROM orders, range(0, 9) r(r) GROUP BY 1),
      |sb AS (
      |  SELECT r.r AS r, CAST(sum(CASE WHEN ('0x' || substr(md5(
      |      CAST(r.r AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)),
      |      1, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS s
      |  FROM customer, range(0, 9) r(r) GROUP BY 1),
      |prod AS (SELECT sa.s * sb.s AS p FROM sa JOIN sb USING (r)),
      |med AS (SELECT p AS join_est FROM prod ORDER BY p
      |        LIMIT 1 OFFSET 4),
      |ex AS (
      |  SELECT coalesce(CAST(sum(ca * cb) AS BIGINT), 0)
      |    AS join_exact
      |  FROM (SELECT o_custkey AS k, count(*) AS ca FROM orders
      |        GROUP BY 1) a
      |  JOIN (SELECT c_custkey AS k, count(*) AS cb FROM customer
      |        GROUP BY 1) b USING (k))
      |SELECT join_exact, join_est, abs(join_est - join_exact) AS abs_err
      |FROM ex CROSS JOIN med""".stripMargin

  // -------------------------------------------------------------- q318
  /** Closeness centrality for an 8-seed set (Graph.closenessCentrality,
    * 6-hop horizon) over the q200 graph: per-seed reach, exact
    * integer distance mass, and the single-division closeness — the
    * composite-key multi-source BFS (k seeds share each round's
    * shuffle). Oracle: bounded recursive-CTE BFS, min(hops) per
    * (seed, node). */
  private def q318Closeness(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.closenessCentrality(e, "src", "dst",
        seeds = Seq(0L, 7L, 123L, 1234L, 4321L, 9999L, 15000L, 19997L),
        maxHops = 6)
      .orderBy(col("seed"))
  }

  private val q318Sql =
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (SELECT u AS a, v AS b FROM e0
      |        UNION ALL SELECT v, u FROM e0),
      |seeds(seed) AS (VALUES (0), (7), (123), (1234), (4321), (9999),
      |  (15000), (19997)),
      |walk(seed, node, hops) AS (
      |  SELECT CAST(seed AS BIGINT), CAST(seed AS BIGINT), 0
      |  FROM seeds
      |  UNION
      |  SELECT w.seed, adj.b, w.hops + 1
      |  FROM walk w JOIN adj ON adj.a = w.node
      |  WHERE w.hops < 6),
      |dist AS (SELECT seed, node, min(hops) AS hops FROM walk
      |         GROUP BY 1, 2)
      |SELECT seed, count(*) AS n_reach,
      |  CAST(sum(hops) AS BIGINT) AS sum_dist,
      |  CASE WHEN CAST(sum(hops) AS BIGINT) > 0 THEN
      |    CAST(count(*) - 1 AS DOUBLE)
      |      / CAST(CAST(sum(hops) AS BIGINT) AS DOUBLE) END AS closeness
      |FROM dist GROUP BY 1 ORDER BY seed""".stripMargin

  // -------------------------------------------------------------- q320
  /** Distribution-drift census between the two halves of January —
    * the PSI-style monitor restated without logs: combined-population
    * deciles from the exact distributed ECDF (Quantiles.ecdf), then
    * per-decile counts for each period and the L1 drift statistic
    * Σ|cA·nB − cB·nA| / (nA·nB) — cross-multiplied so every term is
    * an exact BIGINT and the one division is final. Identical
    * populations give exactly 0; total disjointness gives 2. */
  private def q320DriftL1(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val ev = Tables.load(s, dir, "events")
      .select((col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("v"),
        when(col("ts") < cut, lit("a")).otherwise(lit("b")).as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nTotal = ev.count()
    val bkt = Quantiles.ecdf(ev, "v")
      .select(col("value").as("v"),
        floor((col("cum") * 10 + lit(nTotal - 1)).cast("double")
          / lit(nTotal.toDouble)).cast("long").as("bucket"))
    val hist = ev.join(bkt, Seq("v"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("p") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("p") === "b", 1L).otherwise(0L)).as("cb"))
    val tot = ev.agg(
      sum(when(col("p") === "a", 1L).otherwise(0L)).as("na"),
      sum(when(col("p") === "b", 1L).otherwise(0L)).as("nb"))
    val terms = hist.crossJoin(broadcast(tot))
      .withColumn("term", abs(col("ca") * col("nb") - col("cb") * col("na")))
    val psi = terms.agg((sum(col("term")).cast("double") /
      (max(col("na")) * max(col("nb"))).cast("double")).as("psi_l1"))
    terms.crossJoin(broadcast(psi))
      .select(col("bucket"), col("ca"), col("cb"), col("term"),
        col("psi_l1"))
      .orderBy(col("bucket"))
  }

  private val q320Sql =
    """WITH ev AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END
      |      AS p
      |  FROM events),
      |n AS (SELECT count(*) AS nt FROM ev),
      |cnts AS (SELECT v, count(*) AS cnt FROM ev GROUP BY 1),
      |cume AS (
      |  SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM cnts),
      |bkt AS (
      |  SELECT v, CAST(floor(CAST(cum * 10 + nt - 1 AS DOUBLE)
      |    / CAST(nt AS DOUBLE)) AS BIGINT) AS bucket
      |  FROM cume CROSS JOIN n),
      |hist AS (
      |  SELECT bucket,
      |    CAST(sum(CASE WHEN p = 'a' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN p = 'b' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM ev JOIN bkt USING (v) GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(CASE WHEN p = 'a' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS na,
      |    CAST(sum(CASE WHEN p = 'b' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nb
      |  FROM ev),
      |terms AS (
      |  SELECT bucket, ca, cb, abs(ca * nb - cb * na) AS term, na, nb
      |  FROM hist CROSS JOIN tot),
      |psi AS (
      |  SELECT CAST(CAST(sum(term) AS BIGINT) AS DOUBLE)
      |    / CAST(max(na) * max(nb) AS DOUBLE) AS psi_l1
      |  FROM terms)
      |SELECT bucket, ca, cb, term, psi_l1
      |FROM terms CROSS JOIN psi ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------- q321
  /** Exact truncated Katz centrality (Graph.katzCentrality, α = ½,
    * K = 4) over the q200 graph: walk counts are exact BIGINTs, each
    * α^k·w_k term an exact dyadic scaling, the 4-term sum a fixed
    * ascending-k expression — the walk-based influence measure
    * without power-iteration float drift. Oracle unrolls the four
    * count rounds as CTE joins. */
  private def q321Katz(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "lineitem").select(
      (col("l_orderkey") % 20000).as("src"),
      (col("l_partkey") * 7 % 20000).as("dst"))
    Graph.katzCentrality(e, "src", "dst", rounds = 4)
      .orderBy(col("node"))
  }

  private val q321Sql =
    """WITH e0 AS (
      |  SELECT DISTINCT
      |    least(l_orderkey % 20000, (l_partkey * 7) % 20000) AS u,
      |    greatest(l_orderkey % 20000, (l_partkey * 7) % 20000) AS v
      |  FROM lineitem
      |  WHERE (l_orderkey % 20000) != ((l_partkey * 7) % 20000)
      |    AND l_orderkey IS NOT NULL),
      |adj AS (SELECT u AS a, v AS b FROM e0
      |        UNION ALL SELECT v, u FROM e0),
      |w1 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS w
      |       FROM adj GROUP BY 1),
      |w2 AS (SELECT adj.a AS node, CAST(sum(w1.w) AS BIGINT) AS w
      |       FROM adj JOIN w1 ON w1.node = adj.b GROUP BY 1),
      |w3 AS (SELECT adj.a AS node, CAST(sum(w2.w) AS BIGINT) AS w
      |       FROM adj JOIN w2 ON w2.node = adj.b GROUP BY 1),
      |w4 AS (SELECT adj.a AS node, CAST(sum(w3.w) AS BIGINT) AS w
      |       FROM adj JOIN w3 ON w3.node = adj.b GROUP BY 1)
      |SELECT w1.node, coalesce(w4.w, 0) AS walks_last,
      |  coalesce(CAST(w1.w AS DOUBLE), 0.0) / 2.0
      |    + coalesce(CAST(w2.w AS DOUBLE), 0.0) / 4.0
      |    + coalesce(CAST(w3.w AS DOUBLE), 0.0) / 8.0
      |    + coalesce(CAST(w4.w AS DOUBLE), 0.0) / 16.0 AS katz
      |FROM w1
      |LEFT JOIN w2 ON w2.node = w1.node
      |LEFT JOIN w3 ON w3.node = w1.node
      |LEFT JOIN w4 ON w4.node = w1.node
      |ORDER BY w1.node""".stripMargin

  // -------------------------------------------------------------- q325
  /** MAP@10 retrieval evaluation, EXACT: five (query, intent) word
    * pairs; docs ranked by query-word TF (ties by id), relevance =
    * contains the intent word. Average precision is computed as an
    * integer numerator Σ rel_k·hits_k·(2520/k) — 2520 = lcm(1..10),
    * so every P@k term is integral — over the denominator
    * 2520·min(10, R): ONE final division, no float accumulation at
    * all (the usual Σ P@k float fold is order-fragile). Scale: the
    * query table is constant and broadcast; everything else is one
    * pass + a per-query top-10 window. */
  private def q325MapAtK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val qs = Seq(("join", "hash"), ("scan", "filter"),
      ("stream", "window"), ("merge", "order"), ("vector", "column"))
      .toDF("qw", "rw")
    val d = Tables.load(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("tk"))
    val sc = d.crossJoin(broadcast(qs))
      .select(col("qw"), col("rw"), col("doc_id"),
        size(filter(col("tk"), x => x === col("qw"))).cast("long")
          .as("tf1"),
        when(array_contains(col("tk"), col("rw")), 1L).otherwise(0L)
          .as("rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val w = Window.partitionBy(col("qw"))
      .orderBy(col("tf1").desc, col("doc_id"))
    val cum = Window.partitionBy(col("qw")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val top = sc.filter(col("tf1") > 0)
      .withColumn("k", row_number().over(w).cast("long"))
      .filter(col("k") <= 10)
      .withColumn("hits", sum(col("rel")).over(cum))
      .withColumn("term",
        col("rel") * col("hits") * (lit(2520L) / col("k")).cast("long"))
    val apn = top.groupBy(col("qw"))
      .agg(sum(col("term")).as("ap_num"), count(lit(1)).as("n_ranked"))
    val rt = sc.groupBy(col("qw"), col("rw"))
      .agg(sum(col("rel")).as("r_total"))
    rt.join(apn, Seq("qw"), "left_outer")
      .select(col("qw"), col("rw"),
        coalesce(col("n_ranked"), lit(0L)).as("n_ranked"),
        col("r_total"),
        coalesce(col("ap_num"), lit(0L)).as("ap_num"),
        when(least(lit(10L), col("r_total")) > 0,
          coalesce(col("ap_num"), lit(0L)).cast("double") /
            (lit(2520.0) * least(lit(10L), col("r_total"))
              .cast("double"))).as("ap"))
      .orderBy(col("qw"))
  }

  private val q325Sql =
    """WITH q(qw, rw) AS (VALUES ('join', 'hash'), ('scan', 'filter'),
      |  ('stream', 'window'), ('merge', 'order'), ('vector', 'column')),
      |d AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS tk
      |  FROM documents WHERE trim(text) != ''),
      |sc AS (
      |  SELECT q.qw, q.rw, d.doc_id,
      |    CAST(len(list_filter(tk, x -> x = q.qw)) AS BIGINT) AS tf1,
      |    CASE WHEN list_contains(tk, q.rw) THEN 1 ELSE 0 END AS rel
      |  FROM d CROSS JOIN q),
      |rk AS (
      |  SELECT qw, rw, doc_id, tf1, rel,
      |    row_number() OVER (PARTITION BY qw ORDER BY tf1 DESC, doc_id)
      |      AS k
      |  FROM sc WHERE tf1 > 0),
      |top AS (
      |  SELECT qw, rel, k,
      |    sum(rel) OVER (PARTITION BY qw ORDER BY k
      |      ROWS UNBOUNDED PRECEDING) AS hits
      |  FROM rk WHERE k <= 10),
      |apn AS (
      |  SELECT qw, CAST(sum(rel * hits * (2520 // k)) AS BIGINT)
      |      AS ap_num,
      |    count(*) AS n_ranked
      |  FROM top GROUP BY 1),
      |rt AS (
      |  SELECT qw, rw, CAST(sum(rel) AS BIGINT) AS r_total
      |  FROM sc GROUP BY 1, 2)
      |SELECT rt.qw, rt.rw,
      |  coalesce(apn.n_ranked, 0) AS n_ranked, rt.r_total,
      |  coalesce(apn.ap_num, 0) AS ap_num,
      |  CASE WHEN least(10, rt.r_total) > 0 THEN
      |    CAST(coalesce(apn.ap_num, 0) AS DOUBLE)
      |      / (2520.0 * CAST(least(10, rt.r_total) AS DOUBLE)) END AS ap
      |FROM rt LEFT JOIN apn ON apn.qw = rt.qw
      |ORDER BY rt.qw""".stripMargin

  // -------------------------------------------------------------- q364
  /** NDCG@10 retrieval evaluation (Evaluation.ndcgAtK) over the q325
    * query fixture with GRADED relevance (intent-word tf capped at 3):
    * docs ranked by query-word tf (ties by id), DCG/IDCG fold SORTED
    * log2-discounted terms (q60 rule), and all three score columns
    * leave as micro-unit BIGINTs (the q60/q83/q132 pattern) so the
    * log2 surface never reaches the driver hash as a raw double. */
  private def q364NdcgAtK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(("join", "hash"), ("scan", "filter"),
      ("stream", "window"), ("merge", "order"), ("vector", "column"))
      .toDF("qw", "rw")
    val d = Tables.load(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("tk"))
    val sc = d.crossJoin(broadcast(qs))
      .select(col("qw"), col("doc_id"),
        size(filter(col("tk"), x => x === col("qw"))).cast("long")
          .as("tf1"),
        least(size(filter(col("tk"), x => x === col("rw")))
          .cast("long"), lit(3L)).as("rel"))
      .filter(col("tf1") > 0)
    def micro(c: Column): Column = round(c * lit(1e6)).cast("long")
    graft.operators.Evaluation
      .ndcgAtK(sc, "qw", col("tf1"), col("doc_id"), col("rel"), k = 10)
      .select(col("qw"), col("n_ranked"), col("n_rel"),
        micro(col("dcg")).as("dcg_micro"),
        micro(col("idcg")).as("idcg_micro"),
        micro(col("ndcg")).as("ndcg_micro"))
      .orderBy(col("qw"))
  }

  private val q364Sql =
    """WITH q(qw, rw) AS (VALUES ('join', 'hash'), ('scan', 'filter'),
      |  ('stream', 'window'), ('merge', 'order'), ('vector', 'column')),
      |d AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS tk
      |  FROM documents WHERE trim(text) != ''),
      |sc AS (
      |  SELECT q.qw, d.doc_id,
      |    CAST(len(list_filter(tk, x -> x = q.qw)) AS BIGINT) AS tf1,
      |    least(CAST(len(list_filter(tk, x -> x = q.rw)) AS BIGINT), 3)
      |      AS rel
      |  FROM d CROSS JOIN q),
      |cand AS (SELECT * FROM sc WHERE tf1 > 0),
      |rk AS (
      |  SELECT qw, doc_id, rel,
      |    row_number() OVER (PARTITION BY qw ORDER BY tf1 DESC, doc_id)
      |      AS k
      |  FROM cand),
      |dcg AS (
      |  SELECT qw, count(*) AS n_ranked,
      |    list_aggregate(list_sort(list(
      |      CAST(rel AS DOUBLE) / log2(CAST(k AS DOUBLE) + 1.0))),
      |      'sum') AS dcg
      |  FROM rk WHERE k <= 10 GROUP BY 1),
      |ik AS (
      |  SELECT qw, rel,
      |    row_number() OVER (PARTITION BY qw ORDER BY rel DESC, doc_id)
      |      AS k
      |  FROM cand WHERE rel > 0),
      |idcg AS (
      |  SELECT qw, count(*) AS n_rel,
      |    list_aggregate(list_sort(list(
      |      CAST(rel AS DOUBLE) / log2(CAST(k AS DOUBLE) + 1.0))),
      |      'sum') AS idcg
      |  FROM ik WHERE k <= 10 GROUP BY 1)
      |SELECT dcg.qw, dcg.n_ranked, coalesce(idcg.n_rel, 0) AS n_rel,
      |  CAST(round(dcg.dcg * 1e6) AS BIGINT) AS dcg_micro,
      |  CAST(round(coalesce(idcg.idcg, 0.0) * 1e6) AS BIGINT)
      |    AS idcg_micro,
      |  CASE WHEN idcg.idcg > 0.0 THEN
      |    CAST(round(dcg.dcg / idcg.idcg * 1e6) AS BIGINT) END
      |    AS ndcg_micro
      |FROM dcg LEFT JOIN idcg ON idcg.qw = dcg.qw
      |ORDER BY dcg.qw""".stripMargin

  // ------------------------------------------------------- q378 / q379
  /** Shared generation-metrics fixture: reference = each document's
    * text; candidate = the same alnum tokens with every 6th word
    * replaced by the out-of-vocabulary token "xx" and the last two
    * words dropped — a synthetic "model output" with insertions the
    * reference lacks (exercises clipping: repeated "xx" grams can
    * never outscore the reference's zero) and a short length
    * (exercises BLEU's brevity penalty). Docs under 8 tokens are
    * excluded so both engines index the same windows; the fixture is
    * the deterministic doc_id-even HALF of the corpus (gate rows pin
    * correctness, not throughput — the operator's full-corpus cost is
    * the clippedGramStats scaladoc's measured number). */
  private def genPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextAnalysis => TA}
    val tk = TA.alnumTokens(col("text"))
    // Scale.spread AFTER the pushed filter: the tokenize here plus the
    // n-gram explodes in every consumer (BLEU/ROUGE/chrF/token-F1) are
    // per-row-heavy and the fixture is single-split (guide §2.5; r12)
    graft.operators.Scale.spread(
        Tables.load(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(2)) === 0))
      .select(col("doc_id"), col("text"), tk.as("__tk"))
      .filter(size(col("__tk")) >= 8)
      .select(col("doc_id"),
        array_join(transform(
          expr("slice(__tk, 1, size(__tk) - 2)"),
          (w, i) => when((i + 1) % 6 === 0, lit("xx")).otherwise(w)),
          " ").as("cand"),
        col("text").as("ref"))
  }

  /** Corpus BLEU-4 (Evaluation.corpusBleu) over the synthetic
    * candidate/reference pairs: per-order clipped matches and
    * candidate-gram counts are exact BIGINTs the oracle recomputes
    * via the same explode + per-doc min-join; the BLEU surface
    * (sorted ln fold, brevity penalty) leaves micro-rounded. */
  private def q378Bleu(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation
      .corpusBleu(genPairs(s, dir), "doc_id", col("cand"), col("ref"),
        maxN = 4)
      .select(col("n"), col("matches"), col("cand_grams"),
        col("c_len"), col("r_len"),
        round(col("bleu") * lit(1e6)).cast("long").as("bleu_micro"))
      .orderBy(col("n"))

  /** ROUGE-2 recall (Evaluation.rougeN) per document over the same
    * pairs: clipped bigram matches over reference bigram count — the
    * recall is ONE division of exact integers, so it hash-compares
    * raw (the oovStats rule). */
  private def q379Rouge(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation
      .rougeN(genPairs(s, dir), "doc_id", col("cand"), col("ref"),
        n = 2)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val genPairsSql =
    """d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      x -> x != '') AS rtk
      |  FROM documents WHERE doc_id % 2 = 0),
      |p AS (
      |  SELECT doc_id, rtk,
      |    list_transform(range(1, len(rtk) - 1),
      |      i -> CASE WHEN i % 6 = 0 THEN 'xx' ELSE rtk[i] END) AS ctk
      |  FROM d WHERE len(rtk) >= 8)""".stripMargin

  private val q378Sql =
    s"""WITH $genPairsSql,
       |g AS (
       |  SELECT doc_id, n.n,
       |    CASE WHEN len(ctk) >= n.n THEN
       |      list_transform(range(1, len(ctk) - n.n + 2),
       |        i -> array_to_string(ctk[i:i+n.n-1], ' '))
       |    ELSE [] END AS cg,
       |    CASE WHEN len(rtk) >= n.n THEN
       |      list_transform(range(1, len(rtk) - n.n + 2),
       |        i -> array_to_string(rtk[i:i+n.n-1], ' '))
       |    ELSE [] END AS rg
       |  FROM p CROSS JOIN (VALUES (1), (2), (3), (4)) AS n(n)),
       |cc AS (SELECT doc_id, n, g2 AS g, count(*) AS c
       |       FROM (SELECT doc_id, n, unnest(cg) AS g2 FROM g)
       |       GROUP BY 1, 2, 3),
       |rc AS (SELECT doc_id, n, g2 AS g, count(*) AS r
       |       FROM (SELECT doc_id, n, unnest(rg) AS g2 FROM g)
       |       GROUP BY 1, 2, 3),
       |m AS (SELECT cc.n, sum(least(cc.c, rc.r)) AS matches
       |      FROM cc JOIN rc ON rc.doc_id = cc.doc_id AND rc.n = cc.n
       |        AND rc.g = cc.g
       |      GROUP BY 1),
       |den AS (SELECT n, sum(len(cg)) AS cand_grams FROM g GROUP BY 1),
       |lens AS (SELECT sum(len(ctk)) AS c_len, sum(len(rtk)) AS r_len
       |         FROM p),
       |pern AS (
       |  SELECT den.n, coalesce(m.matches, 0) AS matches, den.cand_grams
       |  FROM den LEFT JOIN m ON m.n = den.n),
       |fold AS (
       |  SELECT min(matches) AS minm,
       |    list_aggregate(list_sort(list(
       |      ln(CAST(matches AS DOUBLE) / CAST(cand_grams AS DOUBLE)))),
       |      'sum') AS lnsum
       |  FROM pern)
       |SELECT CAST(pern.n AS INT) AS n,
       |  CAST(pern.matches AS BIGINT) AS matches,
       |  CAST(pern.cand_grams AS BIGINT) AS cand_grams,
       |  CAST(lens.c_len AS BIGINT) AS c_len,
       |  CAST(lens.r_len AS BIGINT) AS r_len,
       |  CAST(round((CASE WHEN fold.minm = 0 THEN 0.0 ELSE
       |    (CASE WHEN lens.c_len >= lens.r_len THEN 1.0
       |     ELSE exp(1.0 - CAST(lens.r_len AS DOUBLE)
       |       / CAST(lens.c_len AS DOUBLE)) END)
       |    * exp(fold.lnsum / 4.0) END) * 1e6) AS BIGINT) AS bleu_micro
       |FROM pern, lens, fold ORDER BY pern.n""".stripMargin

  private val q379Sql =
    s"""WITH $genPairsSql,
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ctk) >= 2 THEN
       |      list_transform(range(1, len(ctk)),
       |        i -> array_to_string(ctk[i:i+1], ' '))
       |    ELSE [] END AS cg,
       |    CASE WHEN len(rtk) >= 2 THEN
       |      list_transform(range(1, len(rtk)),
       |        i -> array_to_string(rtk[i:i+1], ' '))
       |    ELSE [] END AS rg
       |  FROM p),
       |cc AS (SELECT doc_id, g2 AS g, count(*) AS c
       |       FROM (SELECT doc_id, unnest(cg) AS g2 FROM g)
       |       GROUP BY 1, 2),
       |rc AS (SELECT doc_id, g2 AS g, count(*) AS r
       |       FROM (SELECT doc_id, unnest(rg) AS g2 FROM g)
       |       GROUP BY 1, 2),
       |m AS (SELECT cc.doc_id, sum(least(cc.c, rc.r)) AS matches
       |      FROM cc JOIN rc ON rc.doc_id = cc.doc_id AND rc.g = cc.g
       |      GROUP BY 1)
       |SELECT g.doc_id, CAST(coalesce(m.matches, 0) AS BIGINT) AS matches,
       |  CAST(len(g.rg) AS BIGINT) AS ref_grams,
       |  CASE WHEN len(g.rg) > 0 THEN
       |    CAST(coalesce(m.matches, 0) AS DOUBLE)
       |      / CAST(len(g.rg) AS DOUBLE) END AS rouge_n
       |FROM g LEFT JOIN m ON m.doc_id = g.doc_id
       |ORDER BY g.doc_id""".stripMargin

  /** Token-level F1 (Evaluation.tokenF1, the SQuAD answer-overlap
    * metric) per document over the same synthetic pairs: every column
    * is an exact integer or ONE division of exact integers — the row
    * hash-compares raw with no micro scaling anywhere. */
  private def q382TokenF1(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation
      .tokenF1(genPairs(s, dir), "doc_id", col("cand"), col("ref"))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val q382Sql =
    s"""WITH $genPairsSql,
       |cc AS (SELECT doc_id, g, count(*) AS c
       |       FROM (SELECT doc_id, unnest(ctk) AS g FROM p)
       |       GROUP BY 1, 2),
       |rc AS (SELECT doc_id, g, count(*) AS r
       |       FROM (SELECT doc_id, unnest(rtk) AS g FROM p)
       |       GROUP BY 1, 2),
       |m AS (SELECT cc.doc_id, sum(least(cc.c, rc.r)) AS matches
       |      FROM cc JOIN rc ON rc.doc_id = cc.doc_id AND rc.g = cc.g
       |      GROUP BY 1)
       |SELECT p.doc_id,
       |  CAST(coalesce(m.matches, 0) AS BIGINT) AS matches,
       |  CAST(len(p.ctk) AS BIGINT) AS cand_tokens,
       |  CAST(len(p.rtk) AS BIGINT) AS ref_tokens,
       |  CASE WHEN len(p.ctk) > 0 THEN
       |    CAST(coalesce(m.matches, 0) AS DOUBLE) / len(p.ctk) END
       |    AS precision,
       |  CASE WHEN len(p.rtk) > 0 THEN
       |    CAST(coalesce(m.matches, 0) AS DOUBLE) / len(p.rtk) END
       |    AS recall,
       |  CASE WHEN len(p.ctk) + len(p.rtk) > 0 THEN
       |    CAST(2 * coalesce(m.matches, 0) AS DOUBLE)
       |      / (len(p.ctk) + len(p.rtk)) END AS f1
       |FROM p LEFT JOIN m ON m.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  // -------------------------------------------------------------- q384
  /** Corpus chrF (Evaluation.chrF, β = 2, orders 1..6) over the
    * generation fixture — the character-level companion to q378's
    * BLEU: candidate = normalized tokens with "xx" substitutions,
    * reference = the RAW document text (mixed case + punctuation), so
    * the metric exercises exactly what chrF exists for — sub-word
    * credit across tokenization differences word grams can't see.
    * ASCII-only docs (the q323 restriction) so both engines index
    * identical code points. All per-order counts exact BIGINTs; the
    * F surface leaves micro-rounded. Fixture = the doc_id-multiple-
    * of-4 QUARTER (genPairs' even half, halved again): 6 char-gram
    * orders × 2 sides is ~5× the gram volume of word BLEU-4, the
    * metric's published cost — the gate pins correctness, not
    * throughput (the q378 fixture rule). */
  private def q384Chrf(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation
      .chrF(genPairs(s, dir)
          .filter(pmod(col("doc_id"), lit(4)) === 0 &&
            col("ref").rlike("^[\\x20-\\x7e]*$")),
        "doc_id", col("cand"), col("ref"), maxN = 6, beta = 2.0)
      .select(col("n"), col("matches"), col("cand_grams"),
        col("ref_grams"),
        round(col("chrf") * lit(1e6)).cast("long").as("chrf_micro"))
      .orderBy(col("n"))

  private val q384Sql =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      x -> x != '') AS rtk
      |  FROM documents
      |  WHERE doc_id % 4 = 0 AND regexp_matches(text, '^[\x20-\x7e]*$')),
      |p AS (
      |  SELECT doc_id, text,
      |    list_transform(range(1, len(rtk) - 1),
      |      i -> CASE WHEN i % 6 = 0 THEN 'xx' ELSE rtk[i] END) AS ctk
      |  FROM d WHERE len(rtk) >= 8),
      |s AS (
      |  SELECT doc_id,
      |    regexp_replace(array_to_string(ctk, ' '), '\s+', '', 'g') AS c,
      |    regexp_replace(text, '\s+', '', 'g') AS r
      |  FROM p),
      |g AS (
      |  SELECT doc_id, n.n,
      |    CASE WHEN length(c) >= n.n THEN
      |      list_transform(range(1, length(c) - n.n + 2),
      |        i -> substr(c, i, n.n))
      |    ELSE [] END AS cg,
      |    CASE WHEN length(r) >= n.n THEN
      |      list_transform(range(1, length(r) - n.n + 2),
      |        i -> substr(r, i, n.n))
      |    ELSE [] END AS rg
      |  FROM s CROSS JOIN
      |    (VALUES (1), (2), (3), (4), (5), (6)) AS n(n)),
      |cc AS (SELECT doc_id, n, g2 AS g, count(*) AS c
      |       FROM (SELECT doc_id, n, unnest(cg) AS g2 FROM g)
      |       GROUP BY 1, 2, 3),
      |rc AS (SELECT doc_id, n, g2 AS g, count(*) AS r
      |       FROM (SELECT doc_id, n, unnest(rg) AS g2 FROM g)
      |       GROUP BY 1, 2, 3),
      |m AS (SELECT cc.n, sum(least(cc.c, rc.r)) AS matches
      |      FROM cc JOIN rc ON rc.doc_id = cc.doc_id AND rc.n = cc.n
      |        AND rc.g = cc.g
      |      GROUP BY 1),
      |den AS (SELECT n, sum(len(cg)) AS cand_grams,
      |          sum(len(rg)) AS ref_grams
      |        FROM g GROUP BY 1),
      |pern AS (
      |  SELECT den.n, coalesce(m.matches, 0) AS matches,
      |    den.cand_grams, den.ref_grams
      |  FROM den LEFT JOIN m ON m.n = den.n),
      |fold AS (
      |  SELECT
      |    list_aggregate(list_sort(list(CASE WHEN cand_grams > 0
      |      THEN CAST(matches AS DOUBLE) / CAST(cand_grams AS DOUBLE)
      |      ELSE 0.0 END)), 'sum') AS psum,
      |    list_aggregate(list_sort(list(CASE WHEN ref_grams > 0
      |      THEN CAST(matches AS DOUBLE) / CAST(ref_grams AS DOUBLE)
      |      ELSE 0.0 END)), 'sum') AS rsum
      |  FROM pern)
      |SELECT CAST(pern.n AS INT) AS n,
      |  CAST(pern.matches AS BIGINT) AS matches,
      |  CAST(pern.cand_grams AS BIGINT) AS cand_grams,
      |  CAST(pern.ref_grams AS BIGINT) AS ref_grams,
      |  CAST(round((CASE WHEN fold.psum = 0.0 AND fold.rsum = 0.0
      |    THEN 0.0
      |    ELSE 5.0 * (fold.psum / 6.0) * (fold.rsum / 6.0)
      |      / (4.0 * (fold.psum / 6.0) + (fold.rsum / 6.0)) END) * 1e6)
      |    AS BIGINT) AS chrf_micro
      |FROM pern, fold ORDER BY pern.n""".stripMargin

  // -------------------------------------------------------------- q391
  /** ROUGE-L (Evaluation.rougeL) over a sparse slice of the
    * generation fixture, both sides truncated to 48 tokens — the
    * order-sensitive ROUGE beside q379's bag-of-bigrams recall. LCS
    * is exact integer DP (codegen'd TokenLcsExpression); every output
    * column is an exact integer or ONE division of exact integers, so
    * rows hash-compare raw. The oracle computes the SAME LCS with a
    * recursive CTE stepping one candidate token per iteration via the
    * prefix-max unrolling dp_i[j] = max(dp_{i-1}[j],
    * max_{j'≤j}(dp_{i-1}[j'−1] + eq(i,j'))) — the within-row
    * dependency eliminated, so each step is one list_transform. The
    * sparse fixture (1 in 10 of the even half) bounds the oracle's
    * O(n·m²) recursion, not the Spark side (whose DP is O(n·m) and
    * map-only). */
  private def q391RougeL(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation
      .rougeL(genPairs(s, dir)
          .filter(pmod(col("doc_id"), lit(20)) === 0),
        "doc_id", col("cand"), col("ref"), maxTokens = 48)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val q391Sql =
    s"""WITH RECURSIVE $genPairsSql,
       |q AS (
       |  SELECT doc_id, ctk[1:48] AS c, rtk[1:48] AS r
       |  FROM p WHERE doc_id % 20 = 0),
       |step(doc_id, i, dp) AS (
       |  SELECT doc_id, 0,
       |    list_transform(range(0, len(r) + 1), x -> 0)
       |  FROM q
       |  UNION ALL
       |  SELECT s.doc_id, s.i + 1,
       |    [0] || list_transform(range(1, len(q.r) + 1), j ->
       |      greatest(s.dp[j + 1],
       |        list_max(list_transform(range(1, j + 1), j2 ->
       |          s.dp[j2] + CASE WHEN q.c[s.i + 1] = q.r[j2]
       |            THEN 1 ELSE 0 END))))
       |  FROM step s JOIN q ON q.doc_id = s.doc_id
       |  WHERE s.i < len(q.c))
       |SELECT q.doc_id,
       |  CAST(f.dp[len(q.r) + 1] AS BIGINT) AS lcs,
       |  CAST(len(q.c) AS BIGINT) AS cand_tokens,
       |  CAST(len(q.r) AS BIGINT) AS ref_tokens,
       |  CASE WHEN len(q.r) > 0 THEN
       |    CAST(f.dp[len(q.r) + 1] AS DOUBLE) / len(q.r) END
       |    AS rouge_l_r,
       |  CASE WHEN len(q.c) > 0 THEN
       |    CAST(f.dp[len(q.r) + 1] AS DOUBLE) / len(q.c) END
       |    AS rouge_l_p,
       |  CASE WHEN len(q.c) + len(q.r) > 0 THEN
       |    CAST(2 * f.dp[len(q.r) + 1] AS DOUBLE)
       |      / (len(q.c) + len(q.r)) END AS rouge_l_f1
       |FROM q JOIN step f ON f.doc_id = q.doc_id AND f.i = len(q.c)
       |ORDER BY q.doc_id""".stripMargin

  // -------------------------------------------------------------- q386
  /** Distinct-n diversity (Evaluation.distinctN, orders 1..3) over
    * the generation fixture's CANDIDATE side — the mode-collapse
    * screen: distinct n-grams over total n-grams across all model
    * outputs. distinct_ratio is ONE division of exact BIGINTs, so the
    * row hash-compares raw (the oovStats rule). The "xx"
    * substitutions make the fixture non-trivial: a token that is 1/6
    * of the stream but one gram type drags distinct-1 down. */
  private def q386DistinctN(s: SparkSession, dir: String): DataFrame =
    graft.operators.Evaluation
      .distinctN(genPairs(s, dir), col("cand"), orders = Seq(1, 2, 3))
      .orderBy(col("n"))

  private val q386Sql =
    s"""WITH $genPairsSql,
       |g AS (
       |  SELECT n.n,
       |    CASE WHEN len(ctk) >= n.n THEN
       |      list_transform(range(1, len(ctk) - n.n + 2),
       |        i -> array_to_string(ctk[i:i+n.n-1], ' '))
       |    ELSE [] END AS gs
       |  FROM p CROSS JOIN (VALUES (1), (2), (3)) AS n(n)),
       |cnt AS (SELECT n, g2 AS g, count(*) AS c
       |        FROM (SELECT n, unnest(gs) AS g2 FROM g)
       |        GROUP BY 1, 2)
       |SELECT CAST(n AS INT) AS n,
       |  CAST(count(*) AS BIGINT) AS distinct_grams,
       |  CAST(sum(c) AS BIGINT) AS total_grams,
       |  CASE WHEN sum(c) > 0 THEN
       |    CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) END
       |    AS distinct_ratio
       |FROM cnt GROUP BY n ORDER BY n""".stripMargin

  // -------------------------------------------------------------- q387
  /** Expected + maximum calibration error
    * (Evaluation.expectedCalibrationError) over q326's deterministic
    * hash-model fixture — the single-number calibration verdict
    * beside q326's per-decile table: ECE collapses to ONE division of
    * exact integers (Σ gap_b / (100·N)); MCE is the max of per-bucket
    * exact-integer divisions; worst_bucket ties break to the smallest
    * bucket id. No float accumulates anywhere. */
  private def q387Ece(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(
        Sampling.hashBucket(col("event_id"), 100).as("p100"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    graft.operators.Evaluation
      .expectedCalibrationError(ev, col("p100"), col("y"), nBuckets = 10)
  }

  private val q387Sql =
    """WITH ev AS (
      |  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
      |    ::BIGINT % 100 AS p100,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |b AS (
      |  SELECT p100 // 10 AS bucket, count(*) AS n_b,
      |    CAST(sum(p100) AS BIGINT) AS sp,
      |    CAST(sum(y) AS BIGINT) AS sy
      |  FROM ev GROUP BY 1),
      |r AS (
      |  SELECT bucket, n_b, abs(sp - 100 * sy) AS gap,
      |    CAST(abs(sp - 100 * sy) AS DOUBLE)
      |      / (100.0 * CAST(n_b AS DOUBLE)) AS rr
      |  FROM b),
      |tot AS (
      |  SELECT CAST(sum(n_b) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS n_buckets,
      |    CAST(sum(gap) AS BIGINT) AS gap_sum,
      |    max(rr) AS mce
      |  FROM r)
      |SELECT tot.n, tot.n_buckets, tot.gap_sum,
      |  CAST(tot.gap_sum AS DOUBLE) / (100.0 * CAST(tot.n AS DOUBLE))
      |    AS ece,
      |  tot.mce,
      |  (SELECT min(bucket) FROM r, tot WHERE r.rr = tot.mce)
      |    AS worst_bucket
      |FROM tot""".stripMargin

  // -------------------------------------------------------------- q372
  /** Kaplan–Meier survival curve (EventAnalytics.kaplanMeier) over
    * user activity lifetimes: duration = days between a user's first
    * and last event, event = the user ever purchased (else censored
    * at last sight). Exact per-day risk sets; the survival product is
    * exp of an in-t-order cumulative ln sum, restated term for term
    * by the oracle's running window, and emitted micro-rounded (q60
    * pattern). The correct retention curve beside q263's cohort
    * shares — censoring handled, not conflated with churn. */
  private def q372KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    // 6-hour buckets: day granularity collapses the synthetic
    // fixture's lifetimes to ~3 distinct durations — too thin a curve
    val day = expr("unix_micros(ts) div 21600000000")
    val subj = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg((max(day) - min(day)).as("dur"),
        (max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          === 1L).as("ev"))
    graft.operators.EventAnalytics
      .kaplanMeier(subj, col("dur"), col("ev"))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        round(col("survival") * lit(1e6)).cast("long").as("surv_micro"))
      .orderBy(col("t"))
  }

  private val q372Sql =
    """WITH s AS (
      |  SELECT user_id,
      |    max(epoch_us(ts) // 21600000000)
      |      - min(epoch_us(ts) // 21600000000) AS t,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS e
      |  FROM events GROUP BY 1),
      |pt AS (
      |  SELECT t, CAST(sum(e) AS BIGINT) AS d,
      |    CAST(sum(1 - e) AS BIGINT) AS c
      |  FROM s GROUP BY 1),
      |w AS (
      |  SELECT t, d, c,
      |    (SELECT CAST(sum(d + c) AS BIGINT) FROM pt)
      |      - CAST(coalesce(sum(d + c) OVER (ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS n_risk
      |  FROM pt),
      |k AS (
      |  SELECT t, n_risk, d, c,
      |    CASE WHEN d = n_risk THEN 0.0 ELSE
      |      exp(sum(CASE WHEN d > 0 AND d < n_risk
      |        THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |        ELSE 0.0 END) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
      |    END AS surv
      |  FROM w)
      |SELECT t, n_risk, d, c,
      |  CAST(round(surv * 1e6) AS BIGINT) AS surv_micro
      |FROM k ORDER BY t""".stripMargin

  // -------------------------------------------------------------- q365
  /** Reciprocal rank @10 (Evaluation.reciprocalRankAtK), EXACT: same
    * fixture and ranking as q325; the first relevant rank r emits the
    * INTEGER 2520/r (lcm(1..10)) so per-query rr and corpus MRR are
    * single divisions of exact integers — the rank metric needs no
    * micro scaling at all. */
  private def q365MrrAtK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = Seq(("join", "hash"), ("scan", "filter"),
      ("stream", "window"), ("merge", "order"), ("vector", "column"))
      .toDF("qw", "rw")
    val d = Tables.load(s, dir, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("tk"))
    val sc = d.crossJoin(broadcast(qs))
      .select(col("qw"), col("doc_id"),
        size(filter(col("tk"), x => x === col("qw"))).cast("long")
          .as("tf1"),
        when(array_contains(col("tk"), col("rw")), 1L).otherwise(0L)
          .as("rel"))
      .filter(col("tf1") > 0)
    graft.operators.Evaluation
      .reciprocalRankAtK(sc, "qw", col("tf1"), col("doc_id"),
        col("rel"), k = 10)
      .orderBy(col("qw"))
  }

  private val q365Sql =
    """WITH q(qw, rw) AS (VALUES ('join', 'hash'), ('scan', 'filter'),
      |  ('stream', 'window'), ('merge', 'order'), ('vector', 'column')),
      |d AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS tk
      |  FROM documents WHERE trim(text) != ''),
      |sc AS (
      |  SELECT q.qw, d.doc_id,
      |    CAST(len(list_filter(tk, x -> x = q.qw)) AS BIGINT) AS tf1,
      |    CASE WHEN list_contains(tk, q.rw) THEN 1 ELSE 0 END AS rel
      |  FROM d CROSS JOIN q),
      |rk AS (
      |  SELECT qw, doc_id, rel,
      |    CAST(row_number() OVER (PARTITION BY qw
      |      ORDER BY tf1 DESC, doc_id) AS BIGINT) AS k
      |  FROM sc WHERE tf1 > 0)
      |SELECT qw,
      |  min(CASE WHEN rel > 0 THEN k END) AS first_rank,
      |  coalesce(2520 // min(CASE WHEN rel > 0 THEN k END), 0)
      |    AS rr_num,
      |  CAST(coalesce(2520 // min(CASE WHEN rel > 0 THEN k END), 0)
      |    AS DOUBLE) / 2520.0 AS rr
      |FROM rk WHERE k <= 10
      |GROUP BY qw ORDER BY qw""".stripMargin

  // -------------------------------------------------------------- q326
  /** Brier score + per-decile calibration gaps, all-integer: a
    * deterministic hash "model" scores each event with p ∈ {0..99}%
    * against the purchase label; Brier = Σ(p100 − 100y)² / (10⁴·n)
    * is exact integers up to ONE final division, and each decile's
    * calibration gap |Σp100 − 100·Σy| is the cross-multiplied form
    * of n_b·|p̄_b − ȳ_b| — the probabilistic-forecast audit with no
    * float accumulation anywhere. */
  private def q326Brier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(
        Sampling.hashBucket(col("event_id"), 100).as("p100"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val tot = ev.agg(count(lit(1)).as("n"),
      sum((col("p100") - lit(100L) * col("y")) *
        (col("p100") - lit(100L) * col("y"))).as("sse"))
      .select(col("n"), col("sse"),
        (col("sse").cast("double") /
          (lit(10000.0) * col("n").cast("double"))).as("brier"))
    ev.withColumn("decile", floor(col("p100").cast("double") / 10.0)
        .cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_b"), sum(col("p100")).as("sp"),
        sum(col("y")).as("sy"))
      .withColumn("gap", abs(col("sp") - lit(100L) * col("sy")))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_b"), col("sp"), col("sy"),
        col("gap"), col("n"), col("sse"), col("brier"))
      .orderBy(col("decile"))
  }

  private val q326Sql =
    """WITH ev AS (
      |  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
      |    ::BIGINT % 100 AS p100,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |tot AS (
      |  SELECT count(*) AS n,
      |    CAST(sum((p100 - 100 * y) * (p100 - 100 * y)) AS BIGINT)
      |      AS sse
      |  FROM ev),
      |d AS (
      |  SELECT p100 // 10 AS decile, count(*) AS n_b,
      |    CAST(sum(p100) AS BIGINT) AS sp,
      |    CAST(sum(y) AS BIGINT) AS sy
      |  FROM ev GROUP BY 1)
      |SELECT decile, n_b, sp, sy, abs(sp - 100 * sy) AS gap,
      |  tot.n, tot.sse,
      |  CAST(tot.sse AS DOUBLE) / (10000.0 * CAST(tot.n AS DOUBLE))
      |    AS brier
      |FROM d CROSS JOIN tot ORDER BY decile""".stripMargin

  // -------------------------------------------------------------- q327
  /** Time-weighted average value (TWAP) per event type: each
    * observation holds until the user's next event, so the weight is
    * the hold duration in whole seconds (exact integer from µs floor
    * division) and the metric is Σ cents·Δt_sec / ΣΔt_sec — the
    * finance/metrics aggregation where plain AVG is wrong whenever
    * sampling is irregular. All-integer numerator and denominator
    * (budgeted: cents ≤ 10⁴ × Δt ≤ 3·10⁶ s × 10⁶ rows < 2⁶³), one
    * final division. Per-user lag window, parallel across users. */
  private def q327Twap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .withColumn("dt",
        (lead(unix_micros(col("ts")), 1).over(w) -
          unix_micros(col("ts"))))
      .filter(col("dt").isNotNull)
      .withColumn("dts", floor(col("dt").cast("double") / 1e6)
        .cast("long"))
      .filter(col("dts") > 0)
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents") * col("dts")).as("num"),
        sum(col("dts")).as("den"))
      .select(col("event_type"), col("n"), col("num"), col("den"),
        (col("num").cast("double") / col("den").cast("double"))
          .as("twap_cents"))
      .orderBy(col("event_type"))
  }

  private val q327Sql =
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) - epoch_us(ts) AS dt
      |  FROM events),
      |h AS (
      |  SELECT event_type, cents,
      |    CAST(floor(CAST(dt AS DOUBLE) / 1000000.0) AS BIGINT) AS dts
      |  FROM ev WHERE dt IS NOT NULL)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(cents * dts) AS BIGINT) AS num,
      |  CAST(sum(dts) AS BIGINT) AS den,
      |  CAST(CAST(sum(cents * dts) AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(sum(dts) AS BIGINT) AS DOUBLE) AS twap_cents
      |FROM h WHERE dts > 0
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q329
  /** Wilson score intervals for per-type purchase-rate proportions:
    * exact counts, then the interval as ONE fixed chain of
    * correctly-rounded IEEE ops (one sqrt, z = 1.96 literal) — the
    * q304 bit-stability recipe applied to interval estimation. The
    * Wilson form stays valid at small n and p near 0/1, where the
    * normal interval collapses — the right default for funnel-rate
    * dashboards. */
  private def q329Wilson(s: SparkSession, dir: String): DataFrame = {
    val z2 = lit(1.96 * 1.96)
    val ev = Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 30.0, 1L).otherwise(0L)).as("x"))
    def d(c: String): Column = col(c).cast("double")
    ev.select(col("event_type"), col("n"), col("x"),
        (d("x") / d("n")).as("p_hat"))
      .withColumn("center",
        (col("p_hat") + z2 / (lit(2.0) * d("n"))) /
          (lit(1.0) + z2 / d("n")))
      .withColumn("half",
        (lit(1.96) * sqrt(col("p_hat") * (lit(1.0) - col("p_hat"))
          / d("n") + z2 / (lit(4.0) * d("n") * d("n")))) /
          (lit(1.0) + z2 / d("n")))
      .select(col("event_type"), col("n"), col("x"), col("p_hat"),
        (col("center") - col("half")).as("wilson_lo"),
        (col("center") + col("half")).as("wilson_hi"))
      .orderBy(col("event_type"))
  }

  private val q329Sql =
    """WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CASE WHEN value > 30.0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |b AS (
      |  SELECT event_type, n, x,
      |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
      |    CAST(n AS DOUBLE) AS dn
      |  FROM a),
      |c AS (
      |  SELECT event_type, n, x, p_hat,
      |    (p_hat + 3.8415999999999997 / (2.0 * dn))
      |      / (1.0 + 3.8415999999999997 / dn) AS center,
      |    (1.96 * sqrt(p_hat * (1.0 - p_hat) / dn
      |        + 3.8415999999999997 / (4.0 * dn * dn)))
      |      / (1.0 + 3.8415999999999997 / dn) AS half
      |  FROM b)
      |SELECT event_type, n, x, p_hat,
      |  center - half AS wilson_lo, center + half AS wilson_hi
      |FROM c ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q330
  /** Youden-J optimal threshold selection: over every distinct score
    * cutpoint (predict positive when score ≥ c), J = TPR − FPR is
    * ranked by the CROSS-MULTIPLIED integer TP·N − FP·P — exact
    * ordering, no float comparisons — and ties break toward the
    * smallest cutpoint. Prefix TP/FP counts come from one descending
    * cumulative window over the distinct-score table (one row per
    * distinct score, never per event). Output: the chosen cutpoint's
    * full confusion matrix and J. */
  private def q330Youden(s: SparkSession, dir: String): DataFrame =
    Evaluation.youdenThreshold(Tables.load(s, dir, "events"),
      labelCol = col("event_type") === "purchase",
      scoreCol = (col("value").cast("decimal(18,2)") * 100).cast("long"))

  private val q330Sql =
    """WITH ev AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |bs AS (
      |  SELECT score, CAST(sum(y) AS BIGINT) AS pos_c,
      |    CAST(sum(1 - y) AS BIGINT) AS neg_c
      |  FROM ev GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(y) AS BIGINT) AS p_tot,
      |    CAST(sum(1 - y) AS BIGINT) AS n_tot
      |  FROM ev),
      |cand AS (
      |  SELECT score,
      |    CAST(sum(pos_c) OVER (ORDER BY score DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
      |    CAST(sum(neg_c) OVER (ORDER BY score DESC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
      |  FROM bs),
      |j AS (
      |  SELECT score, tp, fp, p_tot, n_tot,
      |    CAST(tp * n_tot - fp * p_tot AS BIGINT) AS j_scaled
      |  FROM cand CROSS JOIN tot)
      |SELECT score AS cutpoint, tp, fp,
      |  CAST(p_tot - tp AS BIGINT) AS fn,
      |  CAST(n_tot - fp AS BIGINT) AS tn, j_scaled,
      |  CAST(j_scaled AS DOUBLE)
      |    / CAST(p_tot * n_tot AS DOUBLE) AS youden_j
      |FROM j ORDER BY j_scaled DESC, score LIMIT 1""".stripMargin

  // -------------------------------------------------------------- q333
  /** Grid search with deterministic CV folds: five score thresholds ×
    * three md5-hash folds, per-cell exact correct-prediction counts,
    * winner = argmax total correct (integer ordering, ties to the
    * smaller threshold) — the hyperparameter-selection loop as ONE
    * crossJoin of a constant grid, not a driver loop; accuracy's
    * float division happens after all decisions are made on integers.
    */
  private def q333GridCv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = Seq(1000L, 2000L, 3000L, 4000L, 5000L).toDF("t")
    val ev = Tables.load(s, dir, "events")
      .select(
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("score"),
        Sampling.hashBucket(col("event_id"), 3).as("fold"))
    val cells = ev.crossJoin(broadcast(grid))
      .select(col("t"), col("fold"),
        when((col("score") >= col("t")) === (col("y") === 1L), 1L)
          .otherwise(0L).as("c"))
      .groupBy(col("t"), col("fold"))
      .agg(sum(col("c")).as("correct"), count(lit(1)).as("n"))
    val perT = cells.groupBy(col("t"))
      .agg(count(lit(1)).as("n_folds"),
        sum(col("correct")).as("total_correct"),
        sum(col("n")).as("n_total"))
      .localCheckpoint(true)
    val best = perT.orderBy(col("total_correct").desc, col("t")).limit(1)
      .select(col("t").as("bt"))
    perT.crossJoin(broadcast(best))
      .select(col("t"), col("n_folds"), col("total_correct"),
        col("n_total"),
        (col("total_correct").cast("double") /
          col("n_total").cast("double")).as("accuracy"),
        when(col("t") === col("bt"), 1L).otherwise(0L).as("is_best"))
      .orderBy(col("t"))
  }

  private val q333Sql =
    """WITH grid(t) AS (VALUES (CAST(1000 AS BIGINT)), (2000), (3000),
      |  (4000), (5000)),
      |ev AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
      |      AS y,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS score,
      |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
      |      ::BIGINT % 3 AS fold
      |  FROM events),
      |cells AS (
      |  SELECT t, fold,
      |    CAST(sum(CASE WHEN (score >= t) = (y = 1) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS correct,
      |    count(*) AS n
      |  FROM ev CROSS JOIN grid GROUP BY 1, 2),
      |pert AS (
      |  SELECT t, count(*) AS n_folds,
      |    CAST(sum(correct) AS BIGINT) AS total_correct,
      |    CAST(sum(n) AS BIGINT) AS n_total
      |  FROM cells GROUP BY 1),
      |best AS (SELECT t AS bt FROM pert
      |         ORDER BY total_correct DESC, t LIMIT 1)
      |SELECT t, n_folds, total_correct, n_total,
      |  CAST(total_correct AS DOUBLE) / CAST(n_total AS DOUBLE)
      |    AS accuracy,
      |  CASE WHEN t = bt THEN 1 ELSE 0 END AS is_best
      |FROM pert CROSS JOIN best ORDER BY t""".stripMargin

  // -------------------------------------------------------------- q334
  /** Kendall tau-a rank correlation between account balance and order
    * activity over a bounded customer slice: concordant/discordant
    * counted EXACTLY over the C(n,2) pair join (n = 200 — documented
    * bound; the at-scale path is sampling or the O(n log n)
    * merge-sort inversion count), tau one final division. Spearman is
    * q233; Kendall completes the rank-correlation pair. */
  private def q334KendallTau(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .as("x"))
    val ord = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
    val pts = cust.join(ord, col("k") === col("o_custkey"), "left_outer")
      .select(col("k"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint(true)
    val pairs = pts.as("a")
      .join(pts.select(col("k").as("k2"), col("x").as("x2"),
        col("y").as("y2")), col("k") < col("k2"))
      .select(
        signum((col("x") - col("x2")).cast("double")).cast("long")
          .as("sx"),
        signum((col("y") - col("y2")).cast("double")).cast("long")
          .as("sy"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L))
          .as("concordant"),
        sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L))
          .as("discordant"))
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        ((col("concordant") - col("discordant")).cast("double") /
          col("n_pairs").cast("double")).as("tau_a"))
  }

  private val q334Sql =
    """WITH cust AS (
      |  SELECT c_custkey AS k,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      |  FROM customer WHERE c_custkey <= 200),
      |oc AS (SELECT o_custkey, count(*) AS y FROM orders GROUP BY 1),
      |pts AS (
      |  SELECT k, x, coalesce(y, 0) AS y
      |  FROM cust LEFT JOIN oc ON oc.o_custkey = cust.k),
      |pairs AS (
      |  SELECT
      |    CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1 ELSE 0 END
      |      AS sx,
      |    CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1 ELSE 0 END
      |      AS sy
      |  FROM pts a JOIN pts b ON a.k < b.k)
      |SELECT count(*) AS n_pairs,
      |  CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS concordant,
      |  CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS discordant,
      |  CAST(CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
      |      AS BIGINT)
      |    - CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS tau_a
      |FROM pairs""".stripMargin

  // -------------------------------------------------------------- q335
  /** Split conformal prediction interval: calibrate on first-half
    * January (predictor = each user's calibration-mean spend, a
    * pinned exact-int division), take q̂ = the ⌈(n+1)(1−α)⌉-th
    * smallest absolute residual — an ORDER STATISTIC found through
    * the distributed exact-ECDF cum table, not a global sort — and
    * measure empirical coverage of |y − ŷ| ≤ q̂ on the second half.
    * The distribution-free uncertainty wrapper every deployed
    * regressor owes its consumers; α = 0.1, rank ceiling in exact
    * integer arithmetic. */
  private def q335Conformal(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"), col("ts"))
    val calib = ev.filter(col("ts") < cut)
    val pred = calib.groupBy(col("user_id"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("nc"))
      .select(col("user_id"),
        (col("sc").cast("double") / col("nc").cast("double"))
          .as("pred"))
      .localCheckpoint(true)
    val resid = calib.join(pred, Seq("user_id"))
      .select(abs(col("cents").cast("double") - col("pred")).as("r"))
      .localCheckpoint(true)
    val nCalib = resid.count()
    val k = (9L * (nCalib + 1L) + 9L) / 10L // = ceil(0.9·(n+1)) exactly
    val qhat = Quantiles.ecdf(resid, "r")
      .filter(col("cum") >= k)
      .orderBy(col("value")).limit(1)
      .select(col("value").as("q_hat"))
    ev.filter(col("ts") >= cut)
      .join(pred, Seq("user_id"))
      .crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("cents").cast("double") - col("pred")) <=
          col("q_hat"), 1L).otherwise(0L)).as("n_covered"),
        max(col("q_hat")).as("q_hat"))
      .select(lit(nCalib).as("n_calib"), lit(k).as("k_rank"),
        col("q_hat"), col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }

  private val q335Sql =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    ts
      |  FROM events),
      |calib AS (SELECT * FROM ev WHERE ts < TIMESTAMP '2024-01-16'),
      |pred AS (
      |  SELECT user_id,
      |    CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS pred
      |  FROM calib GROUP BY 1),
      |resid AS (
      |  SELECT abs(CAST(c.cents AS DOUBLE) - p.pred) AS r
      |  FROM calib c JOIN pred p ON p.user_id = c.user_id),
      |n AS (SELECT count(*) AS n_calib,
      |        (9 * (count(*) + 1) + 9) // 10 AS k FROM resid),
      |cume AS (
      |  SELECT r, sum(cnt) OVER (ORDER BY r) AS cum
      |  FROM (SELECT r, count(*) AS cnt FROM resid GROUP BY 1)),
      |qh AS (
      |  SELECT r AS q_hat FROM cume CROSS JOIN n
      |  WHERE cum >= k ORDER BY r LIMIT 1),
      |t AS (
      |  SELECT count(*) AS n_test,
      |    CAST(sum(CASE WHEN abs(CAST(e.cents AS DOUBLE) - p.pred)
      |      <= qh.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
      |    max(qh.q_hat) AS q_hat
      |  FROM ev e JOIN pred p ON p.user_id = e.user_id
      |  CROSS JOIN qh
      |  WHERE e.ts >= TIMESTAMP '2024-01-16')
      |SELECT n.n_calib, CAST(n.k AS BIGINT) AS k_rank, t.q_hat,
      |  t.n_test, t.n_covered,
      |  CAST(t.n_covered AS DOUBLE) / CAST(t.n_test AS DOUBLE)
      |    AS coverage
      |FROM t CROSS JOIN n""".stripMargin

  // -------------------------------------------------------------- q336
  /** Deterministic RANSAC line fit: 50 candidate models from
    * HASH-CHOSEN point pairs (no RNG state — candidate j samples
    * points (97j mod 1400)+1 and (131j mod 1400)+2), inliers counted
    * with pinned |y − (mx+b)| ≤ 50 comparisons, winner by (inlier
    * count, candidate id) integer ordering, then an EXACT-moment OLS
    * refit on the winner's inlier set — robust fitting over planted
    * y = 3x + 500 ± 10 data with every 10th point an outlier. Scale:
    * candidates are a broadcast constant; inlier counting is one
    * map pass over points × 50. */
  private def q336Ransac(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("k"),
        (col("c_custkey") % 1000).as("x"))
      .withColumn("y",
        lit(3L) * col("x") + 500L + pmod(col("k"), lit(21)) - 10L +
          when(col("k") % 10 === 0,
            lit(5000L) + pmod(col("k"), lit(7)) * 1000L).otherwise(0L))
      .localCheckpoint(true)
    val cands = (0 until 50).map { j =>
      (j.toLong, (97L * j) % 1400L + 1L, (131L * j) % 1400L + 2L)
    }.toDF("j", "k1", "k2")
    val models = cands
      .join(pts.select(col("k").as("k1"), col("x").as("x1"),
        col("y").as("y1")), Seq("k1"))
      .join(pts.select(col("k").as("k2"), col("x").as("x2"),
        col("y").as("y2")), Seq("k2"))
      .filter(col("x1") =!= col("x2"))
      .select(col("j"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("m"),
        col("x1").cast("double").as("dx1"),
        col("y1").cast("double").as("dy1"))
      .select(col("j"), col("m"),
        (col("dy1") - col("m") * col("dx1")).as("b"))
    val scored = pts.crossJoin(broadcast(models))
      .filter(abs(col("y").cast("double") -
        (col("m") * col("x").cast("double") + col("b"))) <= 50.0)
      .groupBy(col("j"), col("m"), col("b"))
      .agg(count(lit(1)).as("n_inliers"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    val best = scored.orderBy(col("n_inliers").desc, col("j")).limit(1)
    def d(c: String): Column = col(c).cast("double")
    best.select(col("j").as("best_j"), col("m").as("cand_slope"),
      col("b").as("cand_icept"), col("n_inliers"),
      ((d("n_inliers") * d("sxy") - d("sx") * d("sy")) /
        (d("n_inliers") * d("sxx") - d("sx") * d("sx")))
        .as("refit_slope"),
      ((d("sy") - (d("n_inliers") * d("sxy") - d("sx") * d("sy")) /
        (d("n_inliers") * d("sxx") - d("sx") * d("sx")) * d("sx")) /
        d("n_inliers")).as("refit_icept"))
  }

  private val q336Sql =
    """WITH pts AS (
      |  SELECT c_custkey AS k, c_custkey % 1000 AS x,
      |    3 * (c_custkey % 1000) + 500 + (c_custkey % 21) - 10 +
      |      CASE WHEN c_custkey % 10 = 0
      |        THEN 5000 + (c_custkey % 7) * 1000 ELSE 0 END AS y
      |  FROM customer),
      |cands AS (
      |  SELECT j, (97 * j) % 1400 + 1 AS k1, (131 * j) % 1400 + 2 AS k2
      |  FROM (SELECT unnest(range(0, 50)) AS j)),
      |models AS (
      |  SELECT c.j,
      |    CAST(p2.y - p1.y AS DOUBLE) / CAST(p2.x - p1.x AS DOUBLE)
      |      AS m,
      |    CAST(p1.y AS DOUBLE)
      |      - CAST(p2.y - p1.y AS DOUBLE) / CAST(p2.x - p1.x AS DOUBLE)
      |        * CAST(p1.x AS DOUBLE) AS b
      |  FROM cands c
      |  JOIN pts p1 ON p1.k = c.k1
      |  JOIN pts p2 ON p2.k = c.k2
      |  WHERE p1.x != p2.x),
      |scored AS (
      |  SELECT m.j, m.m, m.b, count(*) AS n_inliers,
      |    CAST(sum(p.x) AS BIGINT) AS sx,
      |    CAST(sum(p.y) AS BIGINT) AS sy,
      |    CAST(sum(p.x * p.x) AS BIGINT) AS sxx,
      |    CAST(sum(p.x * p.y) AS BIGINT) AS sxy
      |  FROM pts p CROSS JOIN models m
      |  WHERE abs(CAST(p.y AS DOUBLE)
      |    - (m.m * CAST(p.x AS DOUBLE) + m.b)) <= 50.0
      |  GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT * FROM scored ORDER BY n_inliers DESC, j LIMIT 1)
      |SELECT j AS best_j, m AS cand_slope, b AS cand_icept, n_inliers,
      |  (CAST(n_inliers AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n_inliers AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS refit_slope,
      |  (CAST(sy AS DOUBLE)
      |    - (CAST(n_inliers AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n_inliers AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * CAST(sx AS DOUBLE))
      |    / CAST(n_inliers AS DOUBLE) AS refit_icept
      |FROM best""".stripMargin

  // -------------------------------------------------------------- q338
  /** Capped geometric chaining (index construction): per event type,
    * daily exact-cents totals → day-over-day growth factors g_d =
    * s_d/s_{d−1} clipped to [0.5, 2.0] (the outlier guard that stops
    * the chain telescoping trivially), chained as an ORDERED product
    * fold in day order — the q168 EWMA fold discipline applied to
    * multiplicative linking. Every g_d is a pinned division of exact
    * ints, the clip is a pinned comparison, and the fold order is the
    * recurrence's own order, identical in DuckDB's scalar
    * list_reduce. */
  private def q338GrowthChain(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val g = daily
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > 0L)
      .select(col("event_type"), col("day"),
        least(greatest(col("cents").cast("double") /
          col("prev").cast("double"), lit(0.5)), lit(2.0)).as("gf"))
    g.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        aggregate(transform(sort_array(collect_list(
          struct(col("day"), col("gf")))), x => x.getField("gf")),
          lit(1.0), (acc, x) => acc * x).as("chained"))
      .orderBy(col("event_type"))
  }

  private val q338Sql =
    """WITH daily AS (
      |  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, day,
      |    least(greatest(CAST(cents AS DOUBLE)
      |      / CAST(lag(cents) OVER (PARTITION BY event_type
      |        ORDER BY day) AS DOUBLE), 0.5), 2.0) AS gf,
      |    lag(cents) OVER (PARTITION BY event_type ORDER BY day)
      |      AS prev
      |  FROM daily)
      |SELECT event_type, count(*) AS n_days,
      |  list_reduce(list_prepend(1.0, list(gf ORDER BY day)),
      |    (a, b) -> a * b) AS chained
      |FROM g WHERE prev IS NOT NULL AND prev > 0
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q339
  /** Process-mining conformance check: the directly-follows relation
    * of each user's event trace (lag over the per-user time order)
    * against a declared process model (signup→view→click→purchase,
    * plus self-loops and error-from-anywhere) — per transition its
    * frequency and verdict, plus the trace-level violation share.
    * The event-log conformance primitive (van der Aalst), all exact
    * counts; the model is a broadcast literal table. */
  private def q339Conformance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val allowed = Seq(
      ("signup", "view"), ("view", "click"), ("click", "purchase"),
      ("view", "view"), ("click", "view"), ("purchase", "view"),
      ("signup", "signup"), ("view", "error"), ("click", "error"))
      .toDF("a_from", "a_to").withColumn("ok", lit(1L))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val df = Tables.load(s, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("t_from"), col("event_type").as("t_to"))
    val rel = df.groupBy(col("t_from"), col("t_to"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(allowed),
        col("t_from") === col("a_from") && col("t_to") === col("a_to"),
        "left_outer")
      .select(col("t_from"), col("t_to"), col("n"),
        coalesce(col("ok"), lit(0L)).as("allowed"))
      .localCheckpoint(true)
    val tot = rel.agg(sum(col("n")).as("n_total"),
      sum(when(col("allowed") === 0L, col("n")).otherwise(0L))
        .as("n_violations"))
    rel.crossJoin(broadcast(tot))
      .select(col("t_from"), col("t_to"), col("n"), col("allowed"),
        col("n_total"), col("n_violations"),
        (col("n_violations").cast("double") /
          col("n_total").cast("double")).as("violation_share"))
      .orderBy(col("t_from"), col("t_to"))
  }

  private val q339Sql =
    """WITH allowed(a_from, a_to) AS (VALUES
      |  ('signup', 'view'), ('view', 'click'), ('click', 'purchase'),
      |  ('view', 'view'), ('click', 'view'), ('purchase', 'view'),
      |  ('signup', 'signup'), ('view', 'error'), ('click', 'error')),
      |tr AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t_from,
      |    event_type AS t_to
      |  FROM events),
      |rel AS (
      |  SELECT t.t_from, t.t_to, count(*) AS n,
      |    CASE WHEN a.a_from IS NULL THEN 0 ELSE 1 END AS allowed
      |  FROM tr t LEFT JOIN allowed a
      |    ON a.a_from = t.t_from AND a.a_to = t.t_to
      |  WHERE t.t_from IS NOT NULL
      |  GROUP BY 1, 2, 4),
      |tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
      |    CAST(sum(CASE WHEN allowed = 0 THEN n ELSE 0 END) AS BIGINT)
      |      AS n_violations
      |  FROM rel)
      |SELECT t_from, t_to, n, allowed, n_total, n_violations,
      |  CAST(n_violations AS DOUBLE) / CAST(n_total AS DOUBLE)
      |    AS violation_share
      |FROM rel CROSS JOIN tot
      |ORDER BY t_from, t_to""".stripMargin

  // -------------------------------------------------------------- q340
  /** Cohort LTV curves: users cohorted by first-event week, spend
    * accumulated by week-age — cum_cents_per_user(cohort, age) is the
    * lifetime-value trajectory marketing reads. Week arithmetic is
    * exact integer floor division on epoch days; the cumulative runs
    * per cohort (partitioned window over the bounded cohort×age
    * grid, never over events). One final division by cohort size. */
  private def q340LtvCohorts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"),
        floor(unix_micros(col("ts")).cast("double") /
          (7.0 * 86400.0 * 1e6)).cast("long").as("wk"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
    val firstWk = ev.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort"))
    val cohortSize = firstWk.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"))
    val grid = ev.join(firstWk, Seq("user_id"))
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("age"))
      .agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_cents", sum(col("cents")).over(w))
      .join(cohortSize, Seq("cohort"))
      .select(col("cohort"), col("age"), col("n_users"), col("cents"),
        col("cum_cents"),
        (col("cum_cents").cast("double") / col("n_users").cast("double"))
          .as("ltv_cents"))
      .orderBy(col("cohort"), col("age"))
  }

  private val q340Sql =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE)
      |      / (7.0 * 86400.0 * 1e6)) AS BIGINT) AS wk,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |fw AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
      |cs AS (SELECT cohort, count(*) AS n_users FROM fw GROUP BY 1),
      |grid AS (
      |  SELECT fw.cohort, ev.wk - fw.cohort AS age,
      |    CAST(sum(ev.cents) AS BIGINT) AS cents
      |  FROM ev JOIN fw ON fw.user_id = ev.user_id
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, age, cents,
      |    CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |  FROM grid)
      |SELECT cum.cohort, cum.age, cs.n_users, cum.cents,
      |  cum.cum_cents,
      |  CAST(cum.cum_cents AS DOUBLE) / CAST(cs.n_users AS DOUBLE)
      |    AS ltv_cents
      |FROM cum JOIN cs ON cs.cohort = cum.cohort
      |ORDER BY cum.cohort, cum.age""".stripMargin

  // -------------------------------------------------------------- q341
  /** Peak-concurrency census: each event opens a 30-minute presence
    * interval; per day, the maximum number of simultaneously-open
    * intervals — the capacity-planning statistic — via the classic
    * ±1 sweep (interval endpoints as deltas, running sum, max), with
    * the running sum per DAY partition (parallel across days, never a
    * global order). Intervals are clipped to their start day so each
    * day's sweep is self-contained and exact. */
  private def q341Concurrency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
      .select(unix_micros(col("ts")).as("t0"), col("event_id"))
      .withColumn("day", floor(col("t0").cast("double") /
        (86400.0 * 1e6)).cast("long"))
      .withColumn("dayEnd", (col("day") + 1L) * 86400000000L)
      .withColumn("t1",
        least(col("t0") + 1800000000L, col("dayEnd")))
    val deltas = ev.select(col("day"), col("t0").as("t"), lit(1L).as("d"))
      .unionAll(ev.select(col("day"), col("t1").as("t"),
        lit(-1L).as("d")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("open", sum(col("d")).over(w))
      .groupBy(col("day"))
      .agg(max(col("open")).as("peak"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_events"))
      .orderBy(col("day"))
  }

  private val q341Sql =
    """WITH ev AS (
      |  SELECT epoch_us(ts) AS t0,
      |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / (86400.0 * 1e6))
      |      AS BIGINT) AS day
      |  FROM events),
      |iv AS (
      |  SELECT day, t0,
      |    least(t0 + 1800000000, (day + 1) * 86400000000) AS t1
      |  FROM ev),
      |deltas AS (
      |  SELECT day, t0 AS t, 1 AS d FROM iv
      |  UNION ALL SELECT day, t1, -1 FROM iv),
      |sw AS (
      |  SELECT day, d,
      |    CAST(sum(d) OVER (PARTITION BY day ORDER BY t, d
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open
      |  FROM deltas)
      |SELECT day, max(open) AS peak,
      |  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_events
      |FROM sw GROUP BY 1 ORDER BY day""".stripMargin

  // -------------------------------------------------------------- q345
  /** k-anonymity / l-diversity audit over the (nation, market
    * segment, balance-band) quasi-identifier: per equivalence class
    * its size and the number of distinct sensitive values (order
    * priority of the customer's orders), then the privacy headline —
    * classes and ROWS violating k = 5 and l = 2. The release-gate
    * audit a data-sharing pipeline runs before export; all exact
    * counts, two aggregates. */
  private def q345KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val qi = Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey").as("nation"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal").cast("double") / 2000.0).cast("long")
          .as("bal_band"),
        col("o_orderpriority").as("sensitive"))
    val classes = qi.groupBy(col("nation"), col("seg"), col("bal_band"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("sensitive")).as("l_div"))
      .localCheckpoint(true)
    classes.agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"),
        sum(when(col("class_size") < 5L, 1L).otherwise(0L))
          .as("classes_under_k"),
        sum(when(col("class_size") < 5L, col("class_size"))
          .otherwise(0L)).as("rows_under_k"),
        sum(when(col("l_div") < 2L, 1L).otherwise(0L))
          .as("classes_under_l"),
        sum(when(col("l_div") < 2L, col("class_size")).otherwise(0L))
          .as("rows_under_l"),
        min(col("class_size")).as("min_class"))
      .select(col("n_classes"), col("n_rows"), col("classes_under_k"),
        col("rows_under_k"), col("classes_under_l"),
        col("rows_under_l"), col("min_class"),
        (col("rows_under_k").cast("double") /
          col("n_rows").cast("double")).as("k_risk_share"))
  }

  private val q345Sql =
    """WITH qi AS (
      |  SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
      |    CAST(floor(CAST(c.c_acctbal AS DOUBLE) / 2000.0) AS BIGINT)
      |      AS bal_band,
      |    o.o_orderpriority AS sensitive
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
      |cls AS (
      |  SELECT nation, seg, bal_band, count(*) AS class_size,
      |    CAST(count(DISTINCT sensitive) AS BIGINT) AS l_div
      |  FROM qi GROUP BY 1, 2, 3)
      |SELECT count(*) AS n_classes,
      |  CAST(sum(class_size) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS classes_under_k,
      |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
      |    AS BIGINT) AS rows_under_k,
      |  CAST(sum(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS classes_under_l,
      |  CAST(sum(CASE WHEN l_div < 2 THEN class_size ELSE 0 END)
      |    AS BIGINT) AS rows_under_l,
      |  min(class_size) AS min_class,
      |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(CAST(sum(class_size) AS BIGINT) AS DOUBLE)
      |    AS k_risk_share
      |FROM cls""".stripMargin

  // -------------------------------------------------------------- q347
  /** Quantile mapping (distribution matching / score calibration):
    * every distinct click-value is mapped onto the purchase-value
    * distribution by rank — k = ⌈cum_B·n_A/n_B⌉ in exact integer
    * arithmetic, then the A value whose cumulative interval
    * [cum−cnt+1, cum] contains k, found with the binned interval
    * join (IntervalJoin.overlapJoin — each k hits exactly one
    * interval; never a theta-join nested loop). Both ECDFs are the
    * audited two-pass distributed scheme; the mapping is pure
    * selection — bit-exact end to end. */
  private def q347QuantileMap(s: SparkSession, dir: String): DataFrame = {
    def cents: Column = (col("value").cast("decimal(18,2)") * 100)
      .cast("long")
    val ev = Tables.load(s, dir, "events")
    val a = ev.filter(col("event_type") === "purchase")
      .select(cents.as("av"))
    val b = ev.filter(col("event_type") === "click")
      .select(cents.as("bv"))
    val ecdfA = Quantiles.ecdf(a, "av")
      .select(col("value").as("a_value"),
        (col("cum") - col("cnt") + 1L).as("lo"), col("cum").as("hi"))
      .localCheckpoint(true)
    val nA = a.count()
    val nB = b.count()
    val pts = Quantiles.ecdf(b, "bv")
      .select(col("value").as("b_value"), col("cum").as("cum_b"))
      .withColumn("k", (col("cum_b") * nA + lit(nB - 1)) / lit(nB))
      .withColumn("k", floor(col("k").cast("double")).cast("long"))
      .withColumn("k2", col("k"))
      .localCheckpoint(true)
    graft.operators.IntervalJoin.overlapJoin(
        ecdfA, "lo", "hi", pts, "k", "k2",
        binWidth = math.max(1L, nA / 32L))
      .select(col("b_value"), col("cum_b"), col("k"),
        col("a_value").as("mapped"))
      .orderBy(col("b_value"))
  }

  private val q347Sql =
    """WITH a AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    AS av
      |  FROM events WHERE event_type = 'purchase'),
      |b AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    AS bv
      |  FROM events WHERE event_type = 'click'),
      |na AS (SELECT count(*) AS na FROM a),
      |nb AS (SELECT count(*) AS nb FROM b),
      |ea AS (
      |  SELECT av AS a_value,
      |    CAST(sum(cnt) OVER (ORDER BY av) AS BIGINT) AS hi,
      |    CAST(sum(cnt) OVER (ORDER BY av) - cnt + 1 AS BIGINT) AS lo
      |  FROM (SELECT av, count(*) AS cnt FROM a GROUP BY 1)),
      |eb AS (
      |  SELECT bv AS b_value,
      |    CAST(sum(cnt) OVER (ORDER BY bv) AS BIGINT) AS cum_b
      |  FROM (SELECT bv, count(*) AS cnt FROM b GROUP BY 1)),
      |pts AS (
      |  SELECT b_value, cum_b,
      |    (cum_b * na + (nb - 1)) // nb AS k
      |  FROM eb CROSS JOIN na CROSS JOIN nb)
      |SELECT p.b_value, p.cum_b, CAST(p.k AS BIGINT) AS k,
      |  ea.a_value AS mapped
      |FROM pts p JOIN ea ON p.k BETWEEN ea.lo AND ea.hi
      |ORDER BY p.b_value""".stripMargin

  // -------------------------------------------------------------- q348
  /** Entity golden records — the q123 clustering composed with
    * field-level survivorship: per resolved entity, the golden member
    * is the highest-balance one (ties to the smallest key, decided by
    * an integer (bal, −key) struct max), carrying its name and
    * segment, beside the membership census. The consolidation step an
    * MDM pipeline runs right after resolution; composition bugs
    * between the two stages are exactly what the isolated rows can't
    * see. */
  private def q348EntityGolden(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val g = ((col("c_custkey") - col("c_custkey") % 10) / 10).cast("long")
    val rows = cust.select(col("c_custkey"),
      concat(lit("E"), g.cast("string"), lit("."), g.cast("string"),
        when(col("c_custkey") % 2 === 0, lit("")).otherwise(lit("x")))
        .as("ent_name"))
    val assigned = graft.operators.EntityResolution.resolve(rows,
      "c_custkey", "ent_name", maxDist = 1)
    val enriched = assigned.join(cust.select(col("c_custkey"),
        col("c_mktsegment").as("seg"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .as("bal")), Seq("c_custkey"))
    enriched.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("bal").as("b"), (-col("c_custkey")).as("nk"),
          col("ent_name").as("nm"), col("seg").as("sg"))).as("__g"))
      .select(col("entity_id"), col("n_members"),
        (-col("__g.nk")).as("golden_key"),
        col("__g.nm").as("golden_name"),
        col("__g.sg").as("golden_seg"),
        col("__g.b").as("golden_bal_cents"))
      .orderBy(col("entity_id"))
  }

  private val q348Sql =
    s"""WITH RECURSIVE $entityAssignedCtes,
       |enriched AS (
       |  SELECT a.entity_id, a.c_custkey, a.ent_name,
       |    cu.c_mktsegment AS seg,
       |    CAST(CAST(cu.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS bal
       |  FROM assigned a JOIN customer cu
       |    ON cu.c_custkey = a.c_custkey),
       |mx AS (SELECT entity_id, max(bal) AS mb FROM enriched
       |       GROUP BY 1),
       |gk AS (
       |  SELECT e.entity_id, min(e.c_custkey) AS golden_key
       |  FROM enriched e JOIN mx ON mx.entity_id = e.entity_id
       |    AND e.bal = mx.mb
       |  GROUP BY 1),
       |cen AS (SELECT entity_id, count(*) AS n_members FROM enriched
       |        GROUP BY 1)
       |SELECT cen.entity_id, cen.n_members, gk.golden_key,
       |  eg.ent_name AS golden_name, eg.seg AS golden_seg,
       |  eg.bal AS golden_bal_cents
       |FROM cen
       |JOIN gk ON gk.entity_id = cen.entity_id
       |JOIN enriched eg ON eg.c_custkey = gk.golden_key
       |ORDER BY cen.entity_id""".stripMargin

  // -------------------------------------------------------------- q349
  /** Time-to-convert distribution: per user, first 'view' → first
    * subsequent 'purchase' latency in whole seconds (exact µs floor
    * division), summarized as exact p25/p50/p75/p90 order statistics
    * through the distributed ECDF (selection — percentile_disc
    * semantics, rank = ⌈q·n⌉) plus the conversion rate. The funnel
    * question product teams actually ask ("how long does conversion
    * take?"), latency exact, no interpolation. */
  private def q349TimeToConvert(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("tv"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tp"))
      .join(firstView, Seq("user_id"))
      .filter(col("tp") >= col("tv"))
      .groupBy(col("user_id"), col("tv")).agg(min(col("tp")).as("tp"))
      .select(col("user_id"),
        floor((col("tp") - col("tv")).cast("double") / 1e6)
          .cast("long").as("lat_s"))
      .localCheckpoint(true)
    val nConv = conv.count()
    val nViewers = firstView.count()
    val e = Quantiles.ecdf(conv.select(col("lat_s")), "lat_s")
      .localCheckpoint(true)
    def pct(q: Int): Column = {
      // rank = ceil(q/100 * n) in exact integers
      val k = (q * nConv + 99L) / 100L
      min(when(col("cum") >= k, col("value"))).as(s"p$q")
    }
    e.agg(pct(25), pct(50), pct(75), pct(90))
      .select(lit(nViewers).as("n_viewers"), lit(nConv).as("n_converted"),
        (lit(nConv).cast("double") / lit(nViewers).cast("double"))
          .as("conversion_rate"),
        col("p25"), col("p50"), col("p75"), col("p90"))
  }

  private val q349Sql =
    """WITH fv AS (
      |  SELECT user_id, min(epoch_us(ts)) AS tv
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |conv AS (
      |  SELECT e.user_id,
      |    CAST(floor(CAST(min(epoch_us(e.ts)) - fv.tv AS DOUBLE)
      |      / 1000000.0) AS BIGINT) AS lat_s
      |  FROM events e JOIN fv ON fv.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.tv
      |  GROUP BY 1, fv.tv),
      |n AS (SELECT count(*) AS nc FROM conv),
      |nv AS (SELECT count(*) AS nviews FROM fv),
      |cume AS (
      |  SELECT lat_s AS value, sum(cnt) OVER (ORDER BY lat_s) AS cum
      |  FROM (SELECT lat_s, count(*) AS cnt FROM conv GROUP BY 1))
      |SELECT nv.nviews AS n_viewers, n.nc AS n_converted,
      |  CAST(n.nc AS DOUBLE) / CAST(nv.nviews AS DOUBLE)
      |    AS conversion_rate,
      |  min(CASE WHEN cum >= (25 * n.nc + 99) // 100 THEN value END)
      |    AS p25,
      |  min(CASE WHEN cum >= (50 * n.nc + 99) // 100 THEN value END)
      |    AS p50,
      |  min(CASE WHEN cum >= (75 * n.nc + 99) // 100 THEN value END)
      |    AS p75,
      |  min(CASE WHEN cum >= (90 * n.nc + 99) // 100 THEN value END)
      |    AS p90
      |FROM cume CROSS JOIN n CROSS JOIN nv
      |GROUP BY 1, 2, 3""".stripMargin

  // -------------------------------------------------------------- q351
  /** Churn-definition sensitivity census: per inactivity horizon
    * (3/7/14 days before the corpus end), how many users count as
    * churned and what engagement mass they carry — the definition
    * audit run before anyone ships a "churn rate", showing how the
    * number moves with the arbitrary horizon. Last-activity age in
    * exact whole days (µs floor division) against the fixed corpus
    * end instant. */
  private def q351ChurnHorizons(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val endMicros = 1706659200000000L // 2024-01-31 00:00:00 UTC
    val users = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_t"),
        count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
      .withColumn("age_days",
        floor((lit(endMicros) - col("last_t")).cast("double") /
          86400000000.0).cast("long"))
      .localCheckpoint(true)
    val horizons = Seq(3L, 7L, 14L).toDF("horizon")
    users.crossJoin(broadcast(horizons))
      .groupBy(col("horizon"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("age_days") >= col("horizon"), 1L).otherwise(0L))
          .as("n_churned"),
        sum(when(col("age_days") >= col("horizon"), col("cents"))
          .otherwise(0L)).as("churned_cents"))
      .select(col("horizon"), col("n_users"), col("n_churned"),
        col("churned_cents"),
        (col("n_churned").cast("double") / col("n_users").cast("double"))
          .as("churn_rate"))
      .orderBy(col("horizon"))
  }

  private val q351Sql =
    """WITH u AS (
      |  SELECT user_id, max(epoch_us(ts)) AS last_t,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT *,
      |    CAST(floor(CAST(1706659200000000 - last_t AS DOUBLE)
      |      / 86400000000.0) AS BIGINT) AS age_days
      |  FROM u),
      |h(horizon) AS (VALUES (CAST(3 AS BIGINT)), (7), (14))
      |SELECT h.horizon, count(*) AS n_users,
      |  CAST(sum(CASE WHEN age_days >= h.horizon THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_churned,
      |  CAST(sum(CASE WHEN age_days >= h.horizon THEN cents ELSE 0 END)
      |    AS BIGINT) AS churned_cents,
      |  CAST(sum(CASE WHEN age_days >= h.horizon THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS churn_rate
      |FROM a CROSS JOIN h GROUP BY 1 ORDER BY h.horizon""".stripMargin

  // -------------------------------------------------------------- q353
  /** Interval-union coverage (SLA / presence measure): each event
    * opens a 30-minute presence interval (clipped to its day); per
    * day, the UNION length of all intervals in exact µs and the
    * number of coverage gaps — the q341 ±1 sweep extended with a
    * per-day lead: covered time = Σ (t_next − t) over sweep segments
    * where the running open-count > 0; a gap starts whenever the
    * count returns to 0 before the day ends. All-integer; windows
    * per-day partitioned. */
  private def q353CoverageGaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
      .select(unix_micros(col("ts")).as("t0"))
      .withColumn("day", floor(col("t0").cast("double") /
        (86400.0 * 1e6)).cast("long"))
      .withColumn("t1", least(col("t0") + 1800000000L,
        (col("day") + 1L) * 86400000000L))
    val deltas = ev.select(col("day"), col("t0").as("t"), lit(1L).as("d"))
      .unionAll(ev.select(col("day"), col("t1").as("t"),
        lit(-1L).as("d")))
      .groupBy(col("day"), col("t")).agg(sum(col("d")).as("d"))
    val w = Window.partitionBy(col("day")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.partitionBy(col("day")).orderBy(col("t"))
    val seg = deltas
      .withColumn("open", sum(col("d")).over(w))
      .withColumn("t_next", lead(col("t"), 1).over(wl))
      .filter(col("t_next").isNotNull)
    seg.groupBy(col("day"))
      .agg(sum(when(col("open") > 0L, col("t_next") - col("t"))
          .otherwise(0L)).as("covered_us"),
        sum(when(col("open") === 0L, 1L).otherwise(0L)).as("n_gaps"),
        sum(when(col("open") === 0L, col("t_next") - col("t"))
          .otherwise(0L)).as("gap_us"))
      .select(col("day"), col("covered_us"), col("n_gaps"),
        col("gap_us"),
        (col("covered_us").cast("double") /
          (col("covered_us") + col("gap_us")).cast("double"))
          .as("coverage_share"))
      .orderBy(col("day"))
  }

  private val q353Sql =
    """WITH ev AS (
      |  SELECT epoch_us(ts) AS t0,
      |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / (86400.0 * 1e6))
      |      AS BIGINT) AS day
      |  FROM events),
      |iv AS (
      |  SELECT day, t0,
      |    least(t0 + 1800000000, (day + 1) * 86400000000) AS t1
      |  FROM ev),
      |deltas AS (
      |  SELECT day, t, CAST(sum(d) AS BIGINT) AS d FROM (
      |    SELECT day, t0 AS t, 1 AS d FROM iv
      |    UNION ALL SELECT day, t1, -1 FROM iv)
      |  GROUP BY 1, 2),
      |seg AS (
      |  SELECT day, t,
      |    CAST(sum(d) OVER (PARTITION BY day ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open,
      |    lead(t) OVER (PARTITION BY day ORDER BY t) AS t_next
      |  FROM deltas)
      |SELECT day,
      |  CAST(sum(CASE WHEN open > 0 THEN t_next - t ELSE 0 END)
      |    AS BIGINT) AS covered_us,
      |  CAST(sum(CASE WHEN open = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_gaps,
      |  CAST(sum(CASE WHEN open = 0 THEN t_next - t ELSE 0 END)
      |    AS BIGINT) AS gap_us,
      |  CAST(sum(CASE WHEN open > 0 THEN t_next - t ELSE 0 END)
      |      AS DOUBLE)
      |    / CAST(sum(CASE WHEN open > 0 THEN t_next - t ELSE 0 END)
      |      + sum(CASE WHEN open = 0 THEN t_next - t ELSE 0 END)
      |      AS DOUBLE) AS coverage_share
      |FROM seg WHERE t_next IS NOT NULL
      |GROUP BY 1 ORDER BY day""".stripMargin

  // -------------------------------------------------------------- q356
  /** Per-group trend significance: daily exact-cents totals regressed
    * on the day index with OLS slope AND its t-statistic, both
    * derived from one set of exact BIGINT moments (n, Σx, Σy, Σxx,
    * Σxy, Σyy) — SE² = (Syy_c − b·Sxy_c)/((n−2)·Sxx_c) with centered
    * moments as pinned double expressions and one sqrt; the "is this
    * metric actually trending?" answer with the q126
    * accumulation-order hazard engineered out. */
  private def q356TrendTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        floor(unix_micros(col("ts")).cast("double") / (86400.0 * 1e6))
          .cast("long").as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("y"))
    val m = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
        sum(col("y")).as("sy"), sum(col("day") * col("day")).as("sxx"),
        sum(col("day") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: String): Column = col(c).cast("double")
    m.select(col("event_type"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("sxy"), col("syy"),
        (d("n") * d("sxx") - d("sx") * d("sx")).as("sxx_c"),
        (d("n") * d("sxy") - d("sx") * d("sy")).as("sxy_c"),
        (d("n") * d("syy") - d("sy") * d("sy")).as("syy_c"))
      .withColumn("slope", col("sxy_c") / col("sxx_c"))
      .withColumn("t_stat",
        when(col("n") > 2L && col("sxx_c") > 0.0,
          col("slope") / sqrt(
            (col("syy_c") - col("slope") * col("sxy_c")) /
              ((col("n").cast("double") - 2.0) * col("sxx_c")))))
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("sxy"), col("syy"), col("slope"),
        col("t_stat"))
      .orderBy(col("event_type"))
  }

  private val q356Sql =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / (86400.0 * 1e6))
      |      AS BIGINT) AS day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(day) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(day * day) AS BIGINT) AS sxx,
      |    CAST(sum(day * y) AS BIGINT) AS sxy,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM daily GROUP BY 1),
      |c AS (
      |  SELECT *,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS sxx_c,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS sxy_c,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syy_c
      |  FROM m),
      |sl AS (SELECT *, sxy_c / sxx_c AS slope FROM c)
      |SELECT event_type, n, sx, sy, sxx, sxy, syy, slope,
      |  CASE WHEN n > 2 AND sxx_c > 0.0 THEN
      |    slope / sqrt((syy_c - slope * sxy_c)
      |      / ((CAST(n AS DOUBLE) - 2.0) * sxx_c)) END AS t_stat
      |FROM sl ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- q360
  /** Look-alike audience expansion with EXACT integer geometry: the
    * seed cohort is every user with more purchases than errors (a
    * scale-free engagement rule); its engagement centroid is
    * kept as the exact integer sum vector (n_s, Σ counts per event
    * type), and each non-seed user is scored by the cross-multiplied
    * squared distance ‖n_s·p_u − Σ_seed‖² — integer, so the top-20
    * ranking has no float ties. The marketing expansion primitive
    * with the centroid never materialized as floats. */
  private def q360Lookalike(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "signup", "error", "purchase")
    val profCols = types.map(t => sum(when(col("event_type") === t, 1L)
      .otherwise(0L)).as(s"c_$t"))
    val prof = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(profCols.head, profCols.tail: _*)
      .localCheckpoint(true)
    val seeds = prof.filter(col("c_purchase") > col("c_error"))
    val centCols = Seq(count(lit(1)).as("ns")) ++
      types.map(t => sum(col(s"c_$t")).as(s"s_$t"))
    val cent = seeds.agg(centCols.head, centCols.tail: _*)
    val scored = prof.filter(col("c_purchase") <= col("c_error"))
      .crossJoin(broadcast(cent))
      .withColumn("d2", types.map { t =>
        val d = col("ns") * col(s"c_$t") - col(s"s_$t")
        d * d
      }.reduce((a, b) => a + b))
    scored.orderBy(col("d2"), col("user_id")).limit(20)
      .select((Seq(col("user_id"), col("d2")) ++
        types.map(t => col(s"c_$t"))): _*)
      .orderBy(col("d2"), col("user_id"))
  }

  private val q360Sql =
    """WITH prof AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_click,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_view,
      |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_signup,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_error,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c_purchase
      |  FROM events GROUP BY 1),
      |cent AS (
      |  SELECT count(*) AS ns,
      |    CAST(sum(c_click) AS BIGINT) AS s_click,
      |    CAST(sum(c_view) AS BIGINT) AS s_view,
      |    CAST(sum(c_signup) AS BIGINT) AS s_signup,
      |    CAST(sum(c_error) AS BIGINT) AS s_error,
      |    CAST(sum(c_purchase) AS BIGINT) AS s_purchase
      |  FROM prof WHERE c_purchase > c_error)
      |SELECT p.user_id,
      |  (ns * c_click - s_click) * (ns * c_click - s_click)
      |  + (ns * c_view - s_view) * (ns * c_view - s_view)
      |  + (ns * c_signup - s_signup) * (ns * c_signup - s_signup)
      |  + (ns * c_error - s_error) * (ns * c_error - s_error)
      |  + (ns * c_purchase - s_purchase)
      |    * (ns * c_purchase - s_purchase) AS d2,
      |  c_click, c_view, c_signup, c_error, c_purchase
      |FROM prof p CROSS JOIN cent
      |WHERE c_purchase <= c_error
      |ORDER BY d2, user_id LIMIT 20""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q360_lookalike" -> (q360Lookalike _),
    "q356_trend_test" -> (q356TrendTest _),
    "q353_coverage_gaps" -> (q353CoverageGaps _),
    "q351_churn_horizons" -> (q351ChurnHorizons _),
    "q349_time_to_convert" -> (q349TimeToConvert _),
    "q348_entity_golden" -> (q348EntityGolden _),
    "q347_quantile_map" -> (q347QuantileMap _),
    "q345_k_anonymity" -> (q345KAnonymity _),
    "q340_ltv_cohorts" -> (q340LtvCohorts _),
    "q341_concurrency" -> (q341Concurrency _),
    "q339_conformance" -> (q339Conformance _),
    "q338_growth_chain" -> (q338GrowthChain _),
    "q336_ransac" -> (q336Ransac _),
    "q335_conformal" -> (q335Conformal _),
    "q333_grid_cv" -> (q333GridCv _),
    "q334_kendall_tau" -> (q334KendallTau _),
    "q329_wilson" -> (q329Wilson _),
    "q330_youden" -> (q330Youden _),
    "q327_twap" -> (q327Twap _),
    "q326_brier" -> (q326Brier _),
    "q325_map_at_k" -> (q325MapAtK _),
    "q321_katz" -> (q321Katz _),
    "q320_drift_l1" -> (q320DriftL1 _),
    "q317_ams_join_size" -> (q317AmsJoinSize _),
    "q318_closeness" -> (q318Closeness _),
    "q315_cuped" -> (q315Cuped _),
    "q312_wl_colors" -> (q312WlColors _),
    "q313_resource_alloc" -> (q313ResourceAlloc _),
    "q306_ams_f2" -> (q306AmsF2 _),
    "q307_bootstrap_ci" -> (q307BootstrapCi _),
    "q308_ols2" -> (q308Ols2 _),
    "q303_pass_at_k" -> (q303PassAtK _),
    "q364_ndcg_at_k" -> (q364NdcgAtK _),
    "q365_mrr_at_k" -> (q365MrrAtK _),
    "q372_kaplan_meier" -> (q372KaplanMeier _),
    "q378_bleu" -> (q378Bleu _),
    "q379_rouge" -> (q379Rouge _),
    "q382_token_f1" -> (q382TokenF1 _),
    "q384_chrf" -> (q384Chrf _),
    "q391_rouge_l" -> (q391RougeL _),
    "q386_distinct_n" -> (q386DistinctN _),
    "q387_ece" -> (q387Ece _),
    "q304_ab_ztest" -> (q304AbTest _),
    "q301_decayed_sum" -> (q301DecayedSum _),
    "q300_hilbert_range" -> (q300HilbertRange _),
    "q298_dyad_census" -> (q298DyadCensus _),
    "q299_rich_club" -> (q299RichClub _),
    "q285_trimmed_mean" -> (q285TrimmedMean _),
    "q288_interpolate" -> (q288Interpolate _),
    "q282_modularity" -> (q282Modularity _),
    "q284_grid_dbscan" -> (q284GridDbscan _),
    "q274_scc" -> (q274Scc _),
    "q271_hits" -> (q271Hits _),
    "q204_roc_auc" -> (q204RocAuc _),
    "q215_isotonic" -> (q215Isotonic _),
    "q216_gains_chart" -> (q216Gains _),
    "q217_concentration" -> (q217Concentration _),
    "q218_burstiness" -> (q218Burstiness _),
    "q220_seasonal_index" -> (q220Seasonal _),
    "q221_autocorr" -> (q221Autocorr _),
    "q223_neighborhood_jaccard" -> (q223NeighborhoodJaccard _),
    "q227_auc_by_group" -> (q227AucByGroup _),
    "q228_ks_test" -> (q228KsTest _),
    "q233_spearman" -> (q233Spearman _),
    "q238_attribution" -> (q238Attribution _),
    "q241_rfm" -> (q241Rfm _),
    "q242_benford" -> (q242Benford _),
    "q243_kaplan_meier" -> (q243KaplanMeier _),
    "q245_changepoint" -> (q245Changepoint _),
    "q254_calibration" -> (q254Calibration _),
    "q255_gaps_islands" -> (q255GapsIslands _),
    "q256_event_trigrams" -> (q256EventTrigrams _),
    "q257_abc_analysis" -> (q257AbcAnalysis _),
    "q261_hopping_windows" -> (q261HoppingWindows _),
    "q262_token_bucket" -> (q262TokenBucket _),
    "q263_anova" -> (q263Anova _),
    "q264_cohens_kappa" -> (q264CohensKappa _),
    "q265_gini_split" -> (q265GiniSplit _),
    "q234_assortativity" -> (q234Assortativity _),
    "q235_mann_kendall" -> (q235MannKendall _),
    "q236_theil_sen" -> (q236TheilSen _),
    "q205_markov" -> (q205Markov _),
    "q206_chi2" -> (q206Chi2 _),
    "q207_cusum" -> (q207Cusum _),
    "q208_distinct_so_far" -> (q208DistinctSoFar _),
    "q209_welch_ttest" -> (q209Welch _),
    "q210_gini" -> (q210Gini _),
    "q199_weighted_pctile" -> (q199WeightedPctile _),
    "q202_holt" -> (q202Holt _),
    "q203_feature_encoding" -> (q203Encoding _),
    "q200_common_neighbors" -> (q200CommonNeighbors _),
    "q201_equi_depth" -> (q201EquiDepth _),
    "q191_skyline" -> (q191Skyline _),
    "q189_outlier_fences" -> (q189OutlierFences _),
    "q147_kcore" -> (q147Kcore _),
    "q100_label_prop" -> (q100Lpa _),
    "q97_pit_join" -> (q97Pit _),
    "q88_pagerank" -> (q88Pagerank _),
    "q92_gap_fill" -> (q92GapFill _),
    "q87_mad_outliers" -> (q87Mad _),
    "q86_bfs" -> (q86Bfs _),
    "q116_sssp" -> (q116Sssp _),
    "q120_ewma" -> (q120Ewma _),
    "q123_entity_resolution" -> (q123Entities _),
    "q85_interval_join" -> (q85Interval _),
    "q68_bloom_semijoin" -> (q68Bloom _),
    "q69_percentiles" -> (q69Percentiles _),
    "q104_sample_quantiles" -> (q104SampleQuantiles _),
    "q70_sessionize" -> (q70Sessions _),
    "q71_funnel" -> (q71Funnel _),
    "q72_retention" -> (q72Retention _),
    "q73_stratified_sample" -> (q73Stratified _),
    "q74_fuzzy_join" -> (q74Fuzzy _),
    "q75_zorder" -> (q75Zorder _),
    "q76_point_in_polygon" -> (q76Pip _),
    "q77_winsorize" -> (q77Winsorize _),
    "q78_triangles" -> (q78Triangles _),
    "q167_clustering_coef" -> (q167Clustering _),
    "q174_hilbert" -> (q174Hilbert _),
    "q180_personalized_pr" -> (q180PersonalizedPr _),
    "q168_ewma" -> (q168Ewma _),
    "q79_trailing_window" -> (q79Trailing _),
    "q80_scd2" -> (q80Scd2 _),
    "q81_grouped_percentiles" -> (q81Grouped _),
    "q82_url_normalize" -> (q82Urls _),
  )

  val oracles: Map[String, String] = Map(
    "q360_lookalike" -> q360Sql,
    "q356_trend_test" -> q356Sql,
    "q353_coverage_gaps" -> q353Sql,
    "q351_churn_horizons" -> q351Sql,
    "q349_time_to_convert" -> q349Sql,
    "q348_entity_golden" -> q348Sql,
    "q347_quantile_map" -> q347Sql,
    "q345_k_anonymity" -> q345Sql,
    "q340_ltv_cohorts" -> q340Sql,
    "q341_concurrency" -> q341Sql,
    "q339_conformance" -> q339Sql,
    "q338_growth_chain" -> q338Sql,
    "q336_ransac" -> q336Sql,
    "q335_conformal" -> q335Sql,
    "q333_grid_cv" -> q333Sql,
    "q334_kendall_tau" -> q334Sql,
    "q329_wilson" -> q329Sql,
    "q330_youden" -> q330Sql,
    "q327_twap" -> q327Sql,
    "q326_brier" -> q326Sql,
    "q325_map_at_k" -> q325Sql,
    "q321_katz" -> q321Sql,
    "q320_drift_l1" -> q320Sql,
    "q317_ams_join_size" -> q317Sql,
    "q318_closeness" -> q318Sql,
    "q315_cuped" -> q315Sql,
    "q312_wl_colors" -> q312Sql,
    "q313_resource_alloc" -> q313Sql,
    "q306_ams_f2" -> q306Sql,
    "q307_bootstrap_ci" -> q307Sql,
    "q308_ols2" -> q308Sql,
    "q303_pass_at_k" -> q303Sql,
    "q364_ndcg_at_k" -> q364Sql,
    "q365_mrr_at_k" -> q365Sql,
    "q372_kaplan_meier" -> q372Sql,
    "q378_bleu" -> q378Sql,
    "q379_rouge" -> q379Sql,
    "q382_token_f1" -> q382Sql,
    "q384_chrf" -> q384Sql,
    "q391_rouge_l" -> q391Sql,
    "q386_distinct_n" -> q386Sql,
    "q387_ece" -> q387Sql,
    "q304_ab_ztest" -> q304Sql,
    "q301_decayed_sum" -> q301Sql,
    "q300_hilbert_range" -> q300Sql,
    "q298_dyad_census" -> q298Sql,
    "q299_rich_club" -> q299Sql,
    "q285_trimmed_mean" -> q285Sql,
    "q288_interpolate" -> q288Sql,
    "q282_modularity" -> q282Sql,
    "q284_grid_dbscan" -> q284Sql,
    "q274_scc" -> q274Sql,
    "q271_hits" -> q271Sql,
    "q204_roc_auc" -> q204Sql,
    "q215_isotonic" -> q215Sql,
    "q216_gains_chart" -> q216Sql,
    "q217_concentration" -> q217Sql,
    "q218_burstiness" -> q218Sql,
    "q220_seasonal_index" -> q220Sql,
    "q221_autocorr" -> q221Sql,
    "q223_neighborhood_jaccard" -> q223Sql,
    "q227_auc_by_group" -> q227Sql,
    "q228_ks_test" -> q228Sql,
    "q233_spearman" -> q233Sql,
    "q238_attribution" -> q238Sql,
    "q241_rfm" -> q241Sql,
    "q242_benford" -> q242Sql,
    "q243_kaplan_meier" -> q243Sql,
    "q245_changepoint" -> q245Sql,
    "q254_calibration" -> q254Sql,
    "q255_gaps_islands" -> q255Sql,
    "q256_event_trigrams" -> q256Sql,
    "q257_abc_analysis" -> q257Sql,
    "q261_hopping_windows" -> q261Sql,
    "q262_token_bucket" -> q262Sql,
    "q263_anova" -> q263Sql,
    "q264_cohens_kappa" -> q264Sql,
    "q265_gini_split" -> q265Sql,
    "q234_assortativity" -> q234Sql,
    "q235_mann_kendall" -> q235Sql,
    "q236_theil_sen" -> q236Sql,
    "q205_markov" -> q205Sql,
    "q206_chi2" -> q206Sql,
    "q207_cusum" -> q207Sql,
    "q208_distinct_so_far" -> q208Sql,
    "q209_welch_ttest" -> q209Sql,
    "q210_gini" -> q210Sql,
    "q199_weighted_pctile" -> q199Sql,
    "q202_holt" -> q202Sql,
    "q203_feature_encoding" -> q203Sql,
    "q200_common_neighbors" -> q200Sql,
    "q201_equi_depth" -> q201Sql,
    "q191_skyline" -> q191Sql,
    "q189_outlier_fences" -> q189Sql,
    "q147_kcore" -> q147Sql,
    "q100_label_prop" -> q100Sql,
    "q97_pit_join" -> q97Sql,
    "q88_pagerank" -> q88Sql,
    "q92_gap_fill" -> q92Sql,
    "q87_mad_outliers" -> q87Sql,
    "q86_bfs" -> q86Sql,
    "q116_sssp" -> q116Sql,
    "q120_ewma" -> q120Sql,
    "q123_entity_resolution" -> q123Sql,
    "q85_interval_join" -> q85Sql,
    "q68_bloom_semijoin" -> q68Sql,
    "q69_percentiles" -> q69Sql,
    "q104_sample_quantiles" -> q104Sql,
    "q70_sessionize" -> q70Sql,
    "q71_funnel" -> q71Sql,
    "q72_retention" -> q72Sql,
    "q73_stratified_sample" -> q73Sql,
    "q74_fuzzy_join" -> q74Sql,
    "q75_zorder" -> q75Sql,
    "q76_point_in_polygon" -> q76Sql,
    "q77_winsorize" -> q77Sql,
    "q78_triangles" -> q78Sql,
    "q167_clustering_coef" -> q167Sql,
    "q174_hilbert" -> q174Sql,
    "q180_personalized_pr" -> q180Sql,
    "q168_ewma" -> q168Sql,
    "q79_trailing_window" -> q79Sql,
    "q80_scd2" -> q80Sql,
    "q81_grouped_percentiles" -> q81Sql,
    "q82_url_normalize" -> q82Sql,
  )
}
