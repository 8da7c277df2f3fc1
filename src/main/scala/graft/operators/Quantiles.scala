package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact distributed quantiles (percentile_disc semantics): for each
  * requested fraction q, the value at rank ceil(q·n) (1-clamped) in the
  * sorted multiset — the SQL-standard discrete percentile, computed
  * without ever sorting the full table globally.
  *
  * Scale design (100 TB): the only full-data pass is a hash aggregation
  * to (value, count) — the shuffle carries one row per DISTINCT value,
  * not per row. The distinct-value table is then range-partitioned by
  * value and the cumulative counts come from the same two-pass
  * distributed prefix sum as Packing/RowNumbers (a numPartitions-row
  * totals pass + per-partition windows) — never a single-partition
  * window. Rank lookup is a broadcast join of the (q, rank) pairs
  * against the cumulative table: value v answers q iff
  * cum(v) − count(v) < rank(q) <= cum(v).
  *
  * Versus approx_percentile: that is the right call when an error bound
  * is acceptable; this operator is for the exact-answer case (medians
  * for audits, SLA cutoffs) and costs one extra small shuffle of the
  * distinct values. Determinism: counts and ranks are integers; the
  * result is a value drawn FROM the input set — bit-stable across any
  * partitioning, and reproducible in the DuckDB oracle with the same
  * explicit ceil(q·n) arithmetic (no reliance on engine percentile
  * internals).
  */
object Quantiles {

  /** (q, rank, value) for each fraction in `qs` over `df(valueCol)`,
    * NULLs excluded (percentile semantics). `qs` must be in (0, 1]. */
  def exactPercentiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")
    val spark = df.sparkSession
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("value")).agg(count(lit(1)).as("c"))
    val base = counts
      .repartitionByRange(col("value"))
      .sortWithinPartitions(col("value"))
      .withColumn("__pid", spark_partition_id())
      // MEMORY_ONLY for the totals + window passes: evictable, and
      // eviction-safe — recompute of the range-partitioned sort
      // reproduces the same layout (the Packing/RowNumbers reasoning)
      .persist(StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid")).agg(sum(col("c")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = totals.map(_._2).sum
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(offsets).toIndexedSeq).toDF("__pid", "__off")
    // ceil in DOUBLE, mirrored verbatim by the oracle SQL: both
    // engines compute ceil(q * (double) n) with the same IEEE ops
    val ranks = qs.sorted.map(q =>
      Row(q, math.max(1L, math.ceil(q * n.toDouble).toLong)))
    val ranksDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ranks, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = Window.partitionBy(col("__pid")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.join(broadcast(offDf), Seq("__pid"))
      .withColumn("cum", sum(col("c")).over(w) + col("__off"))
    cum.join(broadcast(ranksDf),
        col("rank") > col("cum") - col("c") && col("rank") <= col("cum"))
      .select(col("q"), col("rank"), col("value"))
  }

  /** Per-group exact percentiles: (group, q, rank, value) for each
    * fraction, percentile_disc semantics within each group.
    *
    * Here the cumulative window is PARTITIONED BY the group (parallel
    * across groups; one group's DISTINCT values meet in one partition,
    * which is the correct grain and bounded by per-group cardinality,
    * not table size — the same reasoning as tokenBudgetSample). The
    * single-series variant above exists for the one case where that
    * grain would be the whole table. */
  def exactPercentilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("value"))
      .agg(count(lit(1)).as("c"))
    rankLookupByGroup(counts, groupCol, qs)
  }

  /** WEIGHTED discrete percentiles per group: the value at the
    * smallest cumulative weight reaching ceil(q·W) — e.g. the
    * token-weighted median document length, or the price below which
    * q of the shipped QUANTITY falls. Identical machinery to
    * [[exactPercentilesByGroup]] with the per-value count replaced by
    * the weight sum; exact as long as weights are integers (cents,
    * counts). */
  def weightedPercentilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, qs: Seq[Double]): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("value"))
      .agg(sum(col(weightCol)).as("c"))
    rankLookupByGroup(counts, groupCol, qs)
  }

  /** Shared rank lookup over a (group, value, c) mass table: rank =
    * max(1, ceil(q·Σc)); value v answers q iff the cumulative mass at
    * v first reaches the rank. */
  private def rankLookupByGroup(counts: DataFrame, groupCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")
    val spark = counts.sparkSession
    val totals = counts.groupBy(col(groupCol)).agg(sum(col("c")).as("n"))
    val qsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(qs.sorted.map(Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    // ceil(q * n) in DOUBLE, mirrored verbatim by the oracle SQL
    val ranks = totals.crossJoin(broadcast(qsDf))
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * col("n").cast("double"))))
      .select(col(groupCol), col("q"), col("rank"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    cum.join(ranks,
        cum(groupCol) === ranks(groupCol) &&
          col("rank") > col("cum") - col("c") && col("rank") <= col("cum"))
      .select(cum(groupCol), col("q"), col("rank"), col("value"))
  }

  /** Equi-depth bucket id per distinct value: (value, cnt, bucket)
    * with bucket = ⌈k·cum/n⌉ (ECDF quantile score — ties share a
    * bucket, so it stays exact AND distributed, unlike a global
    * ntile whose total sort is a single-partition exchange). Same
    * two-pass prefix as [[ecdf]]. */
  def valueBuckets(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val withCum = ecdf(df, valueCol)
    val n = math.max(1L, df.filter(col(valueCol).isNotNull).count())
    withCum
      // positive operands: div truncation == floor == ceil-rewrite
      .withColumn("bucket",
        expr(s"(cum * $k + ${n - 1}L) div ${n}L").cast("long"))
      .select(col("value"), col("cnt"), col("bucket"))
  }

  /** Equi-depth (equal-frequency) binning rollup of [[valueBuckets]]:
    * every row's value lands in bucket ceil(cum·k / n) ∈ [1, k] — the
    * rank-derived histogram that puts ~n/k rows in each bucket
    * regardless of skew (where equi-WIDTH histograms collapse under a
    * heavy tail). Integer arithmetic throughout ((cum·k + n − 1) div n
    * == ceil for positive ints), so bucket boundaries are engine-exact
    * — unlike ntile, whose splits depend on row order among
    * duplicates. Returns per bucket: row mass, distinct values, lo/hi
    * bounds. Same scale shape as [[ecdf]]. */
  def equiDepthBuckets(df: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    valueBuckets(df, valueCol, k)
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_values"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
  }

  /** Approximate per-group percentiles over a DETERMINISTIC bottom-k
    * hash sample — the bounded-state alternative when even the
    * one-row-per-distinct-value shuffle of [[exactPercentilesByGroup]]
    * is too big (100 TB of high-cardinality doubles). Per group, keep
    * the k rows whose md5(sampleKey) is smallest (a uniform
    * pseudo-random but REPRODUCIBLE sample — same rows on every run and
    * every partitioning, unlike rand()-based sampling), then run the
    * exact rank-lookup percentiles on the sample. Standard bottom-k
    * theory: the sample quantile's rank error is O(n/√k) — choose k
    * for the error budget, state stays k rows per group.
    *
    * The rank-≤-k filter is the TopKHeapRewrite shape (single
    * row_number, uniform ASC order, literal bound), so with the graft
    * extensions installed the sample is built by a bounded-heap
    * aggregate — at most k rows per group ever held, nothing sorted
    * beyond k — rather than a full per-group sort.
    *
    * `sampleKey` must be row-unique within a group (e.g. the row's
    * primary key rendered as a string); md5 of a unique key never
    * ties, so the sample is fully determined. */
  def sampleQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, sampleKey: Column, k: Int,
      qs: Seq[Double]): DataFrame = {
    require(k > 0, s"sample size k ($k) must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(sampleKey.cast("string").cast("binary")))
    val sample = df.filter(col(valueCol).isNotNull)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(groupCol), col(valueCol))
    exactPercentilesByGroup(sample, groupCol, valueCol, qs)
  }

  /** Winsorize: clamp `valueCol` to its [lo, hi] exact percentile
    * cutoffs (the robust-statistics outlier treatment). Adds
    * `<valueCol>_w` (clamped value) plus `__lo`/`__hi` cutoff columns;
    * the cutoffs are a one-row broadcast, so the clamp itself is
    * map-only over the full table. */
  def winsorize(df: DataFrame, valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo < hi, s"lo ($lo) must be < hi ($hi)")
    val cuts = exactPercentiles(df, valueCol, Seq(lo, hi))
      .agg(max(when(col("q") === lo, col("value"))).as("__lo"),
        max(when(col("q") === hi, col("value"))).as("__hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
  }

  /** Exact trimmed mean per group over INTEGER values (the cents
    * contract): drop the lowest and highest ⌊trim·n⌋ ranks, average
    * the middle — the robust location estimate between mean and
    * median. Mass-table scheme, same scale shape as
    * [[exactPercentilesByGroup]]: one (group, value) count aggregate
    * (shuffle = distinct values, never rows), a per-group prefix
    * window over distinct values, and per-value kept multiplicity
    * max(0, min(hi, cum) − max(lo, cum − c)) with lo = ⌊trim·n⌋,
    * hi = n − lo. Sum and count are exact integers; the mean is the
    * single float division.
    * @return (group, n, n_kept, kept_sum, trimmed_mean) */
  def trimmedMeanByGroup(df: DataFrame, groupCol: String,
      valueCol: String, trim: Double): DataFrame = {
    require(trim >= 0.0 && trim < 0.5, s"trim ($trim) must be in [0, 0.5)")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("value"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = counts.groupBy(col(groupCol)).agg(sum(col("c")).as("n"))
    counts.withColumn("cum", sum(col("c")).over(w))
      .join(totals, Seq(groupCol))
      .withColumn("lo",
        floor(lit(trim) * col("n").cast("double")).cast("long"))
      .withColumn("hi", col("n") - col("lo"))
      .withColumn("kept", greatest(lit(0L),
        least(col("hi"), col("cum")) -
          greatest(col("lo"), col("cum") - col("c"))))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("value")).as("kept_sum"))
      .withColumn("trimmed_mean",
        col("kept_sum").cast("double") / col("n_kept").cast("double"))
  }

  /** Robust per-group outlier census via the modified z-score
    * (Iglewicz & Hoaglin 1993): M = 0.6745 · (x − median) / MAD, where
    * MAD is the median absolute deviation; |M| > threshold flags an
    * outlier. Unlike mean/stddev rules, a contaminated tail cannot
    * drag the cutoffs — the estimator's breakdown point is 50%.
    * Degenerate groups (MAD = 0, i.e. a majority at one value) fall
    * back to flagging any nonzero deviation.
    *
    * Scale design: two exact-percentile passes (each shuffles one row
    * per DISTINCT value per group — never per row, see
    * [[exactPercentilesByGroup]]) plus a broadcast of the per-group
    * cutoffs; the census is one final hash aggregate. All float math
    * is per-row IEEE arithmetic on exact inputs, so the result is
    * bit-stable and oracle-reproducible.
    *
    * @return (group, n, median, mad, n_outliers)
    */
  def madOutlierCensus(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as("__x"))
    val med = exactPercentilesByGroup(rows, groupCol, "__x", Seq(0.5))
      .select(col(groupCol), col("value").as("__med"))
    val dev = rows.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col("__x") - col("__med")))
    val mad = exactPercentilesByGroup(dev, groupCol, "__dev", Seq(0.5))
      .select(col(groupCol), col("value").as("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("__out",
        when(col("__mad") === 0.0, col("__dev") > 0.0)
          .otherwise(lit(0.6745) * col("__dev") / col("__mad") > threshold))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("__med")).as("median"),
        max(col("__mad")).as("mad"),
        sum(when(col("__out"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Empirical CDF per distinct value: (value, cnt, cum, ecdf) with
    * ecdf = P(X ≤ value) — the quantile-normalization / rank-feature
    * transform (map a skewed feature to uniform [0,1] by its own
    * distribution). Same scale shape as [[exactPercentiles]]: one
    * distinct-value aggregate, then the two-pass distributed prefix
    * sum; ecdf is a single integer division, bit-stable anywhere. */
  def ecdf(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("value")).agg(count(lit(1)).as("cnt"))
    val base = counts.repartitionByRange(col("value"))
      .sortWithinPartitions(col("value"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid")).agg(sum(col("cnt")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = totals.map(_._2).sum
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(offsets).toIndexedSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("__pid"))
      .withColumn("cum", sum(col("cnt")).over(w) + col("__off"))
      .select(col("value"), col("cnt"), col("cum"),
        (col("cum").cast("double") / lit(n.toDouble)).as("ecdf"))
  }
}
