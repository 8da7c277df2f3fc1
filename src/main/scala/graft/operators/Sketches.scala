package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Sketch-based approximate aggregation (north-star extension): the
  * bounded-state summaries a 100 TB profiling pass runs instead of exact
  * aggregation — cardinality estimation (KMV bottom-k) and corpus-wide
  * heavy hitters (bounded-heap top-k over partial counts).
  *
  * Everything here is md5-derived and order-independent, so results are
  * bit-stable across partitionings AND reproducible in the DuckDB oracle
  * (same rule as the dedup sketches — no engine-specific hashing).
  */
object Sketches {

  /** Portable 60-bit hash: first 15 hex chars of md5 of the value's
    * string form, as a long uniform on [0, 2^60). Identical in DuckDB:
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Approximate COUNT(DISTINCT c) as a KMV sketch aggregate (see
    * KmvDistinctEstimate): k longs of state per group, ~1/sqrt(k-2)
    * relative error, deterministic for a given input set. Use in
    * `.agg(...)` like any aggregate column. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    ColumnBridge.column(
      graft.expressions.KmvDistinctEstimate(
        ColumnBridge.expression(md5Hash60(c)), k)
        .toAggregateExpression())

  /** Approximate COUNT(DISTINCT c) as a HyperLogLog sketch aggregate
    * (see HllDistinctEstimate): 2^p byte registers of state per group
    * (64 bytes at p = 6), ~1.04/sqrt(2^p) relative error, raw HLL
    * estimator (no range corrections — documented there), exactly
    * reproducible in the DuckDB oracle. Use in `.agg(...)`. */
  def hllDistinct(c: Column, p: Int = 6): Column =
    ColumnBridge.column(
      graft.expressions.HllDistinctEstimate(
        ColumnBridge.expression(md5Hash60(c)), p)
        .toAggregateExpression())

  /** Pairwise KMV set-operation estimates across groups — the
    * audience-overlap question ("how many doc ids do sources A and B
    * share?") answered from k-sized sketches instead of a
    * distinct-value join. For every group pair (g1 < g2):
    * est_union (bottom-k estimator over the merged sketch), n_common
    * (sketch-sample intersection count), jaccard_est = n_common / |U|,
    * est_intersection = jaccard_est · est_union — the standard KMV
    * overlap estimator (Beyer et al., SIGMOD'07). When the merged
    * sketch holds fewer than k values both sketches are complete sets
    * and every figure is EXACT.
    *
    * Scale: per-group state is the k smallest distinct md5 hashes
    * (bottom-k heap shape); the pair stage joins #groups² sketch ROWS
    * of k longs each — never the data. Deterministic for a given input
    * set (md5 order), so the DuckDB oracle reproduces it exactly. */
  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"kmv sketch size k ($k) must be >= 2")
    val h = df.select(col(groupCol).as("g"), md5Hash60(valueCol).as("hv"))
      .distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("hv"))
    val sk = h.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("g"))
      .agg(sort_array(collect_list(col("hv"))).as("sketch"))
    val a = sk.select(col("g").as("g1"), col("sketch").as("s1"))
    val b = sk.select(col("g").as("g2"), col("sketch").as("s2"))
    a.join(b, col("g1") < col("g2"))
      .withColumn("__u", slice(array_sort(array_union(col("s1"), col("s2"))),
        1, k))
      .withColumn("__nu", size(col("__u")))
      .withColumn("n_common",
        size(array_intersect(col("__u"),
          array_intersect(col("s1"), col("s2")))))
      .withColumn("est_union",
        when(col("__nu") < k, col("__nu").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            lit(KmvTwo60) / element_at(col("__u"), col("__nu"))
              .cast("double")))
      .withColumn("jaccard_est",
        col("n_common").cast("double") / col("__nu").cast("double"))
      .withColumn("est_intersection",
        col("jaccard_est") * col("est_union"))
      .select(col("g1"), col("g2"), col("n_common"), col("est_union"),
        col("est_intersection"), col("jaccard_est"))
  }

  /** 2^60 as double — the KMV hash-range constant (mirrors the oracle's
    * CAST(1152921504606846976 AS DOUBLE)). */
  private val KmvTwo60: Double = 1152921504606846976L.toDouble

  /** Corpus-wide top-k most frequent items: partial+final hash-aggregate
    * counts, then ONE bounded-heap top-k (CollectTopK) over the count
    * table — never a global sort. Ties break by item descending (the
    * struct ordering), deterministically. Output: (rank, <itemName>,
    * cnt) with rank 1 = most frequent.
    *
    * Scale: the count aggregation shuffles one row per distinct item
    * (map-side partial); the top-k keeps k items per partition map-side
    * and k survive the final merge. A row_number-window form would
    * sort-shuffle the whole distinct-item table. */
  def heavyHitters(items: DataFrame, item: Column, k: Int,
      itemName: String = "item"): DataFrame = {
    val counts = items.select(item.as("__item"))
      .groupBy(col("__item")).agg(count(lit(1)).as("cnt"))
    val packed = struct(col("cnt"), col("__item"))
    counts
      .agg(ColumnBridge.collectTopK(packed, k, reverse = false).as("__tk"))
      .select(posexplode(col("__tk")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.__item").as(itemName), col("col.cnt").as("cnt"))
  }

  /** AMS / tug-of-war second-frequency-moment sketch (Alon, Matias,
    * Szegedy STOC'96): F2 = Σ_i f_i² estimated as the median over
    * `rows` independent estimators S_r², where S_r = Σ_x sign_r(x)
    * and sign_r is a ±1 hash of ("r:" + x). Everything is EXACT
    * integer arithmetic — the signs are md5-derived (portable to the
    * DuckDB oracle), each S_r is a BIGINT sum, each estimator is a
    * BIGINT square, and the median over an odd `rows` count is pure
    * selection — so the result is bit-identical under any
    * partitioning or engine. The exact F2 rides along for the
    * relative-error audit.
    *
    * Scale: the sign contributions fan each row out `rows` ways
    * map-side, but the groupBy has only `rows` groups — partial
    * aggregation collapses everything before the shuffle, which
    * carries rows·partitions longs. The exact-F2 branch is the usual
    * one-row-per-distinct-key aggregate. At 100 TB the sketch branch
    * is the cheap one; the exact branch is what it replaces (here it
    * stays in-row as the audit).
    *
    * @param rows odd number of independent estimators (median taken)
    * @return one row: (f2_exact, f2_est, rel_err)
    */
  def amsF2(df: DataFrame, key: Column, rows: Int = 9): DataFrame = {
    require(rows > 0 && rows % 2 == 1, "rows must be odd and positive")
    val signed = df.select(posexplode(array((0 until rows).map { r =>
      when(md5Hash60(concat(lit(s"$r:"), key.cast("string"))) % 2 === 0,
        1L).otherwise(-1L)
    }: _*)).as(Seq("r", "sign")))
    val ests = signed.groupBy(col("r"))
      .agg(sum(col("sign")).as("s"))
      .select((col("s") * col("s")).as("s2"))
    // median of an odd count = the middle order statistic (selection)
    val med = ests.orderBy(col("s2")).limit(rows / 2 + 1)
      .orderBy(col("s2").desc).limit(1)
      .select(col("s2").as("f2_est"))
    val exact = df.groupBy(key.as("__k"))
      .agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    exact.crossJoin(med)
      .select(col("f2_exact"), col("f2_est"),
        (abs(col("f2_est") - col("f2_exact")).cast("double") /
          col("f2_exact").cast("double")).as("rel_err"))
  }

  /** AMS join-size estimation (Alon, Gibbons, Matias, Szegedy
    * PODS'99): |A ⋈ B| = Σ_k f_A(k)·f_B(k) estimated as the median
    * over `rows` of S_r(A)·S_r(B), where S_r(X) = Σ sign_r(key) over
    * X's rows — the SAME ±1 md5 sign streams as [[amsF2]], so the two
    * relations are sketched independently (each in one map pass) and
    * only 2·rows longs meet. Everything is exact BIGINT arithmetic
    * and the median over an odd `rows` is selection — bit-identical
    * cross-engine. The exact join size rides along for the error
    * audit (computed the scalable way: per-key count tables joined on
    * the key, never row×row).
    *
    * The 100 TB use: join-size forecasting before committing to a
    * shuffle strategy — two map passes over fact tables produce
    * constant-size sketches a planner can combine for ANY pair, where
    * the exact path costs a shuffle per pair.
    *
    * @return one row: (join_exact, join_est, abs_err) */
  def amsJoinSize(a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      rows: Int = 9): DataFrame = {
    require(rows > 0 && rows % 2 == 1, "rows must be odd and positive")
    def signs(df: DataFrame, key: Column): DataFrame =
      df.select(posexplode(array((0 until rows).map { r =>
        when(md5Hash60(concat(lit(s"$r:"), key.cast("string"))) % 2 === 0,
          1L).otherwise(-1L)
      }: _*)).as(Seq("r", "sign")))
        .groupBy(col("r")).agg(sum(col("sign")).as("s"))
    val prod = signs(a, keyA).withColumnRenamed("s", "sa")
      .join(signs(b, keyB).withColumnRenamed("s", "sb"), Seq("r"))
      .select((col("sa") * col("sb")).as("p"))
    val med = prod.orderBy(col("p")).limit(rows / 2 + 1)
      .orderBy(col("p").desc).limit(1)
      .select(col("p").as("join_est"))
    val exact = a.groupBy(keyA.as("__k")).agg(count(lit(1)).as("ca"))
      .join(b.groupBy(keyB.as("__k")).agg(count(lit(1)).as("cb")),
        Seq("__k"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("join_exact"))
    exact.crossJoin(med)
      .select(col("join_exact"), col("join_est"),
        abs(col("join_est") - col("join_exact")).as("abs_err"))
  }

  /** The d md5-derived bucket indices of an item for a depth-d, width-w
    * count-min sketch (row r hashes the string "r:<item>"). Pure column
    * math, identical in DuckDB:
    * `('0x' || substr(md5(r || ':' || CAST(x AS VARCHAR)), 1, 15))::BIGINT % w`.
    */
  def cmsBuckets(c: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      md5Hash60(concat(lit(s"$r:"), c.cast("string"))) % width
    }: _*)

  /** Count-min frequency sketch aggregate (see CountMinSketch): state is
    * depth*width longs per group; result is the flattened counter matrix
    * (row-major). Probe it with [[cmsEstimate]]. */
  def cmsSketch(c: Column, depth: Int = 4, width: Int = 512): Column =
    ColumnBridge.column(
      graft.expressions.CountMinSketch(
        ColumnBridge.expression(cmsBuckets(c, depth, width)), depth, width)
        .toAggregateExpression())

  /** Point-frequency estimate from a [[cmsSketch]] result: min over the
    * d counters at the item's bucket positions. Map-side column math —
    * probing never touches the aggregated data again. */
  def cmsEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    val buckets = cmsBuckets(item, depth, width)
    val counters = (0 until depth).map { r =>
      element_at(sketch, (lit(r * width) + element_at(buckets, r + 1) + 1)
        .cast("int"))
    }
    least(counters: _*)
  }

  // --------------------------------------------------- base-2 DDSketch

  /** Mergeable quantile sketch state, DDSketch (Masson et al. VLDB'19)
    * at γ=2 over NON-NEGATIVE integer values (cents, token counts,
    * byte sizes): bucket(v) = bit length of v (0 stays bucket 0), so
    * the sketch is at most 65 (bucket, count) rows however large the
    * input — and merging two sketches is adding count vectors, which
    * is what makes it the 100 TB quantile path (per-partition /
    * per-day sketches roll up with a tiny groupBy-sum, unlike exact
    * percentiles' distinct-value shuffle).
    *
    * γ=2 means a guaranteed ≤2× relative error — coarse but HONEST,
    * and unlike t-digest the state is deterministic (bucket counts
    * are exact integers independent of partitioning or merge order),
    * so it oracle-checks bit-exactly where t-digest can only
    * spec-check. The bit-length bucket needs no log(): `length(bin(v))`
    * here, `length(printf('%b', v))` in DuckDB — integer all the way
    * (the HLL-oracle trick, promoted to an operator). */
  def ddSketchCounts(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.filter(v.isNotNull && v >= 0)
      .groupBy(when(v === 0, lit(0))
        .otherwise(length(bin(v))).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile lookup over [[ddSketchCounts]] state: for each fraction,
    * rank = max(1, ceil(q·n)) falls in the first bucket whose
    * cumulative count reaches it; the estimate is the bucket's
    * geometric midpoint 3·2^(b−2) (exact integer; buckets 0/1 are
    * themselves). The state is ≤65 rows, so the cumulative window is
    * constant-size by construction. */
  def ddSketchQuantiles(counts: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got $qs")
    val spark = counts.sparkSession
    val n = counts.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val qsDf = spark.createDataFrame(qs.sorted.map(Tuple1(_))).toDF("q")
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * lit(n.toDouble))))
    // cumulative counts via triangle self-join over the ≤65-row state
    // — constant work, and no global window / single-partition
    // exchange anywhere in the operator (PlanAuditSpec invariant)
    val cum = counts
      .join(counts.select(col("bucket").as("__b2"),
        col("cnt").as("__c2")), col("__b2") <= col("bucket"))
      .groupBy(col("bucket"), col("cnt"))
      .agg(sum(col("__c2")).as("cum"))
    cum.join(qsDf,
        col("rank") > col("cum") - col("cnt") && col("rank") <= col("cum"))
      .select(col("q"), col("rank"), col("bucket"),
        when(col("bucket") <= 1, col("bucket").cast("long"))
          .otherwise(lit(3L) *
            expr("shiftleft(CAST(1 AS BIGINT), bucket - 2)")).as("est"))
  }
}
