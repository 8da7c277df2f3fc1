package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Model-evaluation and distribution statistics — the metrics a
  * training-data pipeline computes over scored corpora (classifier
  * quality on heldout labels, A/B significance on engagement values,
  * inequality/concentration of a spend distribution, independence of
  * two categorical factors).
  *
  * Design rules shared by every operator here:
  *   - all mass/moment accumulation is exact integer (BIGINT counts,
  *     DECIMAL(38,0) sums of cent-scaled inputs), so the shuffled
  *     aggregates are associative and bit-identical under any
  *     partitioning;
  *   - doubles appear only in FINAL single expressions over those
  *     exact aggregates (+,-,*,/ and sqrt are correctly-rounded IEEE
  *     ops: identical inputs + identical expression ⇒ identical bits
  *     cross-engine — the q126 lesson). No log/exp in any output.
  *   - nothing ever sorts or windows the global table without a
  *     partition key; the one global prefix sum (AUC) uses the same
  *     two-pass partition-offset scheme as Quantiles.ecdf.
  */
object Evaluation {

  /** Exact ROC-AUC via the Mann–Whitney U statistic with the standard
    * tie correction: AUC = [Σ_s pos(s)·(2·negBelow(s) + neg(s))] /
    * (2·n_pos·n_neg) — each tied (pos, neg) pair contributes ½.
    *
    * Scale: one hash aggregate to one row per DISTINCT score (never
    * per row), then the two-pass distributed prefix sum over the
    * range-partitioned score table (per-partition windows + a
    * partition-count-bounded offset table — no single-partition
    * window), then one global sum. The U numerator `u2` (doubled to
    * stay integral under ties) is exact; `auc` is one division.
    *
    * @param labelCol boolean column — true = positive
    * @param scoreCol integral score (pre-scale floats to cents)
    * @return one row: (n_pos, n_neg, u2, auc)
    */
  def rocAuc(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .groupBy(scoreCol.as("score"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("pos_c"),
        sum(when(labelCol, 0L).otherwise(1L)).as("neg_c"))
    val base = counts.repartitionByRange(col("score"))
      .sortWithinPartitions(col("score"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid"))
      .agg(sum(col("neg_c")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(offsets).toIndexedSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val res = base.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cumneg", sum(col("neg_c")).over(w) + col("__off"))
      .agg(sum(col("pos_c")).as("n_pos"),
        sum(col("neg_c")).as("n_neg"),
        sum(col("pos_c") *
          (lit(2L) * (col("__cumneg") - col("neg_c")) + col("neg_c")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
    res.collect() // force before unpersist (res is tiny: one row)
    base.unpersist()
    res
  }

  /** Per-group exact ROC-AUC — [[rocAuc]] stratified (per language,
    * cohort, model version…): same tie-corrected Mann–Whitney, with
    * the prefix sum running per group (window PARTITIONED by group
    * over the distinct-score mass table — groups parallel; a single
    * national-scale group belongs to the ungrouped two-pass form).
    * @return per group: (group, n_pos, n_neg, u2, auc) */
  def rocAucByGroup(df: DataFrame, groupCol: String, labelCol: Column,
      scoreCol: Column): DataFrame = {
    val counts = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .groupBy(col(groupCol), scoreCol.as("score"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("pos_c"),
        sum(when(labelCol, 0L).otherwise(1L)).as("neg_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cumneg", sum(col("neg_c")).over(w))
      .groupBy(col(groupCol))
      .agg(sum(col("pos_c")).as("n_pos"),
        sum(col("neg_c")).as("n_neg"),
        sum(col("pos_c") *
          (lit(2L) * (col("__cumneg") - col("neg_c")) + col("neg_c")))
          .as("u2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT: D = max over
    * distinct values of |F_a − F_b| is located by the integer
    * numerator |cum_a·n_b − cum_b·n_a| (cross-multiplied ECDF
    * difference — no float comparison decides the argmax), and only
    * the final D = d_num/(n_a·n_b) is a division. Distribution-free
    * two-sample test, log-free. One conditional count aggregate to
    * one row per distinct value, then the same two-pass distributed
    * prefix as [[rocAuc]], then one max.
    * @return one row: (n_a, n_b, d_num, d) */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .filter(col(valueCol).isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L))
        .as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L))
          .as("cb"))
    val base = counts.repartitionByRange(col("v"))
      .sortWithinPartitions(col("v"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offA = totals.scanLeft(0L)(_ + _._2).init
    val offB = totals.scanLeft(0L)(_ + _._3).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(offA.zip(offB))
        .map { case (p, (a, b)) => (p, a, b) }.toIndexedSeq)
      .toDF("__pid", "__offa", "__offb")
    val na = totals.map(_._2).sum
    val nb = totals.map(_._3).sum
    val w = Window.partitionBy(col("__pid")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the grand totals are already known from the offset pre-pass, so
    // the cross-multiplied ECDF gap is a per-row literal expression
    val res = base.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cuma", sum(col("ca")).over(w) + col("__offa"))
      .withColumn("__cumb", sum(col("cb")).over(w) + col("__offb"))
      .agg(max(abs(col("__cuma") * lit(nb) - col("__cumb") * lit(na)))
        .as("d_num"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (lit(na).cast("double") * lit(nb).cast("double"))).as("d"))
    res.collect() // force before unpersist (one row)
    base.unpersist()
    res
  }

  /** Spearman rank correlation per group, EXACT: ties get the average
    * rank, carried as the DOUBLED rank u = 2·rank_min + tie_count − 1
    * (always an integer), so every moment (Σu, Σv, Σuv, Σu², Σv²) is
    * an exact BIGINT and ρ is one identical double derivation from
    * them — no float accumulates. Two rank windows per group (one
    * sort-shuffle each) + one hash aggregate; groups run in parallel.
    * Σu² ≤ n·(2n)² per group, so BIGINT holds to ~10⁵-row groups per
    * the same budget note as rocAuc.
    * @return per group: (group, n, su, sv, suv, su2, sv2, rho) */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val b = df.filter(xCol.isNotNull && yCol.isNotNull)
      .select(col(groupCol), xCol.as("x"), yCol.as("y"))
    val wx = Window.partitionBy(col(groupCol)).orderBy(col("x"))
    val wy = Window.partitionBy(col(groupCol)).orderBy(col("y"))
    val ranked = b
      .withColumn("u", lit(2L) * rank().over(wx) +
        count(lit(1)).over(Window.partitionBy(col(groupCol), col("x")))
        - 1)
      .withColumn("v", lit(2L) * rank().over(wy) +
        count(lit(1)).over(Window.partitionBy(col(groupCol), col("y")))
        - 1)
    val m = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("u")).as("su"), sum(col("v")).as("sv"),
      sum(col("u") * col("v")).as("suv"),
      sum(col("u") * col("u")).as("su2"),
      sum(col("v") * col("v")).as("sv2"))
    def d(c: String): Column = col(c).cast("double")
    m.select(col(groupCol), col("n"), col("su"), col("sv"),
      col("suv"), col("su2"), col("sv2"),
      ((d("n") * d("suv") - d("su") * d("sv")) /
        sqrt((d("n") * d("su2") - d("su") * d("su")) *
          (d("n") * d("sv2") - d("sv") * d("sv")))).as("rho"))
  }

  /** Best binary split by weighted Gini impurity per group — the
    * decision-stump / CART building block: candidate thresholds are
    * the distinct values, left/right label counts come from one
    * group-partitioned ordered prefix window over the value-count
    * table (exact BIGINTs), the weighted impurity is one identical
    * double expression, and the argmin is a (gini, t) row_number.
    * Same distributed shape as TimeSeries.changepoint — linear, no
    * pairwise work, windows partitioned by group.
    * @return per group: (group, n_tot, pos_tot, split_t, nl, pl,
    *   gini) — split keeps values ≤ split_t on the left */
  def giniSplitByGroup(df: DataFrame, groupCol: String,
      labelCol: Column, valueCol: Column): DataFrame = {
    val counts = df.filter(valueCol.isNotNull && labelCol.isNotNull)
      .groupBy(col(groupCol), valueCol.as("t"))
      .agg(count(lit(1)).as("nv"),
        sum(when(labelCol, 1L).otherwise(0L)).as("pv"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(groupCol))
    def d(c: Column): Column = c.cast("double")
    val pre = counts
      .withColumn("nl", sum(col("nv")).over(ord))
      .withColumn("pl", sum(col("pv")).over(ord))
      .withColumn("n", sum(col("nv")).over(all))
      .withColumn("p", sum(col("pv")).over(all))
      .filter(col("nl") < col("n")) // right side must be non-empty
    def gini(pos: Column, tot: Column): Column =
      lit(1.0) - (d(pos) / d(tot)) * (d(pos) / d(tot)) -
        (d(tot - pos) / d(tot)) * (d(tot - pos) / d(tot))
    val scored = pre.withColumn("gini",
      (d(col("nl")) * gini(col("pl"), col("nl"))
        + d(col("n") - col("nl"))
          * gini(col("p") - col("pl"), col("n") - col("nl")))
        / d(col("n")))
    scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("gini"), col("t"))))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col("n").as("n_tot"),
        col("p").as("pos_tot"), col("t").as("split_t"),
        col("nl"), col("pl"), col("gini"))
  }

  /** Kaplan–Meier survival estimator per group (Kaplan & Meier 1958).
    * Event/censor counts per distinct time and the at-risk counts are
    * exact integers (one aggregate + one window — ties follow the
    * standard convention that events at t precede censorings at t);
    * the survival curve S(t) = Π(1 − d/n) is an ORDERED left fold of
    * per-step factors, so the doubles are bit-stable under any
    * partitioning and replayable by an oracle folding the same order
    * (DuckDB list_reduce over (factor, curve[]) structs — same device
    * as TimeSeries.holt). Curve rows are emitted only at event times.
    * Per-group step count bounds the folded array, not corpus size —
    * aggregate durations first.
    * @param eventCol true = event (death), false = censored
    * @return per step: (group, t, d, n_risk, survival) */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: Column,
      eventCol: Column): DataFrame = {
    val counts = df
      .filter(durationCol.isNotNull && eventCol.isNotNull)
      .groupBy(col(groupCol), durationCol.as("t"))
      .agg(sum(when(eventCol, 1L).otherwise(0L)).as("d"),
        sum(when(eventCol, 0L).otherwise(1L)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    val atRisk = counts
      .withColumn("__nrisk",
        sum(col("d") + col("c")).over(tot)
          - (sum(col("d") + col("c")).over(w) - col("d") - col("c")))
      .filter(col("d") > 0)
    val steps = atRisk.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("t"), col("d"),
        col("__nrisk").as("n"),
        (lit(1.0) - col("d").cast("double") /
          col("__nrisk").cast("double")).as("f")))).as("s"))
    // S at step i = ordered left fold f₁·f₂·…·fᵢ, recomputed per row
    // from the prefix slice — O(k²) multiplies on k = per-group event
    // times (a rollup-scale constant), and the SAME association
    // (((f₁·f₂)·f₃)…) an oracle's list_reduce replays bit-exactly
    val fs = transform(col("s"), e => e.getField("f"))
    steps
      .select(col(groupCol), col("s"), fs.as("fs"))
      .select(col(groupCol), col("fs"), posexplode(col("s")))
      .select(col(groupCol),
        col("col").getField("t").as("t"),
        col("col").getField("d").as("d"),
        col("col").getField("n").as("n_risk"),
        aggregate(slice(col("fs"), lit(2), col("pos")),
          element_at(col("fs"), 1), (acc, x) => acc * x)
          .as("survival"))
  }

  /** Welch's unequal-variance two-sample t-test between `groupA` and
    * `groupB` of `groupCol`, over integral `valueCol` (cents). The
    * moments (n, Σx, Σx²) are exact — Σx² accumulates in
    * DECIMAL(38,0) because cents² overflows BIGINT near 10⁹ rows —
    * and mean/variance/t/Welch–Satterthwaite dof are derived in one
    * final double expression each (rational ops + sqrt only).
    *
    * One map-combined aggregate over the two groups; the result is a
    * 1-row frame. @return (n_a, n_b, mean_a, mean_b, var_a, var_b,
    * t_stat, dof) */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    def side(g: String, tag: String): DataFrame =
      df.filter(col(groupCol) === g && col(valueCol).isNotNull)
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(col(valueCol)).as(s"s_$tag"),
          sum(col(valueCol).cast("decimal(38,0)") *
            col(valueCol).cast("decimal(38,0)")).as(s"ss_$tag"))
    val a = side(groupA, "a")
    val b = side(groupB, "b")
    def mean(t: String): Column =
      col(s"s_$t").cast("double") / col(s"n_$t").cast("double")
    // sample variance from exact moments: (Σx² − (Σx)²/n)/(n−1)
    def variance(t: String): Column =
      (col(s"ss_$t").cast("double") -
        col(s"s_$t").cast("double") * col(s"s_$t").cast("double") /
          col(s"n_$t").cast("double")) /
        (col(s"n_$t").cast("double") - lit(1.0))
    a.crossJoin(b) // both sides are 1-row aggregates
      .select(col("n_a"), col("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        variance("a").as("var_a"), variance("b").as("var_b"))
      .withColumn("__sea", col("var_a") / col("n_a").cast("double"))
      .withColumn("__seb", col("var_b") / col("n_b").cast("double"))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"),
        ((col("mean_a") - col("mean_b")) /
          sqrt(col("__sea") + col("__seb"))).as("t_stat"),
        (((col("__sea") + col("__seb")) * (col("__sea") + col("__seb"))) /
          (col("__sea") * col("__sea") / (col("n_a").cast("double") - lit(1.0))
            + col("__seb") * col("__seb") /
              (col("n_b").cast("double") - lit(1.0)))).as("dof"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns. Observed counts are one hash aggregate; row/col totals
    * are two more (all map-combined); expected = r·c/n and the cell
    * term (o−e)²/e are per-row doubles over exact integers. The final
    * reduction is ORDER-SENSITIVE double addition, so the cells (at
    * most |A|·|B| of them — bounded by the categorical cardinalities,
    * NOT the data) are folded in sorted (a, b) key order via one
    * sorted in-array fold — bit-identical on any engine that replays
    * the same order (the oracle does, with list_reduce).
    *
    * @return one row: (n, n_a, n_b, dof, chi2) */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val colT = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val nA = rowT.agg(count(lit(1)).as("n_a"),
      sum(col("ra")).as("n"))
    val nB = colT.agg(count(lit(1)).as("n_b"))
    val terms = cells
      .join(broadcast(rowT), Seq("a"))
      .join(broadcast(colT), Seq("b"))
      .crossJoin(broadcast(nA))
      .withColumn("__e",
        col("ra").cast("double") * col("cb").cast("double") /
          col("n").cast("double"))
      .withColumn("__t",
        (col("o").cast("double") - col("__e")) *
          (col("o").cast("double") - col("__e")) / col("__e"))
      .select(col("n"), col("n_a"),
        concat(col("a").cast("string"), lit("|"),
          col("b").cast("string")).as("__k"), col("__t"))
    terms
      .groupBy(col("n"), col("n_a"))
      .agg(sort_array(collect_list(struct(col("__k"), col("__t"))))
        .as("__s"))
      .crossJoin(broadcast(nB))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - lit(1L)) * (col("n_b") - lit(1L))).as("dof"),
        aggregate(
          transform(slice(col("__s"), lit(2), size(col("__s"))),
            e => e.getField("__t")),
          element_at(col("__s"), 1).getField("__t"),
          (acc, t) => acc + t).as("chi2"))
  }

  /** Gains / decile-lift chart: rank rows into k equi-depth score
    * buckets (bucket k = top scores), then per bucket the positive
    * rate, its lift over the base rate, and the cumulative gain
    * captured from the top bucket down — the standard targeting-model
    * acceptance report. Bucketing is the integer ceil(cum·k/n) rule
    * (duplicate-safe, engine-exact); the cumulative column comes from
    * a k×k triangular self-join of the k-row bucket table, never a
    * window over data. Same two-pass prefix machinery as [[rocAuc]].
    *
    * @return per bucket: (bucket, n_rows, n_pos, rate, lift,
    *         cum_pos, cum_gain) */
  def gainsChart(df: DataFrame, labelCol: Column, scoreCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = df.sparkSession
    val counts = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .groupBy(scoreCol.as("score"))
      .agg(count(lit(1)).as("all_c"),
        sum(when(labelCol, 1L).otherwise(0L)).as("pos_c"))
    val base = counts.repartitionByRange(col("score"))
      .sortWithinPartitions(col("score"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid"))
      .agg(sum(col("all_c")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = math.max(1L, totals.map(_._2).sum)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(offsets).toIndexedSeq).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = base.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cum", sum(col("all_c")).over(w) + col("__off"))
      .withColumn("bucket", expr(s"(__cum * $k + ${n - 1}L) div ${n}L"))
      .groupBy(col("bucket"))
      .agg(sum(col("all_c")).as("n_rows"), sum(col("pos_c")).as("n_pos"))
    val tot = buckets.agg(sum(col("n_rows")).as("__tn"),
      sum(col("n_pos")).as("__tp"))
    val cum = buckets.as("b").join(buckets.as("c"),
        col("c.bucket") >= col("b.bucket"))
      .groupBy(col("b.bucket").as("bucket"))
      .agg(sum(col("c.n_pos")).as("cum_pos"))
    val res = buckets
      .join(cum, Seq("bucket"))
      .crossJoin(broadcast(tot))
      .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
        col("n_pos"),
        (col("n_pos").cast("double") / col("n_rows").cast("double"))
          .as("rate"),
        ((col("n_pos").cast("double") * col("__tn").cast("double")) /
          (col("n_rows").cast("double") * col("__tp").cast("double")))
          .as("lift"),
        col("cum_pos"),
        (col("cum_pos").cast("double") / col("__tp").cast("double"))
          .as("cum_gain"))
    res.collect() // force before unpersist (k rows)
    base.unpersist()
    res
  }

  /** Categorical concentration battery per group: Simpson's index
    * λ = Σ nᵢ(nᵢ−1) / (N(N−1)) (probability two draws share a
    * category), the Herfindahl–Hirschman index Σ nᵢ²/N², and the top
    * category's share. Log-free diversity measures — every output is
    * a single division of exact integer sums, so the doubles are
    * engine-identical (unlike Shannon entropy, whose log is libm-
    * dependent). Two hash aggregates, map-combined.
    *
    * @return (group, n, n_cats, simpson_num, sq_num, top_c, simpson,
    *         hhi, top_share) */
  def concentrationByGroup(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val cells = df.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("c") * (col("c") - lit(1L))).as("simpson_num"),
        sum(col("c") * col("c")).as("sq_num"),
        max(col("c")).as("top_c"))
      .select(col(groupCol), col("n"), col("n_cats"),
        col("simpson_num"), col("sq_num"), col("top_c"),
        when(col("n") > 1L,
          col("simpson_num").cast("double") /
            (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
          .otherwise(lit(0.0)).as("simpson"),
        (col("sq_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("hhi"),
        (col("top_c").cast("double") / col("n").cast("double"))
          .as("top_share"))
  }

  /** Gini concentration coefficient per group over an integral value
    * column (cents), via the rank formula
    *   G = (2·Σᵢ rᵢ·xᵢ − (n+1)·Σx) / (n·Σx)
    * computed from DISTINCT-value mass: a value v with count c whose
    * cumulative count below is C contributes rank-sum c·C + c(c+1)/2
    * (constant under any ordering among ties, so G is well defined).
    * Accumulation is DECIMAL(38,0) (rank·cents products pass BIGINT
    * range near 10⁹ rows); G itself is one double expression.
    *
    * Scale shape = Quantiles.rankLookupByGroup: one row per distinct
    * value per group, window PARTITIONED by group (parallel across
    * groups; for a single national-scale group, swap in the ecdf
    * two-pass prefix — same contract). Values must be non-negative
    * for the coefficient to be meaningful.
    *
    * @return per group: (group, n, sum_v, gini) */
  def giniByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum(col("c")).over(w))
      // c(c+1) is even, so integer div 2 is exact; stays in BIGINT
      // range for any per-value count below ~3e9, then widens
      .withColumn("__tri", expr("(c * (c + 1)) div 2"))
      .withColumn("__rsum", // Σ ranks of this value's block
        col("c").cast("decimal(38,0)") *
          (col("__cum") - col("c")).cast("decimal(38,0)") +
          col("__tri").cast("decimal(38,0)"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") *
          col("v").cast("decimal(38,0)")).as("__sv"),
        sum(col("__rsum") * col("v").cast("decimal(38,0)")).as("__srx"))
      .select(col(groupCol), col("n"),
        col("__sv").cast("long").as("sum_v"),
        ((lit(2.0) * col("__srx").cast("double") -
          (col("n").cast("double") + lit(1.0)) *
            col("__sv").cast("double")) /
          (col("n").cast("double") * col("__sv").cast("double")))
          .as("gini"))
  }

  /** pass@k (Chen et al. 2021, the HumanEval estimator): with n
    * samples per task of which c pass, the unbiased estimate is
    * 1 − C(n−c, k)/C(n, k) = 1 − Π_{i<k}(n−c−i)/(n−i). Both products
    * are EXACT BIGINTs (k small by contract — the products must fit
    * 2⁶³: n ≤ ~6000 at k = 5; callers with more samples per task
    * subsample, as the paper does); the estimate is one division
    * and one subtraction in pinned order. Tasks with n < k are
    * dropped (the estimator is undefined there). One hash aggregate.
    * @return per task: (taskCol, n, c, fail_num, den, pass_at_k) */
  def passAtK(df: DataFrame, taskCol: String, passedCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k ($k) out of [1, 20]")
    val counted = df.groupBy(col(taskCol))
      .agg(count(lit(1)).as("n"),
        sum(when(passedCol, 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= k)
    val prod = (base: Column) => (0 until k)
      .map(i => base - lit(i.toLong))
      .reduce(_ * _)
    counted
      .withColumn("fail_num", greatest(prod(col("n") - col("c")), lit(0L)))
      .withColumn("den", prod(col("n")))
      .withColumn("pass_at_k",
        lit(1.0) - col("fail_num").cast("double") /
          col("den").cast("double"))
  }

  /** Two-proportion z-test (pooled), the A/B-test primitive: counts
    * are exact integers, the statistic is a fixed chain of
    * correctly-rounded IEEE ops (one sqrt), so the value is
    * bit-stable and oracle-reproducible. Returns NULL z on degenerate
    * input (either arm empty, or pooled rate 0/1 — no variance).
    * @return one row: (n1, x1, n2, x2, p1, p2, z) */
  def twoProportionZ(df: DataFrame, armCol: Column,
      successCol: Column): DataFrame = {
    def d(c: Column): Column = c.cast("double")
    val agg = df.agg(
      sum(when(armCol, 1L).otherwise(0L)).as("n1"),
      sum(when(armCol && successCol, 1L).otherwise(0L)).as("x1"),
      sum(when(!armCol, 1L).otherwise(0L)).as("n2"),
      sum(when(!armCol && successCol, 1L).otherwise(0L)).as("x2"))
    agg.select(col("n1"), col("x1"), col("n2"), col("x2"),
        (d(col("x1")) / d(col("n1"))).as("p1"),
        (d(col("x2")) / d(col("n2"))).as("p2"),
        (d(col("x1")) + d(col("x2"))).as("__sx"),
        (d(col("n1")) + d(col("n2"))).as("__sn"))
      .withColumn("__p", col("__sx") / col("__sn"))
      .withColumn("z",
        when(col("n1") > 0 && col("n2") > 0 &&
            col("__p") > 0.0 && col("__p") < 1.0,
          (col("p1") - col("p2")) /
            sqrt(col("__p") * (lit(1.0) - col("__p")) *
              (lit(1.0) / d(col("n1")) + lit(1.0) / d(col("n2"))))))
      .select(col("n1"), col("x1"), col("n2"), col("x2"),
        col("p1"), col("p2"), col("z"))
  }

  /** Per-group two-feature ordinary least squares y ~ β0 + β1·x1 +
    * β2·x2, solved by Cramer's rule over the 3×3 normal equations.
    * Inputs must be INTEGRAL columns (pre-scale 2-dp floats by 100):
    * all nine moments (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y,
    * Σx2y) are then exact BIGINT sums — associative under any
    * partitioning — and the betas are a fixed expression tree of
    * +,-,*,/ over their int64→double conversions (each moment must
    * stay < 2^53), so every output bit is engine-reproducible. This
    * is the multi-feature extension of the q126 lesson: never let a
    * native regr_* aggregate pick the accumulation order.
    *
    * Scale: one map-side-combined aggregate, one row per group out.
    * The d=2 special case is closed-form; the general-d version of
    * this design is the Gram-matrix pattern (Pca.gramMatrix) with a
    * driver-side d×d solve — d², never n, leaves the executors. */
  def ols2ByGroup(df: DataFrame, groupCol: String, y: Column,
      x1: Column, x2: Column): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val m = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
        sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"),
        sum(x2 * x2).as("s22"),
        sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
    // det of [[a,b,c],[d,e,f],[g,h,i]] expanded along the first row;
    // the SAME expression text is in the oracle SQL — bit-identical.
    def det3(a: Column, b: Column, c: Column, dd: Column, e: Column,
        f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
    val (n, s1, s2, sy) = (d("n"), d("s1"), d("s2"), d("sy"))
    val (s11, s12, s22, s1y, s2y) = (d("s11"), d("s12"), d("s22"),
      d("s1y"), d("s2y"))
    val det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    m.select(col(groupCol), col("n"), col("s1"), col("s2"), col("sy"),
      col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"),
      when(det =!= 0.0,
        det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det).as("beta0"),
      when(det =!= 0.0,
        det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / det).as("beta1"),
      when(det =!= 0.0,
        det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / det).as("beta2"))
  }

  /** Youden-J optimal threshold: over every distinct score cutpoint
    * (predict positive when score ≥ c), pick the c maximizing
    * J = TPR − FPR, ranked by the CROSS-MULTIPLIED integer
    * TP·N − FP·P — exact ordering, no float comparisons; ties break
    * toward the smallest cutpoint.
    *
    * Scale: one hash aggregate to a row per DISTINCT score, then the
    * same range-partitioned two-pass prefix scheme as [[rocAuc]]
    * (per-partition windows + a partition-count-bounded offset table
    * — never a global window), then a top-1 selection. Scores must
    * be integral (pre-scale to cents).
    * @return one row: (cutpoint, tp, fp, fn, tn, j_scaled, youden_j) */
  def youdenThreshold(df: DataFrame, labelCol: Column,
      scoreCol: Column): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .groupBy(scoreCol.as("score"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("pos_c"),
        sum(when(labelCol, 0L).otherwise(1L)).as("neg_c"))
    val base = counts.repartitionByRange(col("score"))
      .sortWithinPartitions(col("score"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_ONLY)
    val totals = base.groupBy(col("__pid"))
      .agg(sum(col("pos_c")).as("tp"), sum(col("neg_c")).as("tn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val pTot = totals.map(_._2).sum
    val nTot = totals.map(_._3).sum
    val posOff = totals.map(_._2).scanLeft(0L)(_ + _).init
    val negOff = totals.map(_._3).scanLeft(0L)(_ + _).init
    val offDf = spark.createDataFrame(
      totals.map(_._1).zip(posOff.zip(negOff))
        .map { case (p, (a, b)) => (p, a, b) }.toIndexedSeq)
      .toDF("__pid", "__poff", "__noff")
    val w = Window.partitionBy(col("__pid")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ascending cums BELOW the cutpoint; tp/fp at "score >= c" follow
    val res = base.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cpos",
        sum(col("pos_c")).over(w) + col("__poff") - col("pos_c"))
      .withColumn("__cneg",
        sum(col("neg_c")).over(w) + col("__noff") - col("neg_c"))
      .select(col("score"),
        (lit(pTot) - col("__cpos")).as("tp"),
        (lit(nTot) - col("__cneg")).as("fp"))
      .withColumn("j_scaled",
        col("tp") * lit(nTot) - col("fp") * lit(pTot))
      .orderBy(col("j_scaled").desc, col("score")).limit(1)
      .select(col("score").as("cutpoint"), col("tp"), col("fp"),
        (lit(pTot) - col("tp")).as("fn"),
        (lit(nTot) - col("fp")).as("tn"),
        col("j_scaled"),
        (col("j_scaled").cast("double") /
          (lit(pTot) * lit(nTot)).cast("double")).as("youden_j"))
      .localCheckpoint(eager = true)
    base.unpersist()
    res
  }

  /** CUPED variance reduction (Deng et al. WSDM'13) — the A/B-test
    * covariate adjustment: per experiment unit, an exact integral
    * pre-period covariate x and post-period metric y; θ =
    * cov(x,y)/var(x); the adjusted effect is diff_y − θ·diff_x and
    * the adjusted variance var(y) − 2θ·cov + θ²·var(x) — BOTH derived
    * algebraically from the same five exact BIGINT moments, never
    * from a second pass over per-unit adjusted doubles (whose
    * summation order would be engine-dependent). Population (biased)
    * moments throughout; every double is a pinned expression over
    * int64→double conversions.
    *
    * Scale: one per-unit aggregate (shuffle on unit id, map-side
    * combined) then one global moment aggregate — two passes, no
    * broadcast of anything data-sized.
    *
    * @param unit  experiment-unit key column
    * @param arm   boolean treatment indicator (constant per unit)
    * @param pre   exact integral pre-period contribution per row
    * @param post  exact integral post-period contribution per row
    * @return one row: exact moments + (theta, var_y, var_cuped,
    *         var_reduction, diff_raw, diff_cuped) */
  def cuped(df: DataFrame, unit: Column, arm: Column, pre: Column,
      post: Column): DataFrame = {
    val perUnit = df.groupBy(unit.as("u"))
      .agg(max(when(arm, 1L).otherwise(0L)).as("t"),
        sum(pre.cast("long")).as("x"), sum(post.cast("long")).as("y"))
    val m = perUnit.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("t")).as("n1"),
      sum(col("t") * col("x")).as("sx1"),
      sum(col("t") * col("y")).as("sy1"))
    def d(c: String): Column = col(c).cast("double")
    m.select(col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"),
        col("syy"), col("n1"),
        ((d("n") * d("sxx") - d("sx") * d("sx")) / (d("n") * d("n")))
          .as("var_x"),
        ((d("n") * d("syy") - d("sy") * d("sy")) / (d("n") * d("n")))
          .as("var_y"),
        ((d("n") * d("sxy") - d("sx") * d("sy")) / (d("n") * d("n")))
          .as("cov_xy"),
        // one-armed experiments (n1=0 or n1=n) have no between-arm
        // difference: guard the divisions so neither engine evaluates
        // x/0 (Spark Divide yields NULL, DuckDB float semantics differ
        // — the var_x/var_y guard discipline)
        when(col("n1") > 0L && col("n1") < col("n"),
          d("sy1") / d("n1") - (d("sy") - d("sy1")) / (d("n") - d("n1")))
          .as("diff_raw"),
        when(col("n1") > 0L && col("n1") < col("n"),
          d("sx1") / d("n1") - (d("sx") - d("sx1")) / (d("n") - d("n1")))
          .as("__diff_x"))
      .withColumn("theta",
        when(col("var_x") > 0.0, col("cov_xy") / col("var_x")))
      .withColumn("var_cuped",
        when(col("var_x") > 0.0,
          col("var_y") - lit(2.0) * col("theta") * col("cov_xy") +
            col("theta") * col("theta") * col("var_x")))
      .withColumn("var_reduction",
        when(col("var_y") > 0.0, col("var_cuped") / col("var_y")))
      .withColumn("diff_cuped",
        col("diff_raw") - col("theta") * col("__diff_x"))
      .drop("__diff_x")
  }

  /** NDCG@k per query (Järvelin & Kekäläinen 2002): rank candidates
    * by (orderCol desc, tieCol asc), DCG@k = Σ_{i≤k} rel_i/log2(i+1),
    * IDCG@k = the same sum over relevance sorted descending, NDCG =
    * DCG/IDCG (NULL when the query has no relevant docs). The one
    * exception to this object's "no log in any output" rule — the
    * log2 discount IS the metric — so both fold sums run over SORTED
    * term lists (the q60 rule) and gate rows emit micro-unit BIGINTs
    * (the q60/q83/q132 pattern) rather than raw doubles.
    *
    * Exactness notes: ideal-ranking ties are harmless (equal rel ⇒
    * equal terms, any tie order gives the same sum); per-query term
    * lists are ≤ k elements, collected per group — never the corpus.
    * Scale: two windows PARTITIONED by query (parallel across
    * queries), one k-bounded aggregate.
    *
    * @param relCol non-negative integral graded relevance
    * @return per query: (queryCol, n_ranked, n_rel, dcg, idcg, ndcg) */
  def ndcgAtK(df: DataFrame, queryCol: String, orderCol: Column,
      tieCol: Column, relCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k ($k) out of [1, 1000]")
    val base = df.select(col(queryCol), orderCol.as("__s"),
      tieCol.as("__t"), relCol.cast("long").as("__rel"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      val wRank = Window.partitionBy(col(queryCol))
        .orderBy(col("__s").desc, col("__t"))
      val wIdeal = Window.partitionBy(col(queryCol))
        .orderBy(col("__rel").desc, col("__t"))
      def discounted(rank: Column): Column =
        col("__rel").cast("double") / log2(rank.cast("double") + lit(1.0))
      val sortedSum = (c: Column) =>
        aggregate(sort_array(c), lit(0.0), _ + _)
      val dcg = base
        .withColumn("__k", row_number().over(wRank))
        .filter(col("__k") <= k)
        .groupBy(col(queryCol))
        .agg(count(lit(1)).as("n_ranked"),
          sortedSum(collect_list(discounted(col("__k")))).as("dcg"))
      val idcg = base.filter(col("__rel") > 0L)
        .withColumn("__k", row_number().over(wIdeal))
        .filter(col("__k") <= k)
        .groupBy(col(queryCol))
        .agg(count(lit(1)).as("n_rel"),
          sortedSum(collect_list(discounted(col("__k")))).as("idcg"))
      dcg.join(idcg, Seq(queryCol), "left_outer")
        .select(col(queryCol), col("n_ranked"),
          coalesce(col("n_rel"), lit(0L)).as("n_rel"),
          col("dcg"), coalesce(col("idcg"), lit(0.0)).as("idcg"),
          when(col("idcg") > 0.0, col("dcg") / col("idcg")).as("ndcg"))
        .localCheckpoint(eager = true)
    } finally base.unpersist(blocking = false)
  }

  /** Reciprocal rank @k per query, EXACT: rank candidates by
    * (orderCol desc, tieCol asc); the first relevant rank r ≤ k
    * contributes 1/r, restated as the INTEGER 2520/r (2520 =
    * lcm(1..10), the q325 trick — so k ≤ 10), over the constant
    * denominator 2520. MRR is then Σ rr_num / (2520·|Q|) — queries
    * with no relevant doc in the top k contribute rr_num = 0 but
    * still count in |Q|, per the standard definition. The emitted
    * `rr` is one division of exact integers — bit-stable, no micro
    * scaling needed. Scale: one query-partitioned window, k-bounded.
    *
    * @return per query: (queryCol, first_rank, rr_num, rr) */
  def reciprocalRankAtK(df: DataFrame, queryCol: String,
      orderCol: Column, tieCol: Column, relCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"k ($k) out of [1, 10] (lcm base 2520)")
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("__s").desc, col("__t"))
    df.select(col(queryCol), orderCol.as("__s"), tieCol.as("__t"),
        relCol.cast("long").as("__rel"))
      .withColumn("__k", row_number().over(w).cast("long"))
      .filter(col("__k") <= k)
      .groupBy(col(queryCol))
      .agg(min(when(col("__rel") > 0L, col("__k"))).as("first_rank"))
      .select(col(queryCol), col("first_rank"),
        coalesce(expr("2520 div first_rank"), lit(0L)).as("rr_num"))
      .withColumn("rr", col("rr_num").cast("double") / lit(2520.0))
  }

  /** Per-order clipped n-gram match counts — the shared integer core
    * of corpus BLEU and ROUGE-N: for each (pair, order n), the
    * candidate's n-gram multiset is clipped against the reference's
    * (Σ_g min(cand_g, ref_g)) plus both sides' total n-gram counts.
    * Everything is an exact BIGINT. Scale: per order, two explodes +
    * one (id, gram) hash aggregate each + an equi-join on (id, gram)
    * — candidate grams only ever meet the SAME document's reference
    * grams, never a cross join; orders are maxN bounded passes. */
  private def clippedGramStats(pairs: DataFrame, idCol: String,
      candCol: Column, refCol: Column, orders: Seq[Int]): DataFrame = {
    require(orders.nonEmpty && orders.forall(n => n >= 1 && n <= 6),
      s"orders ($orders) must be within [1, 6]")
    // tokenize ONCE per side and persist: the regex tokenizer is the
    // dominant cost, and the naive shape re-ran it 3× per order
    // (measured 14.7 s for BLEU-4 at sf0.1 — this form runs ~4 s).
    // Per-order gram counts come from token lengths (len − n + 1),
    // never from materializing the gram array a second time.
    // NOT repartitioned before the persist: an id-keyed repartition
    // was tried for single-split fixtures and MEASURED 3× the total
    // CPU at sf0.1 (the shuffle writes token arrays, and the cached
    // post-shuffle partitions lose the scan-fused tokenizer) — the
    // Tables.load small-fixture trade holds here too; real multi-split
    // corpora arrive parallel already
    val base = pairs.select(col(idCol).as("__id"),
        graft.functions.TextAnalysis.alnumTokens(candCol).as("__ct"),
        graft.functions.TextAnalysis.alnumTokens(refCol).as("__rt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val out = clippedStatsOver(base, tokenGrams, size(_), orders)
    base.unpersist()
    out
  }

  /** Word n-grams of a token array: space-joined length-n windows
    * (n = 1 returns the array itself — no re-materialization). */
  private def tokenGrams(tk: Column, n: Int): Column =
    if (n == 1) tk
    else when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Character n-grams of a string: length-n substrings at every
    * offset (code-point indexed on both engines). */
  private def charGrams(sc: Column, n: Int): Column =
    when(length(sc) >= n,
      transform(sequence(lit(1), length(sc) - (n - 1)),
        i => sc.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** The clip-join core shared by the word-gram (BLEU/ROUGE/F1) and
    * char-gram (chrF) stat builders, over a prepared and persisted
    * (__id, __ct, __rt) frame: one independent explode → (id, gram)
    * hash-aggregate → same-id clip-join chain PER ORDER, all under
    * one action — Spark schedules the ready stages of the union
    * branches CONCURRENTLY, which beats a single fused (id, n, gram)
    * stream by ~30% wall (measured both ways at sf0.1 — the fused
    * stream serializes into fewer, bigger stages and pays
    * array-of-struct materialization per row). Per-order gram counts
    * derive from `unitsOf` (token / char count) as max(units−n+1, 0),
    * never by materializing the gram array a second time. */
  private def clippedStatsOver(base: DataFrame,
      gramsOf: (Column, Int) => Column,
      unitsOf: Column => Column,
      orders: Seq[Int]): DataFrame = {
    orders.map { n =>
      def counts(side: Column) = base
        .select(col("__id"), explode(gramsOf(side, n)).as("__g"))
        .groupBy(col("__id"), col("__g"))
        .agg(count(lit(1)).as("__c"))
      val clipped = counts(col("__ct"))
        .join(counts(col("__rt")).withColumnRenamed("__c", "__r"),
          Seq("__id", "__g"))
        .groupBy(col("__id"))
        .agg(sum(least(col("__c"), col("__r"))).as("__m"))
      base.select(col("__id"),
          greatest(unitsOf(col("__ct")) - (n - 1), lit(0)).cast("long")
            .as("cand_grams"),
          greatest(unitsOf(col("__rt")) - (n - 1), lit(0)).cast("long")
            .as("ref_grams"))
        .join(clipped, Seq("__id"), "left")
        .select(col("__id").as("id"), lit(n).as("n"),
          coalesce(col("__m"), lit(0L)).as("matches"),
          col("cand_grams"), col("ref_grams"))
    }.reduce(_ unionAll _)
      // bounded result (pairs × |orders| rows): materialize so the
      // token/char cache can be released before callers aggregate
      .localCheckpoint(true)
  }

  /** Per-order clipped CHARACTER n-gram stats — [[clippedGramStats]]'s
    * char-level sibling and chrF's integer core: both sides are
    * whitespace-stripped (the chrF convention: word boundaries carry
    * no credit), then length-n substrings clip per document exactly
    * as the word grams do. Everything exact BIGINTs. */
  private def clippedCharStats(pairs: DataFrame, idCol: String,
      candCol: Column, refCol: Column, orders: Seq[Int]): DataFrame = {
    require(orders.nonEmpty && orders.forall(n => n >= 1 && n <= 6),
      s"orders ($orders) must be within [1, 6]")
    val base = pairs.select(col(idCol).as("__id"),
        regexp_replace(candCol, "\\s+", "").as("__ct"),
        regexp_replace(refCol, "\\s+", "").as("__rt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val out = clippedStatsOver(base, charGrams, length(_).cast("int"), orders)
    base.unpersist()
    out
  }

  /** Corpus-level chrF (Popović 2015, "chrF: character n-gram F-score
    * for automatic MT evaluation"): per-order character n-gram
    * precision P_n = Σ clipped matches / Σ candidate grams and recall
    * R_n = Σ clipped matches / Σ reference grams (clipping per
    * DOCUMENT, corpus-level sums — the sacrebleu aggregation), macro-
    * averaged over orders 1..maxN into P and R, then
    * chrF = (1+β²)·P·R / (β²·P + R) with the standard β = 2 (recall
    * weighted double). Whitespace is stripped before gram extraction
    * (the chrF convention), so the metric rewards sub-word overlap
    * BLEU's word grams miss — the reason chrF is the robust choice
    * for morphologically-rich or unsegmented languages.
    *
    * Determinism: all counts exact BIGINTs; each P_n/R_n is ONE
    * division of exact integers (correctly-rounded IEEE); the macro
    * averages fold the maxN terms in SORTED order (q60 rule); the
    * final F is a fixed expression tree over those — gate rows emit
    * chrf micro-rounded. Orders with zero grams contribute 0 terms;
    * P = R = 0 ⇒ chrF exactly 0 (never a 0/0).
    *
    * Scale: same shape as [[corpusBleu]] — per order one explode +
    * one (id, gram) hash aggregate per side + an equi-join on
    * (id, gram); candidate grams only ever meet the SAME document's
    * reference grams. Char grams multiply row counts ~5× vs word
    * grams at equal order (one gram per CHARACTER offset), which is
    * the metric's published cost, not a plan artifact.
    *
    * @return one row per order (total-ordered by n) carrying the
    *         corpus constants: (n, matches, cand_grams, ref_grams,
    *         chrf) — chrf identical on every row */
  def chrF(pairs: DataFrame, idCol: String, candCol: Column,
      refCol: Column, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN ($maxN) out of [1, 6]")
    require(beta > 0.0 && beta.isFinite, s"beta ($beta) must be positive")
    val stats = clippedCharStats(pairs, idCol, candCol, refCol, 1 to maxN)
    val perN = stats.groupBy(col("n"))
      .agg(sum(col("matches")).as("matches"),
        sum(col("cand_grams")).as("cand_grams"),
        sum(col("ref_grams")).as("ref_grams"))
    val b2 = beta * beta
    val folded = perN.agg(
      aggregate(sort_array(collect_list(
          when(col("cand_grams") > 0L, col("matches").cast("double") /
            col("cand_grams").cast("double")).otherwise(lit(0.0)))),
        lit(0.0), (a, x) => a + x).as("__psum"),
      aggregate(sort_array(collect_list(
          when(col("ref_grams") > 0L, col("matches").cast("double") /
            col("ref_grams").cast("double")).otherwise(lit(0.0)))),
        lit(0.0), (a, x) => a + x).as("__rsum"))
    perN.crossJoin(broadcast(folded))
      .withColumn("__p", col("__psum") / lit(maxN.toDouble))
      .withColumn("__r", col("__rsum") / lit(maxN.toDouble))
      .withColumn("chrf",
        when(col("__psum") === 0.0 && col("__rsum") === 0.0, lit(0.0))
          .otherwise(lit(1.0 + b2) * col("__p") * col("__r") /
            (lit(b2) * col("__p") + col("__r"))))
      .select(col("n"), col("matches"), col("cand_grams"),
        col("ref_grams"), col("chrf"))
  }

  /** Distinct-n diversity (Li et al. 2016, "A Diversity-Promoting
    * Objective Function for Neural Conversation Models"): per order,
    * the count of DISTINCT word n-grams over the total n-gram count
    * across a generation set — the standard mode-collapse screen for
    * model outputs (a generator that repeats itself scores near 0).
    * distinct_ratio is ONE division of exact BIGINTs, so rows
    * hash-compare raw.
    *
    * Scale: per order one explode + one gram hash-aggregate (the
    * shuffle carries one row per DISTINCT gram, map-side combined) +
    * one global count/sum — never a countDistinct expansion. */
  def distinctN(df: DataFrame, textCol: Column,
      orders: Seq[Int]): DataFrame = {
    require(orders.nonEmpty && orders.forall(n => n >= 1 && n <= 6),
      s"orders ($orders) must be within [1, 6]")
    val base = df.select(
        graft.functions.TextAnalysis.alnumTokens(textCol).as("__tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val out = orders.map { n =>
      base.select(explode(tokenGrams(col("__tk"), n)).as("__g"))
        .groupBy(col("__g")).agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("distinct_grams"),
          coalesce(sum(col("__c")), lit(0L)).as("total_grams"))
        .select(lit(n).as("n"), col("distinct_grams"), col("total_grams"),
          when(col("total_grams") > 0L, col("distinct_grams").cast("double") /
            col("total_grams").cast("double")).as("distinct_ratio"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    base.unpersist()
    out
  }

  /** Corpus-level BLEU (Papineni et al. 2002): per-order modified
    * precision p_n = Σ_docs clipped matches / Σ_docs candidate
    * n-grams (clipping per DOCUMENT against its own reference — the
    * defining guard against "the the the"), geometric mean over
    * orders 1..maxN, brevity penalty min(1, e^(1−r/c)) from corpus
    * token totals. All counts exact BIGINTs; the only float surface
    * is the final ln/exp chain over maxN SORTED terms (q60 rule) —
    * gate rows emit bleu micro-rounded. Any p_n = 0 ⇒ BLEU exactly 0
    * (the standard smoothing-free convention), emitted directly so
    * ln(0) never evaluates.
    *
    * @return one row per order (total-ordered by n) carrying the
    *         corpus constants: (n, matches, cand_grams, c_len, r_len,
    *         bleu) */
  def corpusBleu(pairs: DataFrame, idCol: String, candCol: Column,
      refCol: Column, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN ($maxN) out of [1, 6]")
    val stats = clippedGramStats(pairs, idCol, candCol, refCol, 1 to maxN)
    val perN = stats
      .groupBy(col("n"))
      .agg(sum(col("matches")).as("matches"),
        sum(col("cand_grams")).as("cand_grams"))
    // corpus token totals ARE the order-1 gram totals: read them off
    // the (checkpointed) stats frame instead of re-scanning and
    // re-tokenizing the pair table for a second pass
    val lens = stats.filter(col("n") === 1)
      .agg(sum(col("cand_grams")).as("c_len"),
        sum(col("ref_grams")).as("r_len"))
    val folded = perN.agg(
      min(col("matches")).as("__minm"),
      // ln p_n terms folded in SORTED order — deterministic doubles.
      // cand_grams = 0 (every candidate shorter than this order) is
      // guarded to 0.0: matches is then 0 too, so __minm = 0 discards
      // the whole fold and BLEU is exactly 0 — without the guard the
      // ANSI divide THROWS on such a corpus (caught by R8PropertySpec)
      aggregate(sort_array(collect_list(
          when(col("cand_grams") > 0L,
            log(col("matches").cast("double") /
              col("cand_grams").cast("double"))).otherwise(lit(0.0)))),
        lit(0.0), (a, x) => a + x).as("__lnsum"))
    perN.crossJoin(broadcast(lens)).crossJoin(broadcast(folded))
      .withColumn("bleu",
        when(col("__minm") === 0L, lit(0.0)).otherwise(
          when(col("c_len") >= col("r_len"), lit(1.0))
            .otherwise(exp(lit(1.0) -
              col("r_len").cast("double") / col("c_len").cast("double")))
            * exp(col("__lnsum") / lit(maxN.toDouble))))
      .select(col("n"), col("matches"), col("cand_grams"),
        col("c_len"), col("r_len"), col("bleu"))
  }

  /** Token-level F1 — the SQuAD/QA answer-overlap metric (Rajpurkar
    * et al. 2016): bag-of-words clipped unigram matches m between
    * candidate and reference; P = m/c, R = m/r, F1 = 2m/(c+r). Each
    * output is ONE division of exact integers (2m and c+r are exact),
    * so every column hash-compares raw — no micro scaling, no ln
    * surface at all. Same scale shape as [[corpusBleu]] restricted to
    * order 1.
    * @return per doc: (id, matches, cand_tokens, ref_tokens,
    *         precision, recall, f1) */
  def tokenF1(pairs: DataFrame, idCol: String, candCol: Column,
      refCol: Column): DataFrame =
    clippedGramStats(pairs, idCol, candCol, refCol, Seq(1))
      .select(col("id"), col("matches"),
        col("cand_grams").as("cand_tokens"),
        col("ref_grams").as("ref_tokens"),
        when(col("cand_grams") > 0L, col("matches").cast("double") /
          col("cand_grams").cast("double")).as("precision"),
        when(col("ref_grams") > 0L, col("matches").cast("double") /
          col("ref_grams").cast("double")).as("recall"),
        when(col("cand_grams") + col("ref_grams") > 0L,
          (lit(2L) * col("matches")).cast("double") /
            (col("cand_grams") + col("ref_grams")).cast("double"))
          .as("f1"))

  /** Expected / maximum calibration error (Naeini et al. 2015; Guo et
    * al. 2017 "On Calibration of Modern Neural Networks") — the
    * single-number companions to the per-bucket calibration table: a
    * model's predicted probability p ∈ {0..99}% is bucketed into
    * `nBuckets` equal-width bins; per bin the cross-multiplied gap
    * |Σp − 100·Σy| is an exact BIGINT (= 100·n_b·|p̄_b − ȳ_b|), and
    *   ECE = Σ_b (n_b/N)·|p̄_b − ȳ_b| = Σ_b gap_b / (100·N)
    * collapses to ONE division of exact integers. MCE = max_b of the
    * per-bin ratio gap_b/(100·n_b) — each term a single
    * correctly-rounded IEEE division of exact integers, so the max is
    * deterministic; worst_bucket is the SMALLEST bucket id attaining
    * it (float-equality against the max is safe because both engines
    * compute bit-identical ratios from identical integers).
    *
    * Scale: one hash aggregate to nBuckets rows, then driver-free
    * constant-size arithmetic — the probability column never sorts.
    *
    * @param p100Col integer predicted probability in percent (0..99)
    * @param labelCol 0/1 outcome
    * @return one row: (n, n_buckets, gap_sum, ece, mce, worst_bucket) */
  def expectedCalibrationError(df: DataFrame, p100Col: Column,
      labelCol: Column, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0 && 100 % nBuckets == 0,
      s"nBuckets ($nBuckets) must divide 100")
    val w = (100 / nBuckets).toDouble
    // the documented p100 domain is ENFORCED, not assumed: an
    // out-of-range probability (p100 = 100, negatives) would land in a
    // phantom bucket and silently skew ECE/MCE — fail the row loudly
    // instead (the repo's strict-parser convention)
    val pc = p100Col.cast("long")
    val pChecked = when(pc >= 0L && pc <= 99L, pc)
      .otherwise(raise_error(concat(
        lit("expectedCalibrationError: p100 out of [0, 100): "),
        pc.cast("string"))).cast("long"))
    val per = df
      .select(floor(pChecked.cast("double") / lit(w))
          .cast("long").as("bucket"),
        pChecked.as("p"), labelCol.cast("long").as("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"))
      .withColumn("gap", abs(col("sp") - lit(100L) * col("sy")))
      .withColumn("r", col("gap").cast("double") /
        (lit(100.0) * col("n_b").cast("double")))
    val tot = per.agg(sum(col("n_b")).as("n"),
      count(lit(1)).as("n_buckets"), sum(col("gap")).as("gap_sum"),
      max(col("r")).as("mce"))
    val worst = per.join(broadcast(tot.select(col("mce").as("__mce"))),
        col("r") === col("__mce"))
      .agg(min(col("bucket")).as("worst_bucket"))
    tot.crossJoin(broadcast(worst))
      .select(col("n"), col("n_buckets"), col("gap_sum"),
        (col("gap_sum").cast("double") /
          (lit(100.0) * col("n").cast("double"))).as("ece"),
        col("mce"), col("worst_bucket"))
  }

  /** ROUGE-L (Lin 2004 §3): longest-common-subsequence overlap per
    * candidate/reference pair — the ORDER-SENSITIVE member of the
    * ROUGE family ("cat the sat" vs "the cat sat" shares every
    * unigram but only a 2-token subsequence). LCS runs in the
    * codegen'd [[graft.expressions.TokenLcsExpression]] (rolling-row
    * DP, map-only — nothing shuffles but the output); both sides
    * TRUNCATE to `maxTokens` first because the metric itself is
    * quadratic per pair (the documented ROUGE-L discipline — summary
    * evaluation runs on summary-length texts).
    *
    * Every output is an exact integer or ONE division of exact
    * integers (the oovStats rule) — R = ℓ/m, P = ℓ/n,
    * F1 = 2ℓ/(n+m) — so rows hash-compare raw.
    * @return per doc: (id, lcs, cand_tokens, ref_tokens, rouge_l_r,
    *         rouge_l_p, rouge_l_f1) */
  def rougeL(pairs: DataFrame, idCol: String, candCol: Column,
      refCol: Column, maxTokens: Int = 256): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 4096,
      s"maxTokens ($maxTokens) out of [1, 4096]")
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    def tk(c: Column) = slice(
      graft.functions.TextAnalysis.alnumTokens(c), 1, maxTokens)
    val lcs = C(graft.expressions.TokenLcsExpression(
      E(tk(candCol)), E(tk(refCol)))).cast("long")
    pairs
      .select(col(idCol).as("id"), lcs.as("lcs"),
        size(tk(candCol)).cast("long").as("cand_tokens"),
        size(tk(refCol)).cast("long").as("ref_tokens"))
      .select(col("id"), col("lcs"), col("cand_tokens"), col("ref_tokens"),
        when(col("ref_tokens") > 0L, col("lcs").cast("double") /
          col("ref_tokens").cast("double")).as("rouge_l_r"),
        when(col("cand_tokens") > 0L, col("lcs").cast("double") /
          col("cand_tokens").cast("double")).as("rouge_l_p"),
        when(col("cand_tokens") + col("ref_tokens") > 0L,
          (lit(2L) * col("lcs")).cast("double") /
            (col("cand_tokens") + col("ref_tokens")).cast("double"))
          .as("rouge_l_f1"))
  }

  /** ROUGE-N recall (Lin 2004), single-reference: per document the
    * clipped n-gram matches over the REFERENCE n-gram count — one
    * exact integer division per row; corpus ROUGE-N is the caller's
    * Σ matches / Σ ref_grams over this frame. Same scale shape as
    * [[corpusBleu]] (explode + keyed aggregate + same-id join).
    * @return per doc: (id, matches, ref_grams, rouge_n) */
  def rougeN(pairs: DataFrame, idCol: String, candCol: Column,
      refCol: Column, n: Int): DataFrame =
    clippedGramStats(pairs, idCol, candCol, refCol, Seq(n))
      .select(col("id"), col("matches"), col("ref_grams"),
        when(col("ref_grams") > 0L,
          col("matches").cast("double") / col("ref_grams").cast("double"))
          .as("rouge_n"))
}
