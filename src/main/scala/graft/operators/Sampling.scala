package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines
  * (north-star extension): train/val/test assignment and downsampling
  * keyed on a stable hash of the row id, never on an RNG.
  *
  * Why hash, not rand(): a training-data split must be REPRODUCIBLE —
  * the same document lands in the same split on every run, every engine,
  * any partitioning, and after incremental appends (new rows don't
  * reshuffle old assignments). `rand(seed)` gives none of that (it is
  * partitioning-dependent and engine-specific). md5 buckets give all of
  * it and are reproducible in the DuckDB oracle.
  *
  * Scale: assignment is a map-only projection — no shuffle, no state;
  * filters on the bucket push into the scan like any predicate.
  */
object Sampling {

  /** Stable bucket in [0, buckets): first 8 hex chars of md5 of the
    * value's string form, mod buckets. DuckDB-identical:
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT % buckets`. */
  def hashBucket(c: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Named split assignment by cumulative bucket ranges over a
    * 100-bucket hash, e.g. Seq("train" -> 80, "val" -> 10, "test" -> 10).
    * Weights must sum to 100. Adds `splitCol` to the frame. */
  def deterministicSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits need positive weights")
    require(splits.map(_._2).sum == 100,
      s"split weights must sum to 100, got ${splits.map(_._2).sum}")
    val b = hashBucket(col(idCol), 100)
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val expr = splits.zip(bounds).init.reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(b < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, expr)
  }

  /** Near-dup-aware train/val/test split — [[deterministicSplit]]
    * applied to the near-dup CLUSTER instead of the document: every
    * cluster lands atomically in ONE split, so no near-dup pair can
    * straddle a boundary and the leakage the q350 audit measures for
    * per-doc splits is zero BY CONSTRUCTION (Lee et al. 2021's
    * "dedup before you split" made structural). Documents in no pair
    * are their own singleton cluster; `cluster_id` is added alongside
    * `splitCol` so downstream stratification can see the grouping.
    *
    * Scale: one connected-components run over the PAIR table (pointer
    * jumping, edge-keyed shuffles — pairs ≪ corpus when dups are
    * rare), one id-keyed equi-join back onto the corpus, then the
    * same stateless md5-bucket assignment as the per-doc splitter. */
  def clusterAtomicSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Int)], splitCol: String = "split"): DataFrame = {
    val assign = Dedup.connectedComponents(pairs)
      .select(col("node").as(idCol), col("cluster").as("__cl"))
    val withCl = df.join(assign, Seq(idCol), "left")
      .withColumn("cluster_id",
        coalesce(col("__cl"), col(idCol).cast("long")))
      .drop("__cl")
    deterministicSplit(withCl, "cluster_id", splits, splitCol)
  }

  /** Deterministic downsample: keep rows whose hash bucket (out of
    * `outOf`) falls below `keep` — a stable `keep/outOf` fraction. */
  def hashSample(df: DataFrame, idCol: String, keep: Int,
      outOf: Int = 100): DataFrame = {
    require(keep >= 0 && keep <= outOf, s"keep ($keep) must be in [0, $outOf]")
    df.filter(hashBucket(col(idCol), outOf) < keep)
  }

  /** Mixture sampling: per-group (training-mix source) deterministic
    * selection in stable md5-of-id order until each group's cumulative
    * token count reaches `budget` (rows kept while the inclusive
    * running total <= budget). The data-mixture step of corpus
    * assembly: every source contributes a bounded, reproducible token
    * quota, stable across runs/engines/partitionings. (Unlike
    * hashSample, NOT append-stable: a fixed quota means a newly
    * appended doc that sorts early can displace a boundary doc —
    * inherent to quota sampling, not an implementation choice.)
    *
    * Adds `cumCol` (the running total) to the output. One window pass
    * partitioned by the group column — parallel across groups; a
    * single group's rows meet in one partition, which is the correct
    * grain (the running total is inherently sequential per group) and
    * bounded by the largest source, not the corpus. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokenCol: String,
      groupCol: String, budget: Long,
      cumCol: String = "cum_tokens"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")))
    df.withColumn(cumCol, sum(col(tokenCol)).over(w))
      .filter(col(cumCol) <= budget)
  }

  /** Exact-count stratified sample: the first `nPerStratum` ids of each
    * stratum in stable md5-of-id order — per-class balancing with a
    * deterministic, engine-reproducible pick (same hash-not-rand
    * reasoning as the splits above). Output: (stratum, rk, id), rk
    * 1-based within the stratum.
    *
    * Scale: implemented as a bounded-heap top-k per group (CollectTopK,
    * reverse=true keeps the k SMALLEST md5 keys), so the partial
    * (map-side) state is n items per stratum per partition and the
    * exchange carries n rows per stratum per partition — a
    * row_number-window form would shuffle and sort every row of every
    * stratum. The classic "sample n docs per language/source" step. */
  /** Temperature-scaled mixture quotas (the multilingual-sampling rule
    * of Conneau & Lample 2019 §3.1 / mT5: w_s ∝ N_s^τ): apportion a
    * document `budget` across the values of `groupCol` by the
    * τ-flattened size distribution, with Hamilton largest-remainder
    * rounding so the integer quotas sum EXACTLY to the budget
    * (remainder ties break on group name). τ = 1 is proportional,
    * τ → 0 uniform; 0.3–0.7 is the usual upsample-the-tail band.
    * Output: (group, n_docs, weight, quota).
    *
    * Scale: one map-side-combined count per group, then all arithmetic
    * runs on the #groups-sized aggregate — the remainder rank is a
    * groups² self-join (NOT a global window; #groups is mixture-sized,
    * a few dozen), and every scalar (Στ, Σfloor) is a broadcast-crossed
    * one-row aggregate. Feed the quotas to [[tokenBudgetSample]] /
    * [[stratifiedSample]] to materialize the actual selection. */
  def temperatureQuotas(df: DataFrame, groupCol: String, budget: Long,
      tau: Double): DataFrame = {
    require(budget > 0, s"budget ($budget) must be positive")
    require(tau > 0.0 && tau <= 1.0, s"tau ($tau) must be in (0, 1]")
    val counts = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_docs"))
    // τ = 0.5 routes through sqrt (correctly-rounded IEEE in every
    // engine) instead of pow (libm, build-dependent last ulps); the
    // group total folds over the SORTED weight list so the float sum
    // is order-deterministic — together they keep the whole quota
    // computation bit-reproducible cross-engine (q31/q60 discipline)
    def powTau(c: Column): Column =
      if (tau == 0.5) sqrt(c) else pow(c, tau)
    val tot = counts
      .agg(aggregate(sort_array(collect_list(powTau(col("n_docs")))),
        lit(0.0), (a, x) => a + x).as("__tot"))
    val f = counts.crossJoin(broadcast(tot))
      .withColumn("weight", powTau(col("n_docs")) / col("__tot"))
      .withColumn("__x", col("weight") * budget)
      .withColumn("__fq", floor(col("__x")))
      .withColumn("__rem", col("__x") - col("__fq"))
      .drop("__tot")
    val extra = f.agg((lit(budget) - sum(col("__fq"))).as("__extra"))
    val rhs = f.select(col("g").as("__g2"), col("__rem").as("__rem2"))
    val ranked = f.join(rhs,
        col("__rem2") > col("__rem") ||
          (col("__rem2") === col("__rem") && col("__g2") < col("g")),
        "left")
      .groupBy(col("g"), col("n_docs"), col("weight"), col("__fq"),
        col("__rem"))
      .agg(count(col("__g2")).as("__rk"))
    ranked.crossJoin(broadcast(extra))
      .select(col("g").as(groupCol), col("n_docs"), col("weight"),
        (col("__fq") + when(col("__rk") < col("__extra"), 1L)
          .otherwise(0L)).cast("long").as("quota"))
  }

  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      nPerStratum: Int): DataFrame = {
    require(nPerStratum > 0, "nPerStratum must be positive")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val item = struct(md5(col(idCol).cast("string")).as("k"),
      col(idCol).as("__id"))
    df.groupBy(col(stratumCol))
      .agg(ColumnBridge.collectTopK(item, nPerStratum, reverse = true)
        .as("__tk"))
      .select(col(stratumCol), posexplode(col("__tk")))
      .select(col(stratumCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.__id").as(idCol))
  }

  /** Deterministic weighted sample WITHOUT replacement: the k rows with
    * the smallest priority keys, where a row of integer weight w gets
    * priority = min over j in 1..w of md5hash60(id || ':' || j).
    *
    * This is the integer-weight form of exponential-key reservoir
    * sampling (Efraimidis–Spirakis A-ES): the minimum of w i.i.d.
    * uniform keys is what u^(1/w) simulates, so a weight-w row wins a
    * slot with the A-ES probability — but every key here is an exact
    * md5-derived INTEGER, so selection is bit-deterministic across
    * runs, engines, and partitionings (a float pow/ln key differs in
    * the last ulp between engines and can flip a boundary pick; see
    * the hash-not-rand note on [[hashBucket]]).
    *
    * Scale (100 TB): the explode fan-out is bounded by `maxWeight`
    * (weights clamp to [1, maxWeight]); the per-id min is a map-side
    * partial aggregate, and the final pick is one bounded-heap
    * CollectTopK — k items of state per partition, never a global
    * sort. Output: (rk, id, weight, priority), rk 1 = smallest key.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      maxWeight: Int = 1000): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxWeight >= 1, "maxWeight must be >= 1")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val w = least(greatest(weight.cast("long"), lit(1L)), lit(maxWeight.toLong))
    val pri = df
      .select(col(idCol), w.as("__w"))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(1L), col("__w"))).as("__j"))
      .select(col(idCol), col("__w"),
        Sketches.md5Hash60(
          concat(col(idCol).cast("string"), lit(":"),
            col("__j").cast("string"))).as("__h"))
      .groupBy(col(idCol), col("__w"))
      .agg(min(col("__h")).as("priority"))
    val item = struct(col("priority"), col(idCol), col("__w"))
    pri
      .agg(ColumnBridge.collectTopK(item, k, reverse = true).as("__tk"))
      .select(posexplode(col("__tk")))
      .select((col("pos") + 1).cast("long").as("rk"),
        col(s"col.$idCol").as(idCol), col("col.__w").as("weight"),
        col("col.priority").as("priority"))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * stable 1-based position by sorting on md5(seed || ':' || id) — the
    * "shuffle the corpus before sharding into training files" step,
    * reproducible across runs, engines, and partitionings (same
    * hash-not-rand reasoning as the splits above; a different seed is a
    * fresh epoch-independent permutation).
    *
    * Scale: one range-partitioned sort on uniform 128-bit keys (the
    * same primitive as Spark's global ORDER BY — skew-free by
    * construction), then positions via RowNumbers.global's two-pass
    * scheme: a numPartitions-row counts pass and a per-partition
    * window. Never a single-partition window. */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long,
      posCol: String = "pos"): DataFrame = {
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val ordered = df.withColumn("__ord", key)
      .repartitionByRange(col("__ord"))
      .sortWithinPartitions(col("__ord"))
    RowNumbers.global(ordered, posCol).drop("__ord")
  }

  /** Deterministic negative sampling for contrastive training: place
    * all rows on a pseudo-random RING (the [[trainingOrder]]
    * permutation keyed md5(seed:id)), then give each anchor its first
    * `k` successors within `lookahead` ring steps whose `groupCol`
    * differs (e.g. a different source/cluster — "hard enough"
    * negatives that are still guaranteed non-positives).
    *
    * Ring successors — not rand(): the sample is identical on every
    * run, partitioing, and engine (the md5 permutation is uniform, so
    * ring neighbors are a uniform draw without replacement), and each
    * row does O(lookahead) work. The distributed shape is the
    * standard "lead(N) without a single-partition window": explode
    * the `lookahead` offsets and equi-join probe position (pos-1+i)
    * mod n — one co-partitioned shuffle join, no global window. The
    * per-anchor rank window is bounded by `lookahead` rows.
    *
    * Returns (idCol, rank 1..≤k, offset, neg_id, neg_group); anchors
    * whose entire lookahead neighborhood shares their group emit
    * fewer than k rows (raise `lookahead` if that matters). */
  def ringNegatives(df: DataFrame, idCol: String, groupCol: String,
      k: Int = 3, lookahead: Int = 10, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(lookahead >= k,
      s"lookahead ($lookahead) must be >= k ($k)")
    import org.apache.spark.sql.expressions.Window
    val base = trainingOrder(df.select(col(idCol), col(groupCol)),
        idCol, seed, "__pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val n = base.count() // scalar job; also materializes the persist
    val probes = base
      .select(col("__pos"), col(idCol).as("__aid"),
        col(groupCol).as("__ag"))
      .withColumn("__i", explode(array((1 to lookahead).map(lit): _*)))
      .withColumn("__tpos", pmod(col("__pos") - 1 + col("__i"), lit(n)) + 1)
    val cands = base.select(col("__pos").as("__tpos"),
      col(idCol).as("__cid"), col(groupCol).as("__cg"))
    val w = Window.partitionBy(col("__aid")).orderBy(col("__i"))
    probes.join(cands, Seq("__tpos"))
      .filter(col("__cg") =!= col("__ag"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__aid").as(idCol), col("rank"),
        col("__i").as("offset"), col("__cid").as("neg_id"),
        col("__cg").as("neg_" + groupCol))
  }

  /** Deterministic-hash bootstrap confidence interval for a mean —
    * uncertainty quantification as a pipeline operator. Each of `b`
    * replicates is a ~50% Bernoulli subsample selected by the stable
    * md5 bucket of (id·2b + replicate) — no RNG state, so the
    * replicate membership (and therefore every output bit) is
    * reproducible across runs, partitionings, and engines. Per
    * replicate the metric is the mean of `cents` (an exact BIGINT sum
    * over an exact count, one final division); the interval is the
    * (lo+1)-th and (b−lo)-th ORDER STATISTICS of the b replicate
    * means — selection, not interpolation, so no quantile-definition
    * skew against the oracle.
    *
    * Scale: one map pass fans each row out b ways but the aggregate
    * has exactly b groups — map-side partial collapse makes the
    * shuffle b·partitions rows. b is a constant (40–200); the whole
    * operator is one pass over the data regardless of size. Classic
    * m-out-of-n Bernoulli bootstrap (Bickel et al.; Kleiner's BLB is
    * the heavier cousin) — the half-sample variant keeps membership a
    * pure hash predicate.
    *
    * @param idCol  integral id column (hash seed)
    * @param cents  exact integral metric column (pre-scale money)
    * @param b      replicate count
    * @param lo     order-statistic depth for the interval (default 1:
    *               with b=40 that is the 2nd smallest / 2nd largest,
    *               the ~5th/~95th percentile, a ~90% central
    *               interval; lo=0 with b=40 gives ~95%)
    * @return one row: (b, n_full, mean_full, ci_lo, ci_hi)
    */
  def bootstrapCi(df: DataFrame, idCol: String, cents: Column,
      b: Int = 40, lo: Int = 1): DataFrame = {
    require(b >= 4 && lo >= 0 && 2 * lo < b, s"bad bootstrap params ($b, $lo)")
    val reps = df.select(col(idCol).cast("long").as("__id"),
        cents.cast("long").as("__c"))
      .select(col("__id"), col("__c"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
      .filter(hashBucket(col("__id") * (2 * b) + col("r"), 2) === 0)
      .groupBy(col("r"))
      .agg(sum(col("__c")).as("s"), count(lit(1)).as("n"))
      .select((col("s").cast("double") / col("n").cast("double")).as("m"))
    val ciLo = reps.orderBy(col("m")).limit(lo + 1)
      .orderBy(col("m").desc).limit(1).select(col("m").as("ci_lo"))
    val ciHi = reps.orderBy(col("m").desc).limit(lo + 1)
      .orderBy(col("m")).limit(1).select(col("m").as("ci_hi"))
    val full = df.select(cents.cast("long").as("__c"))
      .agg(sum(col("__c")).as("s"), count(lit(1)).as("n"))
      .select(lit(b).cast("long").as("b"), col("n").as("n_full"),
        (col("s").cast("double") / col("n").cast("double")).as("mean_full"))
    full.crossJoin(ciLo).crossJoin(ciHi)
  }
}
