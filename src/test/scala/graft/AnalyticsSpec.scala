package graft

import org.apache.spark.sql.functions._

import graft.expressions.BloomUtil
import graft.operators.{Quantiles, RuntimeFilter}

/** Round-4 analytics operators: bloom runtime filters and exact
  * distributed quantiles. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ bloom core

  test("bloom has no false negatives and a sane false-positive rate") {
    val numBits = 1 << 16
    val numHashes = 5
    val words = new Array[Long](BloomUtil.wordsFor(numBits))
    val n = 5000
    (1 to n).foreach(i => BloomUtil.add(words, numBits, numHashes, i.toLong * 7919L))
    // every inserted key answers true — bloom's defining guarantee
    (1 to n).foreach { i =>
      assert(BloomUtil.mightContain(words, numBits, numHashes, i.toLong * 7919L))
    }
    // disjoint probe set: fpp theory (1-e^{-kn/m})^k ~ 0.9% at
    // m/n=13.1, k=5; assert under 3x that
    val fps = (1 to 10000).count(i =>
      BloomUtil.mightContain(words, numBits, numHashes, -i.toLong * 104729L))
    assert(fps < 10000 * 0.03, s"false-positive count $fps too high")
  }

  test("bloom build aggregate is partitioning-invariant (OR-merge)") {
    val keys = (1L to 2000L).toDF("k")
    def build(parts: Int): Array[Byte] = keys.repartition(parts)
      .select(org.apache.spark.sql.graftshim.ColumnBridge.column(
        graft.expressions.BloomBuildAggregate(
          org.apache.spark.sql.graftshim.ColumnBridge.expression(
            xxhash64(col("k"))), 1 << 14, 5).toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
    build(1).toSeq shouldBe build(13).toSeq
  }

  // ------------------------------------------------- bloomSemiJoin

  test("bloomSemiJoin equals a plain left-semi join") {
    val fact = (1L to 3000L).map(i => (i, i % 100)).toDF("id", "key")
    val dim = Seq(3L, 17L, 42L, 99L).toDF("dkey")
    val got = RuntimeFilter.bloomSemiJoin(fact, "key", dim, "dkey")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = fact.join(dim, fact("key") === dim("dkey"), "left_semi")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe want
    got.length shouldBe 3000 / 100 * 4
  }

  test("bloomSemiJoin probes the bloom BELOW any exchange (map-side)") {
    // parquet-backed fact: a local Seq would be folded by
    // ConvertToLocalRelation and the probe filter evaluated at plan time
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (1L to 3000L).map(i => (i, i % 100)).toDF("id", "key")
      .write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq(3L, 17L).toDF("dkey")
    val plan0 = graft.operators.RuntimeFilter
      .bloomSemiJoin(fact, "key", dim, "dkey")
      .queryExecution.executedPlan
    val plan = plan0 match { // AQE wrapper hides the physical tree
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val bloomFilters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.find(
            _.isInstanceOf[graft.expressions.BloomMightContain]).isDefined => f
    }
    bloomFilters should not be empty
    // the probe's subtree reaches the source with no shuffle in between
    bloomFilters.foreach { f =>
      f.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      } shouldBe empty
    }
  }

  test("bloomSemiJoin with an empty dim side returns nothing") {
    val fact = (1L to 50L).toDF("key")
    val dim = Seq.empty[Long].toDF("dkey")
    RuntimeFilter.bloomSemiJoin(fact, "key", dim, "dkey")
      .count() shouldBe 0L
  }

  test("bloomSemiJoin handles string keys and null fact keys") {
    val fact = Seq(Some("a"), Some("b"), None, Some("c"), Some("a"))
      .toDF("key")
    val dim = Seq("a", "c", "zz").toDF("dkey")
    val got = RuntimeFilter.bloomSemiJoin(fact, "key", dim, "dkey")
      .collect().map(_.getString(0)).sorted
    got shouldBe Array("a", "a", "c")
  }

  // ------------------------------------------------------ quantiles

  test("exactPercentiles matches the sorted-array reference") {
    val values = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 8.0, 13.0, 1.0, 3.0, 7.0)
    val df = values.toDF("v")
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Quantiles.exactPercentiles(df, "v", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val sorted = values.sorted
    qs.foreach { q =>
      val rank = math.max(1, math.ceil(q * values.size).toInt)
      got(q) shouldBe sorted(rank - 1)
    }
  }

  test("exactPercentiles is partitioning-invariant and skips nulls") {
    val df = ((1 to 1000).map(i => Some(i.toDouble)) ++
      Seq.fill(50)(Option.empty[Double])).toDF("v")
    def run(parts: Int) = Quantiles.exactPercentiles(
        df.repartition(parts), "v", Seq(0.5, 0.99))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val one = run(1)
    one shouldBe run(7)
    // 1000 non-null values: median = 500, p99 = 990
    one shouldBe Seq((0.5, 500L, 500.0), (0.99, 990L, 990.0))
  }

  test("exactPercentilesByGroup matches per-group sorted references") {
    val df = (Seq.fill(10)("a").zipWithIndex.map { case (g, i) => (g, (i + 1).toDouble) } ++
      Seq.fill(4)("b").zipWithIndex.map { case (g, i) => (g, (i + 1) * 100.0) })
      .toDF("g", "v")
    val got = graft.operators.Quantiles
      .exactPercentilesByGroup(df, "g", "v", Seq(0.25, 0.5, 1.0))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3)))
      .toMap
    // group a: 1..10; group b: 100,200,300,400
    got(("a", 0.25)) shouldBe 3.0 // ceil(2.5) = 3
    got(("a", 0.5)) shouldBe 5.0
    got(("a", 1.0)) shouldBe 10.0
    got(("b", 0.25)) shouldBe 100.0
    got(("b", 0.5)) shouldBe 200.0
    got(("b", 1.0)) shouldBe 400.0
  }

  // --------------------------------------------------- winsorize

  test("winsorize clamps to exact percentile cutoffs") {
    // values 1..100: p05 cutoff = 5, p95 cutoff = 95
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = graft.operators.Quantiles.winsorize(df, "v", 0.05, 0.95)
    val got = w.select(col("v"), col("v_w")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    got(1.0) shouldBe 5.0
    got(4.0) shouldBe 5.0
    got(5.0) shouldBe 5.0
    got(50.0) shouldBe 50.0
    got(96.0) shouldBe 95.0
    got(100.0) shouldBe 95.0
  }

  test("madOutlierCensus flags the planted spike, not the bulk") {
    // group a: 1..9 plus a 1000 spike -> median 5, MAD 2,
    // z(1000) = 0.6745*995/2 >> 3.5, z(bulk) <= 0.6745*4/2 = 1.35
    // group b: majority at one value -> MAD 0 -> any deviation flags
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1000.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 7.0))
    val out = Quantiles.madOutlierCensus(df.toDF("g", "x"), "g", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    out("a") shouldBe ((10L, 5.0, 2.0, 1L))
    out("b") shouldBe ((4L, 5.0, 0.0, 1L))
  }

  test("madOutlierCensus ignores nulls and is partitioning-invariant") {
    val df = (Seq(("a", Some(3.0)), ("a", None), ("a", Some(4.0)),
      ("a", Some(5.0)), ("a", Some(500.0)))).toDF("g", "x")
    def run(parts: Int) =
      Quantiles.madOutlierCensus(df.repartition(parts), "g", "x")
        .collect().toSeq
    run(1) shouldBe run(7)
    val r = run(1).head
    r.getLong(1) shouldBe 4L // null row excluded
    r.getLong(4) shouldBe 1L // the 500 spike
  }

  // --------------------------------------------- point in polygon

  test("pointInPolygon matches brute-force on a grid of points") {
    // CCW unit-ish triangles at assorted offsets, cellSize smaller
    // than the triangles so bbox cell explosion is exercised
    val polys = Seq(
      (1L, Seq((0.0, 0.0), (10.0, 0.0), (0.0, 8.0))),
      (2L, Seq((-20.0, -20.0), (-5.0, -20.0), (-20.0, -5.0))),
      (3L, Seq((30.0, 30.0), (42.0, 30.0), (30.0, 39.0))))
      .map { case (id, vs) => (id, vs.map(p => (p._1, p._2))) }
      .toDF("gid", "raw")
      .select(col("gid"), expr(
        "transform(raw, p -> struct(p._1 as x, p._2 as y))").as("verts"))
    val points = (for (x <- -25 to 45 by 2; y <- -25 to 45 by 2)
      yield (x.toLong * 1000 + y, x.toDouble, y.toDouble))
      .toDF("pid", "px", "py")
    val got = graft.operators.SpatialJoin.pointInPolygon(
        points, polys, "pid", "gid", "px", "py", "verts", cellSize = 4.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force in Scala: boundary-inclusive CCW half-plane test
    val triList = Seq(
      (1L, Seq((0.0, 0.0), (10.0, 0.0), (0.0, 8.0))),
      (2L, Seq((-20.0, -20.0), (-5.0, -20.0), (-20.0, -5.0))),
      (3L, Seq((30.0, 30.0), (42.0, 30.0), (30.0, 39.0))))
    def inside(px: Double, py: Double, vs: Seq[(Double, Double)]) =
      vs.indices.forall { i =>
        val (ax, ay) = vs(i); val (bx, by) = vs((i + 1) % vs.size)
        (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
      }
    val want = (for {
      (gid, vs) <- triList
      r <- points.collect()
      if inside(r.getDouble(1), r.getDouble(2), vs)
    } yield (r.getLong(0), gid)).toSet
    got shouldBe want
    want should not be empty
  }

  test("pointInPolygon is boundary-inclusive") {
    val polys = Seq((1L, Seq((0.0, 0.0), (4.0, 0.0), (0.0, 4.0))))
      .toDF("gid", "raw")
      .select(col("gid"), expr(
        "transform(raw, p -> struct(p._1 as x, p._2 as y))").as("verts"))
    val points = Seq((1L, 0.0, 0.0), (2L, 2.0, 2.0), (3L, 2.0, 0.0),
      (4L, 2.1, 2.0), (5L, 5.0, 5.0)).toDF("pid", "px", "py")
    val got = graft.operators.SpatialJoin.pointInPolygon(
        points, polys, "pid", "gid", "px", "py", "verts", cellSize = 10.0)
      .collect().map(_.getLong(0)).toSet
    // vertex, hypotenuse midpoint, edge midpoint are in; outside out
    got shouldBe Set(1L, 2L, 3L)
  }

  test("sampleQuantilesByGroup: exact below k, deterministic above it") {
    val df = (Seq.tabulate(300)(i => ("a", i.toLong, (i + 1).toDouble)) ++
      Seq.tabulate(8)(i => ("b", 1000L + i, (i + 1) * 10.0)))
      .toDF("g", "id", "v")
    def run(parts: Int) = Quantiles.sampleQuantilesByGroup(
        df.repartition(parts), "g", "v", col("id"), k = 50,
        qs = Seq(0.5, 1.0))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3)))
      .toMap
    val got = run(1)
    // group b has 8 < k rows: the "sample" is the whole group -> exact
    got(("b", 0.5)) shouldBe 40.0
    got(("b", 1.0)) shouldBe 80.0
    // group a is subsampled (50 of 300): the result is a sample
    // quantile, but DETERMINISTIC — identical across partitionings,
    // and its max can never exceed the true max
    run(7) shouldBe got
    got(("a", 1.0)) should be <= 300.0
    // a 50-row uniform sample's median lands near the true median 150
    // with overwhelming margin (rank error O(n/sqrt(k)))
    got(("a", 0.5)) should (be >= 50.0 and be <= 250.0)
  }

  test("exactPercentiles with heavy duplicates lands on set values") {
    // 90 copies of 1.0, 10 copies of 2.0: p90 -> rank 90 -> 1.0,
    // p91 -> rank 91 -> 2.0
    val df = (Seq.fill(90)(1.0) ++ Seq.fill(10)(2.0)).toDF("v")
    val got = Quantiles.exactPercentiles(df, "v", Seq(0.9, 0.91))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    got(0.9) shouldBe 1.0
    got(0.91) shouldBe 2.0
  }

  test("feature encoding: frequency shares and smoothed target means") {
    import graft.operators.FeatureEncoding
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 100L))
      .toDF("cat", "y")
    val fe = FeatureEncoding.frequencyEncode(df, "cat")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    fe("a") shouldBe ((3L, 0.75))
    fe("b") shouldBe ((1L, 0.25))
    // smoothing m=2: mu = 160/4 = 40
    // enc(a) = (60 + 2*40) / (3+2) = 28; enc(b) = (100+80)/3 = 60
    val te = FeatureEncoding.targetEncode(df, "cat", "y", smoothing = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    te("a") shouldBe 28.0
    te("b") shouldBe 60.0
    // m=0 degenerates to the raw category mean
    val raw = FeatureEncoding.targetEncode(df, "cat", "y", smoothing = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    raw("a") shouldBe 20.0
    // rare category shrinks toward mu as m grows
    val heavy = FeatureEncoding.targetEncode(df, "cat", "y",
      smoothing = 1000).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    math.abs(heavy("b") - 40.0) should be < 1.0
  }

  test("weightedPercentilesByGroup: mass-weighted rank lookup") {
    // group g: value 10 carries weight 1, value 20 weight 8, 30 weight 1
    // -> W=10; p50 rank 5 lands in 20's mass [2,9]; p95 rank 10 -> 30
    val df = Seq(("g", 10L, 1L), ("g", 20L, 8L), ("g", 30L, 1L))
      .toDF("grp", "v", "w")
    val got = Quantiles.weightedPercentilesByGroup(df, "grp", "v", "w",
        Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(1) -> r.getLong(3)).toMap
    got(0.5) shouldBe 20L
    got(0.95) shouldBe 30L
    // unweighted row-median would have been 20 too, but p95 row-wise
    // is 30 only because the tail weight is 1 row; check a case where
    // weighting actually flips the median
    val skew = Seq(("h", 10L, 1L), ("h", 20L, 1L), ("h", 30L, 98L))
      .toDF("grp", "v", "w")
    Quantiles.weightedPercentilesByGroup(skew, "grp", "v", "w", Seq(0.5))
      .collect()(0).getLong(3) shouldBe 30L // 98% of mass sits at 30
    Quantiles.exactPercentilesByGroup(skew, "grp", "v", Seq(0.5))
      .collect()(0).getLong(3) shouldBe 20L // row-median says 20
  }

  test("equiDepthBuckets: ~n/k per bucket, duplicate-safe") {
    val v = ((1L to 100L) ++ Seq.fill(100)(42L)).map(Tuple1(_)).toDF("v")
    val out = Quantiles.equiDepthBuckets(v, "v", 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // n=200, k=4: the 101-copy value 42 swallows the middle; buckets
    // are contiguous, cover all values, and masses are as equal as
    // the duplicate block allows
    out.map(_._1).toSeq shouldBe out.map(_._1).toSeq.sorted
    out.map(_._2).sum shouldBe 200L
    out.foreach { case (_, _, lo, hi) => lo should be <= hi }
    // every row of the dup block lands in ONE bucket (value-determined,
    // not row-order-determined like ntile)
    val dupBucket = out.filter(b => b._3 <= 42L && 42L <= b._4)
    dupBucket.length shouldBe 1
    dupBucket(0)._2 should be >= 101L
  }

  test("skyline frontier2D: hand-computed frontier, ties, invariance") {
    import graft.operators.Skyline
    val pts = Seq(
      (10L, 5L), (10L, 3L),  // x-tie: only max y survives
      (8L, 7L), (8L, 7L),    // duplicate frontier point collapses
      (6L, 7L),              // equal y at lower x -> dominated
      (5L, 9L), (3L, 1L),    // (3,1) dominated by everything
      (1L, 12L)
    ).toDF("x", "y")
    val got = Skyline.frontier2D(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    got shouldBe Seq((1L, 12L), (5L, 9L), (8L, 7L), (10L, 5L))
    // partitioning invariance (prefix table must stitch correctly)
    Skyline.frontier2D(pts.repartition(7), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq shouldBe got
    // single point and empty input
    Skyline.frontier2D(Seq((1L, 1L)).toDF("x", "y"), "x", "y")
      .count() shouldBe 1L
    Skyline.frontier2D(Seq.empty[(Long, Long)].toDF("x", "y"), "x", "y")
      .count() shouldBe 0L
  }

  // ------------------------------------------------- evaluation ops

  test("rocAuc: hand-counted wins/ties and the perfect-separation case") {
    import graft.operators.Evaluation
    // pos scores 3,3,2; neg scores 1,3: 3 wins + 2 ties of 6 pairs
    val df = Seq((true, 3L), (true, 3L), (true, 2L), (false, 1L),
      (false, 3L)).toDF("pos", "score")
    val r = Evaluation.rocAuc(df, col("pos"), col("score")).head()
    r.getLong(0) shouldBe 3L // n_pos
    r.getLong(1) shouldBe 2L // n_neg
    r.getLong(2) shouldBe 8L // u2 = 2*(3 wins) + 2 ties
    r.getDouble(3) shouldBe (8.0 / 12.0)
    // perfect separation -> auc exactly 1
    val sep = Seq((true, 10L), (true, 9L), (false, 2L), (false, 1L))
      .toDF("pos", "score")
    Evaluation.rocAuc(sep, col("pos"), col("score"))
      .head().getDouble(3) shouldBe 1.0
  }

  test("rocAuc is partitioning-invariant") {
    import graft.operators.Evaluation
    val df = (1 to 500).map(i => (i % 3 == 0, (i * 37 % 101).toLong))
      .toDF("pos", "score")
    val a = Evaluation.rocAuc(df, col("pos"), col("score")).head()
    val b = Evaluation.rocAuc(df.repartition(13), col("pos"),
      col("score")).head()
    a shouldBe b
  }

  test("welchTTest matches the hand-derived moments formula") {
    import graft.operators.Evaluation
    val df = Seq(("a", 100L), ("a", 200L), ("a", 300L),
      ("b", 400L), ("b", 500L), ("b", 600L)).toDF("g", "v")
    val r = Evaluation.welchTTest(df, "g", "v", "a", "b").head()
    r.getLong(0) shouldBe 3L
    r.getDouble(2) shouldBe 200.0 // mean_a
    r.getDouble(4) shouldBe 10000.0 // var_a
    r.getDouble(6) shouldBe -3.674234614174767 +- 1e-12 // t
    r.getDouble(7) shouldBe 4.0 +- 1e-12 // dof
  }

  test("chiSquare: zero on independence, known value on a 2x2") {
    import graft.operators.Evaluation
    // perfectly independent 2x2 (all cells 5): chi2 == 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    Evaluation.chiSquare(ind, "a", "b").head().getDouble(4) shouldBe 0.0
    // [[10,20],[20,10]]: chi2 = 20/3, dof = 1
    val sk = (Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val r = Evaluation.chiSquare(sk, "a", "b").head()
    r.getLong(3) shouldBe 1L
    r.getDouble(4) shouldBe 6.666666666666667 +- 1e-12
  }

  test("giniByGroup: equality -> 0, known set -> 0.25, tie-safe") {
    import graft.operators.Evaluation
    val df = (Seq.fill(4)(("eq", 7L)) ++
      Seq(1L, 2L, 3L, 4L).map(("kn", _))).toDF("g", "v")
    val got = Evaluation.giniByGroup(df, "g", "v")
      .orderBy("g").collect()
    got(0).getDouble(3) shouldBe 0.0 // all-equal group
    got(1).getDouble(3) shouldBe 0.25 // (2*30 - 5*10) / (4*10)
    // duplicate-heavy input: invariant under repartitioning
    val dup = (1 to 300).map(i => ("d", (i % 7).toLong + 1))
      .toDF("g", "v")
    Evaluation.giniByGroup(dup, "g", "v").head() shouldBe
      Evaluation.giniByGroup(dup.repartition(11), "g", "v").head()
  }

  test("isotonic PAVA: hand case, reference equality, monotone output") {
    import graft.operators.Isotonic
    // classic violation: y = 1,3,2 -> blocks [1][3,2] -> 1, 2.5, 2.5
    val hand = Seq((1L, 1L, 1L), (1L, 2L, 3L), (1L, 3L, 2L))
      .toDF("g", "x", "y")
    Isotonic.fitByGroup(hand, "g", "x", "y").orderBy("x")
      .select("fit").as[Double].collect().toSeq shouldBe
      Seq(1.0, 2.5, 2.5)
    // already monotone input is returned unchanged
    val mono = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
      .toDF("g", "x", "y")
    Isotonic.fitByGroup(mono, "g", "x", "y").orderBy("x")
      .select("fit").as[Double].collect().toSeq shouldBe
      Seq(10.0, 20.0, 30.0)
    // pseudorandom: output non-decreasing per group, weighted mean
    // preserved (PAVA projects onto the monotone cone), invariance
    val rnd = (1 to 400).map { i =>
      (i % 4 + 1L, (i * 17 % 50).toLong, (i * 31 % 97).toLong)
    }.toDF("g", "x", "y")
    val fit = Isotonic.fitByGroup(rnd, "g", "x", "y")
    val byG = fit.orderBy("g", "x")
      .select("g", "fit").as[(Long, Double)].collect()
    byG.toSeq.sliding(2).foreach {
      case Seq((g1, f1), (g2, f2)) =>
        if (g1 == g2) f1 should be <= f2
      case _ =>
    }
    // Σ w·fit == Σ y within each group (mean preservation)
    val sums = fit.groupBy("g")
      .agg(sum(col("w").cast("double") * col("fit")).as("sf"))
      .as[(Long, Double)].collect().toMap
    val raw = rnd.groupBy("g").agg(sum("y")).as[(Long, Long)]
      .collect().toMap
    sums.foreach { case (g, sf) => sf shouldBe raw(g).toDouble +- 1e-6 }
    Isotonic.fitByGroup(rnd.repartition(13), "g", "x", "y")
      .orderBy("g", "x").collect() shouldBe
      fit.orderBy("g", "x").collect()
  }

  test("gainsChart: deciles partition rows, top bucket leads the gain") {
    import graft.operators.Evaluation
    // 100 rows, scores 1..100, positives = top 20 scores
    val df = (1 to 100).map(i => (i > 80, i.toLong)).toDF("pos", "score")
    val got = Evaluation.gainsChart(df, col("pos"), col("score"), 10)
      .orderBy("bucket").collect()
    got.length shouldBe 10
    got.map(_.getLong(1)).sum shouldBe 100L // n_rows partition the data
    val top = got.last
    top.getLong(0) shouldBe 10L
    top.getLong(2) shouldBe 10L // bucket 10 all positive
    top.getDouble(3) shouldBe 1.0 // rate
    top.getDouble(4) shouldBe 5.0 // lift = 1.0 / 0.2 base rate
    top.getLong(5) shouldBe 10L // cum_pos from the top = itself
    top.getDouble(6) shouldBe 0.5 // half the positives in the top decile
    // cumulative gain reaches 1.0 at the bottom bucket
    got.head.getDouble(6) shouldBe 1.0
  }

  test("concentrationByGroup: uniform vs single-category extremes") {
    import graft.operators.Evaluation
    val df = ((1 to 4).map(i => ("uni", "c" + i)) ++
      Seq.fill(5)(("one", "only"))).toDF("g", "cat")
    val got = Evaluation.concentrationByGroup(df, "g", "cat")
      .orderBy("g").collect()
    // "one": 5 of one category -> simpson 1, hhi 1, top_share 1
    got(0).getDouble(6) shouldBe 1.0
    got(0).getDouble(7) shouldBe 1.0
    got(0).getDouble(8) shouldBe 1.0
    // "uni": 4 distinct singletons -> simpson 0, hhi 1/4, share 1/4
    got(1).getDouble(6) shouldBe 0.0
    got(1).getDouble(7) shouldBe 0.25
    got(1).getDouble(8) shouldBe 0.25
  }

  test("rocAucByGroup matches ungrouped rocAuc per stratum") {
    import graft.operators.Evaluation
    val df = (1 to 600).map { i =>
      (i % 3, i % 7 == 0, (i * 37 % 101).toLong)
    }.toDF("g", "pos", "score")
    val grouped = Evaluation.rocAucByGroup(df, "g", col("pos"),
      col("score")).orderBy("g").collect()
    for (g <- 0 to 2) {
      val single = Evaluation.rocAuc(df.filter(col("g") === g),
        col("pos"), col("score")).head()
      grouped(g).getLong(1) shouldBe single.getLong(0)
      grouped(g).getLong(3) shouldBe single.getLong(2) // u2
      grouped(g).getDouble(4) shouldBe single.getDouble(3)
    }
  }

  test("ksTest: identical samples -> D=0; disjoint ranges -> D=1") {
    import graft.operators.Evaluation
    val same = ((1 to 50).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", i.toLong))).toDF("g", "v")
    val r0 = Evaluation.ksTest(same, "g", "v", "a", "b").head()
    r0.getLong(2) shouldBe 0L
    r0.getDouble(3) shouldBe 0.0
    val disj = ((1 to 30).map(i => ("a", i.toLong)) ++
      (1 to 40).map(i => ("b", i + 1000L))).toDF("g", "v")
    val r1 = Evaluation.ksTest(disj, "g", "v", "a", "b").head()
    r1.getLong(0) shouldBe 30L
    r1.getLong(1) shouldBe 40L
    r1.getDouble(3) shouldBe 1.0
    // hand case: a={1,2}, b={2,3}: D at v=1 is |1*2-0*2|=2 -> 2/4=0.5
    val hand = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    Evaluation.ksTest(hand, "g", "v", "a", "b").head()
      .getDouble(3) shouldBe 0.5
  }

  test("spearmanByGroup: monotone rho=1, reversed rho=-1, ties exact") {
    import graft.operators.Evaluation
    val mono = (1 to 100).map(i => ("a", i.toLong, (i * 3 + 7).toLong))
    val rev = (1 to 100).map(i => ("b", i.toLong, (1000 - i).toLong))
    val df = (mono ++ rev).toDF("g", "x", "y")
    val got = Evaluation.spearmanByGroup(df, "g", col("x"), col("y"))
      .orderBy("g").collect()
    got(0).getDouble(7) shouldBe 1.0
    got(1).getDouble(7) shouldBe -1.0
    // tie case vs scipy-checked value: x=(1,2,2,3), y=(1,3,2,4)
    val ties = Seq(("t", 1L, 1L), ("t", 2L, 3L), ("t", 2L, 2L),
      ("t", 3L, 4L)).toDF("g", "x", "y")
    val r = Evaluation.spearmanByGroup(ties, "g", col("x"),
      col("y")).head() // doubled ranks u=(2,5,5,8), v=(2,6,4,8)
    r.getDouble(7) shouldBe 0.9486832980505138 +- 1e-12
  }

  test("mannKendall: increasing S=C(n,2); constant S=0 z=0") {
    import graft.operators.TimeSeries
    val inc = (1 to 10).map(i => ("a", i.toLong, (i * 5).toLong))
    val const = (1 to 10).map(i => ("b", i.toLong, 42L))
    val df = (inc ++ const).toDF("g", "x", "y")
    val got = TimeSeries.mannKendall(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    got(0).getLong(2) shouldBe 45L // C(10,2)
    got(0).getLong(3) shouldBe 10L * 9 * 25 // no ties
    got(0).getDouble(4) should be > 0.0
    got(1).getLong(2) shouldBe 0L
    got(1).getLong(3) shouldBe 0L // full tie cancels var18
    got(1).getDouble(4) shouldBe 0.0
  }

  test("theilSen: hand case picks lower-median rational slope") {
    import graft.operators.TimeSeries
    // pairs: (1,2)->2/1, (1,3)->1/2, (2,3)->-1/1; sorted -1,0.5,2
    val df = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L))
      .toDF("g", "x", "y")
    val r = TimeSeries.theilSen(df, Seq("g"), col("x"), col("y"))
      .head()
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 1L // num
    r.getLong(3) shouldBe 2L // den
    r.getDouble(4) shouldBe 0.5
  }

  test("kaplanMeier: textbook case with censoring and at-risk ties") {
    import graft.operators.Evaluation
    // durations (event=true): 1, 3, 3; censored: 2, 4
    // t=1: n=5 d=1 -> S=0.8
    // t=3: n=3 (the censored-at-2 subject left) d=2 -> S=0.8*(1/3)
    val df = Seq((1L, true), (3L, true), (3L, true), (2L, false),
      (4L, false)).map { case (t, e) => ("a", t, e) }
      .toDF("g", "dur", "ev")
    val got = Evaluation.kaplanMeier(df, "g", col("dur"), col("ev"))
      .orderBy("t").as[(String, Long, Long, Long, Double)].collect()
    got shouldBe Array(
      ("a", 1L, 1L, 5L, 0.8),
      ("a", 3L, 2L, 3L, 0.8 * (1.0 - 2.0 / 3.0)))
    // all-censored group emits no steps
    Evaluation.kaplanMeier(
      Seq(("b", 1L, false)).toDF("g", "dur", "ev"), "g",
      col("dur"), col("ev")).count() shouldBe 0L
  }

  test("changepoint: clean level shift found at the true split") {
    import graft.operators.TimeSeries
    // 5 points at 10, then 5 points at 100 -> split after k=5
    val df = ((1 to 5).map(i => ("a", i.toLong, 10L)) ++
      (6 to 10).map(i => ("a", i.toLong, 100L)))
      .toDF("g", "x", "y")
    val r = TimeSeries.changepoint(df, Seq("g"), col("x"), col("y"))
      .head()
    r.getLong(1) shouldBe 10L
    r.getLong(2) shouldBe 5L
    r.getLong(3) shouldBe 5L // split_x
    r.getDouble(4) shouldBe 0.0 // both segments constant
  }

  test("giniSplitByGroup: perfect separation finds the clean cut") {
    import graft.operators.Evaluation
    // labels flip exactly at t=5: the stump must split there, gini 0
    val df = ((1 to 5).map(i => ("a", false, i.toLong)) ++
      (6 to 10).map(i => ("a", true, i.toLong))).toDF("g", "y", "t")
    val r = Evaluation.giniSplitByGroup(df, "g", col("y"), col("t"))
      .head()
    r.getLong(3) shouldBe 5L // split_t
    r.getLong(4) shouldBe 5L // nl
    r.getLong(5) shouldBe 0L // pl
    r.getDouble(6) shouldBe 0.0
  }

  test("interArrivalStats: metronomic B=-1, known two-gap case") {
    import graft.operators.EventAnalytics
    import java.sql.Timestamp
    def ev(rows: (Long, Long, Long)*) = rows.map { case (u, id, sec) =>
      (u, id, new Timestamp(sec * 1000L))
    }.toDF("user_id", "event_id", "ts")
    // user 1: constant 10s gaps -> cv2 = 0, burstiness = -1
    // user 2: gaps 10s, 30s -> mean 20s, cv2 = 2*(100+900)/1600-1 = 0.25
    // user 3: single event -> no row
    val df = ev((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 20L),
      (2L, 4L, 0L), (2L, 5L, 10L), (2L, 6L, 40L), (3L, 7L, 5L))
    val got = EventAnalytics
      .interArrivalStats(df, "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
    got.length shouldBe 2
    got(0).getDouble(4) shouldBe 0.0 // cv2
    got(0).getDouble(5) shouldBe -1.0 // burstiness
    got(1).getLong(1) shouldBe 2L
    got(1).getDouble(3) shouldBe 20e6 // mean gap in us
    got(1).getDouble(4) shouldBe 0.25 +- 1e-12
    val b = (math.sqrt(0.25) - 1) / (math.sqrt(0.25) + 1)
    got(1).getDouble(5) shouldBe b +- 1e-12
  }

  test("trimmedMeanByGroup: drops exactly floor(trim*n) per tail") {
    // group a: values 1..10, trim 0.1 -> lo=1, hi=9 -> keep 2..9,
    // sum 44, mean 5.5; ties: group b all same value
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 4).map(_ => ("b", 7L))).toDF("g", "v")
    val got = Quantiles.trimmedMeanByGroup(df, "g", "v", 0.1)
      .orderBy("g").as[(String, Long, Long, Long, Double)]
      .collect().toSeq
    got shouldBe Seq(
      ("a", 10L, 8L, 44L, 5.5),
      ("b", 4L, 4L, 28L, 7.0)) // floor(0.4)=0 dropped
    // trim 0 == plain mean
    Quantiles.trimmedMeanByGroup(df.filter($"g" === "a"), "g", "v", 0.0)
      .head().getDouble(4) shouldBe 5.5
  }

  test("trimmedMeanByGroup: duplicates split across the cut") {
    // 1,2,2,2,3 with trim .2 -> lo=1 hi=4 -> keep ranks 2..4 = 2,2,2
    val df = Seq(1L, 2L, 2L, 2L, 3L).map(("g", _)).toDF("g", "v")
    val got = Quantiles.trimmedMeanByGroup(df, "g", "v", 0.2).head()
    got.getLong(2) shouldBe 3L
    got.getLong(3) shouldBe 6L
    got.getDouble(4) shouldBe 2.0
  }

  test("interpolateLinear: interior gap, edges, all-null key") {
    import graft.operators.TimeSeries
    val df = Seq(
      ("k", 0L, Some(10.0)), ("k", 10L, None), ("k", 20L, None),
      ("k", 40L, Some(50.0)), ("k", 50L, None),
      ("e", 5L, None), ("e", 6L, None),
      ("h", 0L, None), ("h", 10L, Some(4.0)))
      .toDF("id", "t", "v")
    val got = TimeSeries.interpolateLinear(df, Seq("id"), "t", "v")
      .select("id", "t", "v_filled", "fill_kind")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getDouble(2))),
          r.getString(3))).toMap
    got(("k", 0L)) shouldBe ((Some(10.0), "observed"))
    got(("k", 10L)) shouldBe ((Some(20.0), "interp")) // 10+40*10/40
    got(("k", 20L)) shouldBe ((Some(30.0), "interp"))
    got(("k", 50L)) shouldBe ((Some(50.0), "locf"))
    got(("e", 5L)) shouldBe ((None, "none"))
    got(("h", 0L)) shouldBe ((Some(4.0), "backfill"))
  }

  test("fdCheck: held and violated dependencies") {
    import graft.operators.Profiler
    val df = Seq((1L, "x", 10L), (1L, "x", 20L), (2L, "y", 30L),
      (2L, "z", 30L), (3L, "w", 40L)).toDF("k", "a", "b")
    // k -> a: key 2 maps to {y,z} -> 1 violation of 3 keys
    val fa = Profiler.fdCheck(df, "k->a", Seq("k"), "a").head()
    fa.getLong(1) shouldBe 3L
    fa.getLong(2) shouldBe 1L
    fa.getLong(3) shouldBe 2L
    fa.getDouble(4) shouldBe 1.0 / 3.0
    // (k, a) -> b: (1,x) maps to {10,20}
    val fb = Profiler.fdCheck(df, "ka->b", Seq("k", "a"), "b").head()
    fb.getLong(1) shouldBe 4L
    fb.getLong(2) shouldBe 1L
  }

  test("passAtK: hand-computed estimates, n<k dropped, all-fail/all-pass") {
    import graft.operators.Evaluation
    // task a: n=6, c=2 -> 1 - C(4,2)/C(6,2) = 1 - 6/15 = 0.6
    // task b: n=1 < k -> dropped; task d: all pass; task e: all fail
    val df = (Seq.fill(2)(("a", true)) ++ Seq.fill(4)(("a", false)) ++
      Seq(("b", true)) ++
      Seq.fill(3)(("d", true)) ++ Seq.fill(3)(("e", false)))
      .toDF("task", "ok")
    val got = Evaluation.passAtK(df, "task", col("ok"), k = 2)
      .orderBy("task").collect()
    got.map(_.getString(0)).toSeq shouldBe Seq("a", "d", "e")
    got(0).getDouble(5) shouldBe 0.6 +- 1e-15 // 1 - 12/30
    got(1).getDouble(5) shouldBe 1.0 // fail_num 0
    got(2).getDouble(5) shouldBe 0.0 // C(3,2)/C(3,2)
  }

  test("ndcgAtK: hand-computed graded DCG/IDCG, no-relevant NULL") {
    import graft.operators.Evaluation
    // query A ranked by score desc: d1(rel 3), d2(rel 0), d3(rel 1)
    // DCG@3  = 3/log2(2) + 0 + 1/log2(4) = 3.5
    // IDCG@3 = 3/log2(2) + 1/log2(3)
    // query B: no relevant docs -> idcg 0, ndcg NULL
    val df = Seq(("A", 1L, 10L, 3L), ("A", 2L, 9L, 0L),
      ("A", 3L, 8L, 1L), ("B", 4L, 5L, 0L))
      .toDF("q", "id", "score", "rel")
    val got = Evaluation.ndcgAtK(df, "q", col("score"), col("id"),
      col("rel"), k = 3).orderBy("q").collect()
    got(0).getLong(1) shouldBe 3L // n_ranked
    got(0).getLong(2) shouldBe 2L // n_rel
    got(0).getDouble(3) shouldBe 3.5 +- 1e-12
    val idcg = 3.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    got(0).getDouble(4) shouldBe idcg +- 1e-12
    got(0).getDouble(5) shouldBe (3.5 / idcg) +- 1e-12
    got(1).getLong(2) shouldBe 0L
    got(1).isNullAt(5) shouldBe true
    // partitioning invariance: exact same bits either way
    Evaluation.ndcgAtK(df.repartition(7), "q", col("score"), col("id"),
        col("rel"), k = 3).orderBy("q").collect().map(_.getDouble(3))
      .toSeq shouldBe got.map(_.getDouble(3)).toSeq
  }

  test("corpusBleu: the textbook clipping example and a hand-computed " +
      "BLEU-2, brevity penalty on short candidates") {
    import graft.operators.Evaluation
    // Papineni's degenerate candidate: "the the the the the the the"
    // vs "the cat is on the mat" — clipped p1 = 2/7, and c=7 > r=6
    // so BP = 1; BLEU-1 = 2/7
    val p1 = Seq((1L, "the the the the the the the",
      "the cat is on the mat")).toDF("id", "cand", "ref")
    val b1 = Evaluation.corpusBleu(p1, "id", col("cand"), col("ref"),
      maxN = 1).collect()
    b1.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq shouldBe
      Seq((1, 2L, 7L, 7L, 6L))
    b1.head.getDouble(5) shouldBe (2.0 / 7.0) +- 1e-12
    // BLEU-2 by hand: cand "the cat the cat" / ref "the cat is good"
    // p1 = 2/4 (the,cat clipped to 1 each), p2 = 1/3 ("the cat"
    // twice clipped to ref's once), c = r = 4 -> BP 1
    val p2 = Seq((1L, "the cat the cat", "the cat is good"))
      .toDF("id", "cand", "ref")
    val b2 = Evaluation.corpusBleu(p2, "id", col("cand"), col("ref"),
      maxN = 2).orderBy("n").collect()
    b2.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1, 2L, 4L), (2, 1L, 3L))
    b2.head.getDouble(5) shouldBe
      math.exp((math.log(0.5) + math.log(1.0 / 3.0)) / 2.0) +- 1e-12
    // brevity penalty: candidate a strict 3-token prefix of a 6-token
    // reference -> p1 = 1, BLEU-1 = exp(1 - 6/3)
    val p3 = Seq((1L, "the cat is", "the cat is on the mat"))
      .toDF("id", "cand", "ref")
    Evaluation.corpusBleu(p3, "id", col("cand"), col("ref"), maxN = 1)
      .head().getDouble(5) shouldBe math.exp(-1.0) +- 1e-12
    // any zero-match order zeroes BLEU exactly (no ln(0) surface)
    val p4 = Seq((1L, "aa bb", "cc dd")).toDF("id", "cand", "ref")
    Evaluation.corpusBleu(p4, "id", col("cand"), col("ref"), maxN = 1)
      .head().getDouble(5) shouldBe 0.0
  }

  test("rougeN: hand-computed bigram recall, per-document clipping") {
    import graft.operators.Evaluation
    // ref bigrams: the-cat, cat-is, is-on, on-the, the-mat (5);
    // cand bigrams: the-cat, cat-sat -> 1 match -> recall 0.2
    val pairs = Seq(
      (1L, "the cat sat", "the cat is on the mat"),
      // repeated cand bigram clipped against a single ref occurrence
      (2L, "aa bb aa bb aa", "aa bb cc"))
      .toDF("id", "cand", "ref")
    val got = Evaluation.rougeN(pairs, "id", col("cand"), col("ref"),
      n = 2).orderBy("id").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 1L, 5L), (2L, 1L, 2L))
    got(0).getDouble(3) shouldBe 0.2 +- 1e-15
    got(1).getDouble(3) shouldBe 0.5 +- 1e-15
  }

  test("tokenF1: hand-computed SQuAD-style overlap with clipping") {
    import graft.operators.Evaluation
    val pairs = Seq(
      // m = 2 (the, cat), c = 3, r = 6 -> P 2/3, R 1/3, F1 = 4/9
      (1L, "the cat sat", "the cat is on the mat"),
      // repeated candidate token clipped: m = min(3,1) = 1, c = 3,
      // r = 2 -> F1 = 2/5
      (2L, "aa aa aa", "aa bb"))
      .toDF("id", "cand", "ref")
    val got = Evaluation.tokenF1(pairs, "id", col("cand"), col("ref"))
      .orderBy("id").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe Seq((1L, 2L, 3L, 6L), (2L, 1L, 3L, 2L))
    got(0).getDouble(4) shouldBe (2.0 / 3.0) +- 1e-15
    got(0).getDouble(5) shouldBe (1.0 / 3.0) +- 1e-15
    got(0).getDouble(6) shouldBe (4.0 / 9.0) +- 1e-15
    got(1).getDouble(6) shouldBe 0.4 +- 1e-15
  }

  test("chrF: hand-computed char-gram F, whitespace stripping, " +
      "per-document clipping, zero-overlap exact 0") {
    import graft.operators.Evaluation
    // cand "abc" vs ref "abcd", maxN = 2:
    //   n=1: matches 3, cand 3, ref 4; n=2: matches 2, cand 2, ref 3
    //   P = (1 + 1)/2 = 1; R = (3/4 + 2/3)/2 = 17/24
    //   chrF(β=2) = 5·P·R/(4P + R) = (85/24)/(113/24) = 85/113
    val p1 = Seq((1L, "abc", "abcd")).toDF("id", "cand", "ref")
    val g1 = Evaluation.chrF(p1, "id", col("cand"), col("ref"), maxN = 2)
      .orderBy("n").collect()
    g1.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe Seq((1, 3L, 3L, 4L), (2, 2L, 2L, 3L))
    g1.head.getDouble(4) shouldBe (85.0 / 113.0) +- 1e-12
    // whitespace carries no credit: "ab cd" ≡ "abcd" -> chrF exactly 1
    val p2 = Seq((1L, "ab cd", "abcd")).toDF("id", "cand", "ref")
    val g2 = Evaluation.chrF(p2, "id", col("cand"), col("ref"), maxN = 2)
      .orderBy("n").collect()
    g2.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq shouldBe
      Seq((4L, 4L, 4L), (3L, 3L, 3L))
    g2.head.getDouble(4) shouldBe 1.0
    // clipping is per document: cand "aa" vs ref "ab" -> 1 match, not 2
    val p3 = Seq((1L, "aa", "ab")).toDF("id", "cand", "ref")
    Evaluation.chrF(p3, "id", col("cand"), col("ref"), maxN = 1)
      .head().getLong(1) shouldBe 1L
    // zero overlap anywhere -> chrF exactly 0.0 (never 0/0)
    val p4 = Seq((1L, "xx", "yy")).toDF("id", "cand", "ref")
    Evaluation.chrF(p4, "id", col("cand"), col("ref"), maxN = 2)
      .head().getDouble(4) shouldBe 0.0
    an[IllegalArgumentException] should be thrownBy
      Evaluation.chrF(p4, "id", col("cand"), col("ref"), maxN = 7)
  }

  test("rougeL: hand-computed LCS, order sensitivity, repeats, " +
      "truncation, DP cell bound") {
    import graft.operators.Evaluation
    val pairs = Seq(
      // LCS(the cat sat on mat | the cat is on the mat) = 4
      (1L, "the cat sat on mat", "the cat is on the mat"),
      // every unigram shared but order scrambled -> LCS only 2
      (2L, "cat the sat", "the cat sat"),
      // repeated tokens: LCS(a a b | a b a) = 2
      (3L, "a a b", "a b a"))
      .toDF("id", "cand", "ref")
    val got = Evaluation.rougeL(pairs, "id", col("cand"), col("ref"))
      .orderBy("id").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe
      Seq((1L, 4L, 5L, 6L), (2L, 2L, 3L, 3L), (3L, 2L, 3L, 3L))
    got(0).getDouble(4) shouldBe (4.0 / 6.0) +- 1e-15
    got(0).getDouble(5) shouldBe 0.8 +- 1e-15
    got(0).getDouble(6) shouldBe (8.0 / 11.0) +- 1e-15
    got(1).getDouble(6) shouldBe (2.0 / 3.0) +- 1e-15
    // truncation: only the first 2 tokens of each side participate
    val t = Evaluation.rougeL(
        Seq((1L, "a b zzz", "a b qqq")).toDF("id", "cand", "ref"),
        "id", col("cand"), col("ref"), maxTokens = 2).head()
    (t.getLong(1), t.getLong(2), t.getLong(3)) shouldBe ((2L, 2L, 2L))
    // the DP cell bound fails loudly instead of pinning a task
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val big = new GenericArrayData(
      Array.fill(4100)(UTF8String.fromString("x")): Array[Any])
    an[IllegalArgumentException] should be thrownBy
      graft.expressions.EditDistanceUtil.tokenLcs(big, big)
    // reference check: LCS(x, x) on equal arrays = length
    val small = new GenericArrayData(
      Array.tabulate(7)(i => UTF8String.fromString(s"t$i")): Array[Any])
    graft.expressions.EditDistanceUtil.tokenLcs(small, small) shouldBe 7
  }

  test("distinctN: hand-computed diversity ratios and repetition " +
      "collapse") {
    import graft.operators.Evaluation
    // corpus ["a b a b", "a b"]: unigrams 6 total / 2 distinct;
    // bigrams 4 total ("a b"×3, "b a") / 2 distinct
    val df = Seq("a b a b", "a b").toDF("t")
    val got = Evaluation.distinctN(df, col("t"), Seq(1, 2))
      .orderBy("n").collect()
    got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1, 2L, 6L), (2, 2L, 4L))
    got(0).getDouble(3) shouldBe (1.0 / 3.0) +- 1e-15
    got(1).getDouble(3) shouldBe 0.5 +- 1e-15
    // a generator that repeats itself scores near 0
    val rep = Seq.fill(50)("spam spam spam").toDF("t")
    Evaluation.distinctN(rep, col("t"), Seq(1)).head()
      .getDouble(3) shouldBe (1.0 / 150.0) +- 1e-15
  }

  test("expectedCalibrationError: hand-computed ECE/MCE, smallest-id " +
      "tie-break on worst bucket") {
    import graft.operators.Evaluation
    // bucket 0: (5,0),(5,1) -> sp 10, sy 1, gap 90, r 0.45
    // bucket 9: (95,1),(95,1) -> sp 190, sy 2, gap 10, r 0.05
    val df = Seq((5L, 0L), (5L, 1L), (95L, 1L), (95L, 1L))
      .toDF("p100", "y")
    val got = Evaluation
      .expectedCalibrationError(df, col("p100"), col("y")).head()
    (got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(5)) shouldBe ((4L, 2L, 100L, 0L))
    got.getDouble(3) shouldBe 0.25 +- 1e-15
    got.getDouble(4) shouldBe 0.45 +- 1e-15
    // exact tie on the per-bucket ratio -> the SMALLEST bucket wins
    val tie = Seq((5L, 0L), (95L, 1L)).toDF("p100", "y")
    val t = Evaluation
      .expectedCalibrationError(tie, col("p100"), col("y")).head()
    t.getDouble(4) shouldBe 0.05 +- 1e-15
    t.getLong(5) shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Evaluation.expectedCalibrationError(tie, col("p100"), col("y"), 7)
    // the documented p100 domain is enforced: 100 (a common off-by-one
    // for "certain") and negatives fail LOUDLY instead of landing in a
    // phantom bucket that silently skews ECE/MCE
    for (bad <- Seq(100L, -1L, 250L)) {
      val ex = intercept[Exception] {
        Evaluation.expectedCalibrationError(
          Seq((bad, 1L), (5L, 0L)).toDF("p100", "y"),
          col("p100"), col("y")).head()
      }
      ex.getMessage should include("p100 out of [0, 100)")
    }
  }

  test("privacy censuses: hand-computed k-anonymity and l-diversity, " +
      "NULL QI is its own group") {
    import graft.operators.Privacy
    // groups: (A,x):3 rows, (A,y):1, (NULL,x):2
    val df = Seq(
      (Some("A"), "x", 1L), (Some("A"), "x", 1L), (Some("A"), "x", 2L),
      (Some("A"), "y", 1L),
      (None, "x", 1L), (None, "x", 2L))
      .toDF("qi1", "qi2", "sens")
    val ka = Privacy.kAnonymityCensus(df, Seq("qi1", "qi2"), k = 3)
      .head()
    (ka.getLong(0), ka.getLong(1), ka.getLong(2), ka.getLong(3),
      ka.getLong(4), ka.getLong(5), ka.getLong(6)) shouldBe
      ((6L, 3L, 3L, 2L, 3L, 1L, 3L))
    // diversity: (A,x) has {1,2} = 2; (A,y) has {1} = 1; (NULL,x) 2
    val ld = Privacy.lDiversityCensus(df, Seq("qi1", "qi2"),
      col("sens"), l = 2).head()
    (ld.getLong(0), ld.getLong(1), ld.getLong(2), ld.getLong(3),
      ld.getLong(4)) shouldBe ((3L, 2L, 1L, 1L, 1L))
    an[IllegalArgumentException] should be thrownBy
      Privacy.kAnonymityCensus(df, Seq("qi1"), k = 1)
  }

  test("entropyProfile: hand-computed H, NULL is a category, " +
      "collapsed column reads collapsed") {
    import graft.operators.Profiler
    val df = Seq(Some("a"), Some("a"), Some("b"), None,
      Some("c"), Some("c"), Some("c"), Some("c"))
      .toDF("lbl").withColumn("const", lit("x"))
    val got = Profiler.entropyProfile(df, Seq("lbl", "const"))
      .orderBy("column").collect()
    // const: one category -> H = 0, top share 1
    got(0).getString(0) shouldBe "const"
    got(0).getDouble(3) shouldBe 0.0
    got(0).getDouble(4) shouldBe 1.0
    // lbl: counts (a=2, b=1, null=1, c=4) over n=8
    got(1).getLong(1) shouldBe 8L
    got(1).getLong(2) shouldBe 4L
    val h = math.log(8.0) -
      (2 * math.log(2.0) + 0.0 + 0.0 + 4 * math.log(4.0)) / 8.0
    got(1).getDouble(3) shouldBe h +- 1e-12
    got(1).getDouble(4) shouldBe 0.5
  }

  test("benfordAudit: exact digits, micro shares, zero rows for " +
      "unseen digits, non-positive values dropped") {
    import graft.operators.Profiler
    // 4 ones, 2 twos, 1 nine; a zero and a negative must be ignored
    val df = Seq(100L, 12L, 19999L, 1L, 2L, 250L, 9L, 0L, -34L)
      .toDF("cents")
    val got = Profiler.benfordAudit(df, col("cents"))
      .orderBy("digit").collect()
    got.length shouldBe 9
    got.map(_.getInt(0)).toSeq shouldBe (1 to 9)
    got(0).getLong(1) shouldBe 4L // digit 1
    got(1).getLong(1) shouldBe 2L // digit 2
    got(8).getLong(1) shouldBe 1L // digit 9
    got(2).getLong(1) shouldBe 0L // digit 3 unseen, still emitted
    got.foreach(_.getLong(2) shouldBe 7L) // n_total excludes 0 and -34
    // micro shares: 4/7 and the Benford constant for digit 1
    got(0).getLong(3) shouldBe math.round(4.0 / 7.0 * 1e6)
    got(0).getLong(4) shouldBe
      math.round(math.log(2.0) / math.log(10.0) * 1e6)
    got(0).getLong(5) shouldBe (got(0).getLong(3) - got(0).getLong(4))
  }

  test("reciprocalRankAtK: first relevant rank, lcm numerator, miss=0") {
    import graft.operators.Evaluation
    // query A: relevant first appears at rank 3 -> rr_num 2520/3 = 840
    // query B: no relevant in top-k -> first_rank NULL, rr_num 0
    val df = Seq(("A", 1L, 10L, 0L), ("A", 2L, 9L, 0L),
      ("A", 3L, 8L, 1L), ("B", 4L, 5L, 0L))
      .toDF("q", "id", "score", "rel")
    val got = Evaluation.reciprocalRankAtK(df, "q", col("score"),
      col("id"), col("rel"), k = 10).orderBy("q").collect()
    got(0).getLong(1) shouldBe 3L
    got(0).getLong(2) shouldBe 840L
    got(0).getDouble(3) shouldBe (840.0 / 2520.0)
    got(1).isNullAt(1) shouldBe true
    got(1).getLong(2) shouldBe 0L
    got(1).getDouble(3) shouldBe 0.0
  }

  test("twoProportionZ: symmetric arms z=0, degenerate NULL") {
    import graft.operators.Evaluation
    val df = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("arm", "ok")
    val r = Evaluation.twoProportionZ(df, col("arm"), col("ok")).head()
    r.getLong(0) shouldBe 2L
    r.getDouble(6) shouldBe 0.0 // p1 == p2
    // all successes -> pooled p = 1 -> NULL z
    val allOk = Seq((true, true), (false, true)).toDF("arm", "ok")
    Evaluation.twoProportionZ(allOk, col("arm"), col("ok"))
      .head().isNullAt(6) shouldBe true
  }

  test("amsF2: exact F2 right, estimator finite and self-consistent") {
    import graft.operators.Sketches
    // frequencies 3,2,1 -> F2 = 9+4+1 = 14
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Sketches.amsF2(df, col("k"), rows = 9).head()
    r.getLong(0) shouldBe 14L
    val est = r.getLong(1)
    est should be >= 0L
    r.getDouble(2) shouldBe math.abs(est - 14L).toDouble / 14.0
  }

  test("bootstrapCi: constant metric collapses the interval to the mean") {
    import graft.operators.Sampling
    val df = (1L to 500L).map(i => (i, 250L)).toDF("id", "cents")
    val r = Sampling.bootstrapCi(df, "id", col("cents"), b = 20, lo = 1)
      .head()
    r.getLong(0) shouldBe 20L
    r.getLong(1) shouldBe 500L
    r.getDouble(2) shouldBe 250.0
    r.getDouble(3) shouldBe 250.0 // ci_lo
    r.getDouble(4) shouldBe 250.0 // ci_hi
  }

  test("cuped: y perfectly predicted by x collapses adjusted variance") {
    import graft.operators.Evaluation
    // y = 2x per unit -> theta = 2, var_cuped = 0, diff_cuped = 0
    val rows = Seq((1L, 10L, 20L), (2L, 20L, 40L), (3L, 30L, 60L),
      (4L, 40L, 80L))
    val df = rows.flatMap { case (u, x, y) =>
      Seq((u, "pre", x), (u, "post", y))
    }.toDF("u", "phase", "v")
    val r = Evaluation.cuped(df, col("u"), col("u") % 2 === 0,
      when(col("phase") === "pre", col("v")).otherwise(0L),
      when(col("phase") === "post", col("v")).otherwise(0L)).head()
    val idx = r.fieldIndex _
    r.getDouble(idx("theta")) shouldBe 2.0 +- 1e-12
    r.getDouble(idx("var_cuped")) shouldBe 0.0 +- 1e-9
    r.getDouble(idx("diff_cuped")) shouldBe 0.0 +- 1e-9
    r.getDouble(idx("var_reduction")) shouldBe 0.0 +- 1e-12
  }

  test("amsJoinSize: exact join size right, estimate self-consistent") {
    import graft.operators.Sketches
    val a = Seq(1L, 1L, 2L, 3L).toDF("k") // f_A = {1:2, 2:1, 3:1}
    val b = Seq(1L, 2L, 2L, 9L).toDF("k") // f_B = {1:1, 2:2, 9:1}
    val r = Sketches.amsJoinSize(a, col("k"), b, col("k"), rows = 9)
      .head()
    r.getLong(0) shouldBe 4L // 2*1 + 1*2
    r.getLong(2) shouldBe math.abs(r.getLong(1) - 4L)
    // disjoint keys -> exact 0
    val d = Seq(7L).toDF("k")
    Sketches.amsJoinSize(a, col("k"), d, col("k"), rows = 3)
      .head().getLong(0) shouldBe 0L
  }

  test("youdenThreshold: perfect separation found, exact confusion") {
    import graft.operators.Evaluation
    val df = Seq((5L, true), (6L, true), (1L, false), (2L, false),
      (5L, true)).toDF("score", "y")
    val r = Evaluation.youdenThreshold(df, col("y"), col("score"))
      .head()
    r.getLong(0) shouldBe 5L // cutpoint
    r.getLong(1) shouldBe 3L // tp
    r.getLong(2) shouldBe 0L // fp
    r.getLong(4) shouldBe 2L // tn
    r.getDouble(6) shouldBe 1.0 // J
  }

  test("ols2ByGroup: recovers an exact planted linear model") {
    import graft.operators.Evaluation
    // y = 3 + 2*x1 + 5*x2 on a non-degenerate integer grid
    val rows = for (x1 <- 0 to 5; x2 <- 0 to 5)
      yield ("g", x1.toLong, x2.toLong, 3L + 2 * x1 + 5 * x2)
    val df = rows.toDF("g", "x1", "x2", "y")
    val r = Evaluation.ols2ByGroup(df, "g", col("y"), col("x1"), col("x2"))
      .head()
    r.getDouble(10) shouldBe 3.0 +- 1e-9 // beta0
    r.getDouble(11) shouldBe 2.0 +- 1e-9 // beta1
    r.getDouble(12) shouldBe 5.0 +- 1e-9 // beta2
  }
}
