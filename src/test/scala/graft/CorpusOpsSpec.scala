package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing, Sampling, Sketches, Vocab}

/** Round-3 corpus-engineering operators: KMV cardinality sketch, heavy
  * hitters, connected components, deterministic splits, sequence
  * packing. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- KMV

  test("kmv sketch is exact below k and partitioning-invariant") {
    val df = (1 to 10).map(_.toLong).toDF("v")
    val exact = df.agg(Sketches.kmvDistinct(col("v"), k = 64)).head().getDouble(0)
    exact shouldBe 10.0
    // duplicates don't inflate the count
    val dups = ((1 to 10) ++ (1 to 10)).map(_.toLong).toDF("v")
    dups.agg(Sketches.kmvDistinct(col("v"), k = 64)).head()
      .getDouble(0) shouldBe 10.0
  }

  test("kmv estimate is close and identical across partitionings") {
    val df = (1 to 5000).map(_.toLong).toDF("v")
    val est1 = df.repartition(1)
      .agg(Sketches.kmvDistinct(col("v"), k = 256)).head().getDouble(0)
    val est13 = df.repartition(13)
      .agg(Sketches.kmvDistinct(col("v"), k = 256)).head().getDouble(0)
    est1 shouldBe est13 // merge order cannot change a set-determined sketch
    est1 shouldBe 5000.0 +- 750.0 // ~6% expected error at k=256; 15% margin
  }

  test("kmv per-group with empty-ish groups") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 7L)).toDF("g", "v")
    val m = df.groupBy("g").agg(Sketches.kmvDistinct(col("v"), k = 16).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    m("a") shouldBe 2.0
    m("b") shouldBe 1.0
  }

  test("kmvOverlap: exact set ops below k, close estimates above") {
    // groups a = {1..40}, b = {21..60}: union 60, intersection 20,
    // jaccard 1/3 — all under k=256, so every figure must be EXACT
    val small = ((1 to 40).map(("a", _)) ++ (21 to 60).map(("b", _)))
      .map { case (g, v) => (g, v.toLong) }.toDF("g", "v")
    val r = Sketches.kmvOverlap(small, "g", col("v"), k = 256).head()
    r.getAs[String]("g1") shouldBe "a"
    r.getAs[String]("g2") shouldBe "b"
    r.getAs[Int]("n_common") shouldBe 20
    r.getAs[Double]("est_union") shouldBe 60.0
    r.getAs[Double]("est_intersection") shouldBe 20.0 +- 1e-9
    r.getAs[Double]("jaccard_est") shouldBe (20.0 / 60.0) +- 1e-12

    // large overlapping sets: a = {1..6000}, b = {3001..9000} — union
    // 9000, intersection 3000; the k=256 estimates must be within the
    // sketch's error envelope and identical across partitionings
    val big = ((1 to 6000).map(("a", _)) ++ (3001 to 9000).map(("b", _)))
      .map { case (g, v) => (g, v.toLong) }.toDF("g", "v")
    def est(parts: Int) =
      Sketches.kmvOverlap(big.repartition(parts), "g", col("v"), k = 256)
        .head()
    val e1 = est(1)
    val e9 = est(9)
    e1.getAs[Double]("est_union") shouldBe e9.getAs[Double]("est_union")
    e1.getAs[Double]("est_intersection") shouldBe
      e9.getAs[Double]("est_intersection")
    e1.getAs[Double]("est_union") shouldBe 9000.0 +- 1800.0
    e1.getAs[Double]("est_intersection") shouldBe 3000.0 +- 900.0
  }

  // ------------------------------------------------------------- HLL

  test("hll estimate is close, duplicate-insensitive, and partition-invariant") {
    val df = (1 to 5000).map(_.toLong).toDF("v")
    val est1 = df.repartition(1)
      .agg(Sketches.hllDistinct(col("v"), p = 6)).head().getDouble(0)
    val est13 = df.repartition(13)
      .agg(Sketches.hllDistinct(col("v"), p = 6)).head().getDouble(0)
    est1 shouldBe est13 // registers are set-determined; merge order is moot
    est1 shouldBe 5000.0 +- 1500.0 // ~13% expected error at m=64; wide margin
    // duplicates never move a max-register
    val dups = ((1 to 5000) ++ (1 to 5000)).map(_.toLong).toDF("v")
    dups.agg(Sketches.hllDistinct(col("v"), p = 6)).head()
      .getDouble(0) shouldBe est1
  }

  test("hll per-group and higher precision tightens the estimate") {
    val df = (1 to 20000).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("g", "v")
    val m = df.groupBy("g").agg(Sketches.hllDistinct(col("v"), p = 10).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    m("a") shouldBe 10000.0 +- 1000.0 // ~3.3% at m=1024; 10% margin
    m("b") shouldBe 10000.0 +- 1000.0
  }

  // -------------------------------------------------- weighted sample

  test("weighted sample is deterministic and matches a brute-force pick") {
    val df = (1 to 200).map(i => (i.toLong, (i % 7) * 100L + 50L))
      .toDF("doc_id", "n_chars")
    val got = Sampling.weightedSample(df, "doc_id",
        expr("n_chars div 100 + 1"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // brute force: same md5 priorities via plain Spark sort
    val brute = df
      .select(col("doc_id"),
        expr("least(greatest(n_chars div 100 + 1, 1), 1000)").as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1L), col("w"))).as("j"))
      .select(col("doc_id"), col("w"),
        Sketches.md5Hash60(concat(col("doc_id").cast("string"), lit(":"),
          col("j").cast("string"))).as("h"))
      .groupBy("doc_id", "w").agg(min(col("h")).as("priority"))
      .orderBy(col("priority"), col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.map(t => (t._2, t._3, t._4)) shouldBe brute
    got.map(_._1) shouldBe (1L to 20L) // rk is 1-based and ordered
    // weight monotonicity in aggregate: the heavy class dominates picks
    val heavy = df.withColumn("n_chars",
      when(col("doc_id") <= 10, 100000L).otherwise(0L))
    val picks = Sampling.weightedSample(heavy, "doc_id",
        expr("n_chars div 100 + 1"), k = 10)
      .collect().map(_.getLong(1)).toSet
    picks.count(_ <= 10) should be >= 8 // 1000:1 weight ratio
  }

  // --------------------------------------------------- heavy hitters

  test("heavy hitters ranks by count desc with deterministic ties") {
    val items = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("z") ++
      Seq("w")).toDF("item")
    val top = Sketches.heavyHitters(items, col("item"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    top shouldBe Array((1L, "x", 5L), (2L, "z", 3L), (3L, "y", 3L))
  }

  // ------------------------------------------- connected components

  test("connected components labels chains and cliques with the min id") {
    // chain 1-2-3-4-5 (diameter forces multiple rounds), clique {10,11,12},
    // isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  test("connected components handles reversed and duplicate edges") {
    val pairs = Seq((5L, 3L), (3L, 5L), (5L, 3L), (1L, 9L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(3L -> 3L, 5L -> 3L, 1L -> 1L, 9L -> 1L)
  }

  test("contracting CC equals pointer-jumping CC on varied graph shapes") {
    // chain (multi-round), clique, isolated pair, reversed + duplicate
    // edges, plus a seeded pseudo-random graph — both algorithms must
    // produce the identical (node -> min-id) labeling
    val chainEtc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L),
      (31L, 30L), (30L, 31L), (31L, 30L))
    // deterministic LCG edges over ~60 nodes (no Math.random: seeded)
    var seed = 12345L
    def nextId(): Long = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      math.abs(seed % 60) + 100
    }
    val random = Seq.fill(120)((nextId(), nextId())).filter(p => p._1 != p._2)
    for (edges <- Seq(chainEtc, random, chainEtc ++ random)) {
      val pairs = edges.toDF("id1", "id2")
      val jumped = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val contracted = Dedup.connectedComponentsContracting(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      contracted shouldBe jumped
    }
    // empty input
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    Dedup.connectedComponentsContracting(empty).count() shouldBe 0L
    // self-loops only: every node is its own singleton component
    val selfOnly = Seq((7L, 7L), (8L, 8L)).toDF("id1", "id2")
    Dedup.connectedComponentsContracting(selfOnly)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(7L -> 7L, 8L -> 8L)
  }

  test("connectedComponents auto-switches to the contracting variant") {
    // contractAbove = 0 forces the edge-count threshold to trip on any
    // non-empty graph; the delegated path must produce the identical
    // labeling the default pointer-jumping path does
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("id1", "id2")
    val default = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val switched = Dedup.connectedComponents(pairs, contractAbove = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    switched shouldBe default
  }

  test("connected components leaves session conf and caches alone") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    // a 16-node chain forces several pointer-jumping rounds — enough to
    // catch both a conf flip and per-round label-checkpoint retention
    val pairs = (1L until 16L).map(i => (i, i + 1)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(pairs)
    labels.collect().map(_.getLong(1)).distinct shouldBe Array(1L)
    // the loop must not mutate session-global shuffle sizing
    spark.conf.get("spark.sql.shuffle.partitions") shouldBe before
    // superseded rounds release their checkpoint blocks as the loop
    // advances and the edge cache releases on exit: only the RETURNED
    // label table's checkpoint may remain resident
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    leaked.size should be <= 1
  }

  test("dropNearDups keeps one representative per near-dup cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"), // near-dup of 1
      (3L, base),            // exact dup of 1 (also a near-dup)
      (10L, "completely different text about spark catalyst optimizer rules"),
      (20L, "unrelated short document")).toDF("id", "text")
    val kept = Dedup.dropNearDups(docs, "id", "text",
        shingleWords = 3, k = 16, bands = 4, threshold = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    kept shouldBe Seq(1L, 10L, 20L) // min id 1 survives its cluster
  }

  test("incremental dedup accepts only corpus-novel documents") {
    import graft.operators.IncrementalDedup
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val index = dir + "/fp_index"
    val b1 = Seq((1L, "doc alpha"), (2L, "doc beta"), (3L, "doc alpha"))
      .toDF("id", "text")
    val kept1 = IncrementalDedup.acceptBatch(b1, "id", "text", index, "b1")
    // within-batch dup (3 repeats 1's text) dropped, keeper is min id
    kept1.select("id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(1L, 2L)
    val b2 = Seq((10L, "doc beta"), (11L, "doc gamma")).toDF("id", "text")
    val kept2 = IncrementalDedup.acceptBatch(b2, "id", "text", index, "b2")
    // beta already accepted in batch 1 -> only gamma survives
    kept2.select("id").collect().map(_.getLong(0)).toSeq shouldBe Seq(11L)
    // re-delivery of batch 2 under a NEW tag: nothing is new
    IncrementalDedup.acceptBatch(b2, "id", "text", index, "b2r")
      .count() shouldBe 0
    spark.read.parquet(index).count() shouldBe 3
    // retry with the SAME tag is idempotent: recomputes the same
    // survivors (its own prior publish is excluded from the novelty
    // read) and republishes without doubling index rows
    val b3 = Seq((20L, "doc delta")).toDF("id", "text")
    IncrementalDedup.acceptBatch(b3, "id", "text", index, "b3")
      .count() shouldBe 1
    IncrementalDedup.acceptBatch(b3, "id", "text", index, "b3")
      .count() shouldBe 1
    spark.read.parquet(index).count() shouldBe 4
  }

  // ------------------------------------------------------- sampling

  test("deterministic split is stable and respects weights roughly") {
    val df = (1 to 1000).map(_.toLong).toDF("id")
    val s1 = Sampling.deterministicSplit(df, "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 1000L
    counts("train").toDouble shouldBe 800.0 +- 80.0
    counts("val").toDouble shouldBe 100.0 +- 50.0
    counts("test").toDouble shouldBe 100.0 +- 50.0
    // same ids -> same assignment on a re-run over differently
    // partitioned input
    val s2 = Sampling.deterministicSplit(df.repartition(7), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    s1.except(s2).isEmpty shouldBe true
    s2.except(s1).isEmpty shouldBe true
  }

  test("clusterAtomicSplit: near-dup clusters land whole in one split " +
      "— zero cross-split pairs by construction") {
    val docs = (1L to 400L).toDF("doc_id")
    // chain 1-2-3 is ONE cluster; (10,11) another; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val got = Sampling.clusterAtomicSplit(docs, "doc_id", pairs,
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val bySplit = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the chain shares cluster_id 1 and ONE split
    Seq(1L, 2L, 3L).map(bySplit(_)._1).distinct shouldBe Seq(1L)
    Seq(1L, 2L, 3L).map(bySplit(_)._2).distinct.size shouldBe 1
    Seq(10L, 11L).map(bySplit(_)._2).distinct.size shouldBe 1
    // singletons keep their own id as cluster
    bySplit(200L)._1 shouldBe 200L
    // the invariant, checked exhaustively: no pair straddles splits
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).foreach { case (a, b) =>
      bySplit(a)._2 shouldBe bySplit(b)._2
    }
    // stable under repartitioning
    val again = Sampling.clusterAtomicSplit(docs.repartition(7),
      "doc_id", pairs, Seq("train" -> 80, "val" -> 10, "test" -> 10))
    got.except(again).isEmpty shouldBe true
    again.except(got).isEmpty shouldBe true
  }

  test("hash sample keeps a stable subset") {
    val df = (1 to 1000).map(_.toLong).toDF("id")
    val kept = Sampling.hashSample(df, "id", keep = 10)
    val n = kept.count()
    n.toDouble shouldBe 100.0 +- 50.0
    // subset property: sampling at 20 contains the sample at 10
    val wider = Sampling.hashSample(df, "id", keep = 20)
    kept.except(wider).isEmpty shouldBe true
  }

  // ------------------------------------------------------- profiler

  test("profiler handles nulls, non-numerics, and empty tables") {
    import graft.operators.Profiler
    val df = Seq((Some(1L), Some("a"), Some(2.5)), (None, None, None),
      (Some(1L), Some("b"), Some(7.5))).toDF("id", "s", "v")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    p("id").getLong(1) shouldBe 3 // n_rows
    p("id").getLong(2) shouldBe 1 // n_nulls
    p("id").getDouble(3) shouldBe 1.0 // distinct {1}
    p("s").getDouble(3) shouldBe 2.0
    p("s").isNullAt(4) shouldBe true // no numeric min for strings
    p("v").getDouble(4) shouldBe 2.5
    p("v").getDouble(5) shouldBe 7.5
    // empty table: zero counts, no NPE
    val empty = Profiler.profile(Seq.empty[(Long, String)].toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    empty("a") shouldBe 0
    empty("b") shouldBe 0
    // dotted column names resolve literally, not as struct paths
    val dotted = Profiler.profile(Seq((1L, 2L)).toDF("user.id", "x"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    dotted("user.id") shouldBe 1.0
  }

  // ---------------------------------------------------- empty inputs

  test("new operators tolerate empty inputs") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    Dedup.connectedComponents(emptyPairs).count() shouldBe 0
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    Packing.packByTokenBudget(emptyDocs, "id",
      graft.functions.TextAnalysis.tokenCount(col("text")), 100)
      .count() shouldBe 0
    Sketches.heavyHitters(Seq.empty[String].toDF("item"), col("item"), 5)
      .count() shouldBe 0
    emptyDocs.agg(Sketches.kmvDistinct(col("id"), 16))
      .head().getDouble(0) shouldBe 0.0
  }

  // -------------------------------------------------------- packing

  test("packing matches the sequential reference and is partition-safe") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"),
      (4L, "j"), (5L, "k l m n o p"), (6L, "q r"), (7L, "s")).toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packByTokenBudget(df, "id",
          graft.functions.TextAnalysis.tokenCount(col("text")), capacity = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    val got = run(docs)
    // sequential reference: exclusive prefix sums over id order
    // toks: 3,2,4,1,6,2,1 -> pre: 0,3,5,9,10,16,18 -> bin(cap 5): 0,0,1,1,2,3,3
    got shouldBe Array((1L, 3L, 0L), (2L, 2L, 0L), (3L, 4L, 1L),
      (4L, 1L, 1L), (5L, 6L, 2L), (6L, 2L, 3L), (7L, 1L, 3L))
    run(docs.repartition(5)) shouldBe got
  }

  test("duplicated spans finds shared windows and the whole-text rule") {
    val shared = (1 to 25).map(i => s"t$i").mkString(" ") // 25 tokens
    val docs = Seq(
      (1L, s"$shared unique tail one"),
      (2L, s"prefix two $shared"),
      (3L, (100 to 130).map(i => s"u$i").mkString(" ")), // unrelated
      (4L, "short doc"), (5L, "short  DOC")              // whole-text dups
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text",
      windowTokens = 20, minDocs = 2)
      .orderBy("span").collect()
    // docs 1+2 share the 25-token run => its 6 distinct 20-gram windows;
    // docs 4+5 share their whole normalized text
    out.length shouldBe 7
    out.count(_.getLong(1) == 2L) shouldBe 7
    out.map(_.getString(0)) should contain ("short doc")
    out.filter(_.getString(0) != "short doc")
      .map(_.getLong(2)).toSet shouldBe Set(1L)
  }

  test("hashed span dedup finds the same groups as the string form") {
    val shared = (1 to 25).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared unique tail one"),
      (2L, s"prefix two $shared"),
      (3L, (100 to 130).map(i => s"u$i").mkString(" ")),
      (4L, "short doc"), (5L, "short  DOC")
    ).toDF("doc_id", "text")
    def groups(df: org.apache.spark.sql.DataFrame) =
      df.select("n_docs", "first_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val strings = groups(Dedup.duplicatedSpans(
      docs, "doc_id", "text", windowTokens = 20, minDocs = 2))
    val hashed = groups(Dedup.duplicatedSpanHashes(
      docs, "doc_id", "text", windowTokens = 20, minDocs = 2))
    hashed shouldBe strings
  }

  test("training order is a stable permutation, invariant to partitioning") {
    val docs = (1L to 100L).toDF("doc_id")
    val ordered = Sampling.trainingOrder(docs, "doc_id", seed = 7L)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    // a permutation: every position 1..n exactly once
    ordered.map(_._2).sorted.toSeq shouldBe (1L to 100L)
    // not the identity (md5 scrambles)
    ordered.sortBy(_._1).map(_._2).toSeq should not be (1L to 100L)
    // partitioning-invariant
    val re = Sampling.trainingOrder(docs.repartition(7), "doc_id", seed = 7L)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    re.sortBy(_._1).toSeq shouldBe ordered.sortBy(_._1).toSeq
    // a different seed is a different permutation
    val other = Sampling.trainingOrder(docs, "doc_id", seed = 8L)
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    other.sortBy(_._1).map(_._2).toSeq should not be
      ordered.sortBy(_._1).map(_._2).toSeq
  }

  test("sequence windows chunk with stride and a short tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val wins = Packing.sequenceWindows(docs, "doc_id", "text",
        maxLen = 4, stride = 3)
      .orderBy("win_id")
      .select("win_id", "start_tok", "win_tokens", "win_hash").collect()
    // starts 0,3,6,9 over 10 tokens: sizes 4,4,4,1
    wins.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L))
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    wins(0).getString(3) shouldBe md5hex("w1 w2 w3 w4")
    wins(3).getString(3) shouldBe md5hex("w10")
  }

  test("sequence windows normalize case and whitespace first") {
    val docs = Seq((1L, "  A  b\tC ")).toDF("doc_id", "text")
    val wins = Packing.sequenceWindows(docs, "doc_id", "text",
      maxLen = 2, stride = 2).orderBy("win_id").collect()
    wins.map(r => (r.getLong(1), r.getLong(3))).toSeq shouldBe
      Seq((0L, 2L), (1L, 1L)) // tokens: a b c
  }

  test("vocabulary ranks by frequency with deterministic tie-break") {
    val docs = Seq((1L, "b b b a a c c z"), (2L, "a")).toDF("doc_id", "text")
    // tf: a=3, b=3, c=2, z=1 — top-3 by (tf desc, token asc) = a, b, c
    val voc = Vocab.topVocab(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    voc.toSeq shouldBe Seq(("a", 3L), ("b", 3L), ("c", 2L))
  }

  test("zipfSlope: exact -1 on a synthetic 1/r corpus, ties ranked " +
      "by token") {
    // frequencies 12, 6, 4, 3 at ranks 1..4: f = 12/r exactly, so
    // ln f = ln 12 − ln r and the OLS slope is exactly −1 up to float
    // fold noise; intercept ≈ ln 12
    val text = ("a " * 12) + ("b " * 6) + ("c " * 4) + ("d " * 3)
    val docs = Seq((1L, text.trim)).toDF("doc_id", "text")
    val r = Vocab.zipfSlope(docs, "text", nRanks = 4).head()
    r.getLong(0) shouldBe 4L
    r.getDouble(1) shouldBe -1.0 +- 1e-12
    r.getDouble(2) shouldBe math.log(12.0) +- 1e-12
    // partitioning invariance: the folds are sorted, bits identical
    val many = (1L to 8L).map(i => (i, text.trim)).toDF("doc_id", "text")
    Vocab.zipfSlope(many, "text", 4).head().getDouble(1) shouldBe
      Vocab.zipfSlope(many.repartition(5), "text", 4).head().getDouble(1)
    // degenerate corpus (one distinct token): the OLS denominator is
    // exactly 0 — slope/intercept must be NULL (r7 ADVICE: Spark's
    // Divide nulls 0/0 but DuckDB yields NaN, so the operator pins
    // the NULL explicitly and oracles mirror the CASE)
    val one = Seq((1L, "same same same")).toDF("doc_id", "text")
    val d = Vocab.zipfSlope(one, "text", nRanks = 3).head()
    d.getLong(0) shouldBe 1L
    d.isNullAt(1) shouldBe true
    d.isNullAt(2) shouldBe true
  }

  test("oov stats count tokens outside the vocabulary") {
    val docs = Seq((1L, "a b oovy a"), (2L, "zed zed")).toDF("doc_id", "text")
    val voc = Seq("a", "b").toDF("token")
    val got = Vocab.oovStats(docs, "doc_id", "text", voc)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.toSeq shouldBe Seq((1L, 4L, 1L, 0.25), (2L, 2L, 2L, 1.0))
  }

  test("span removal cuts shared spans everywhere but the keeper doc") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail one two"),   // keeper of the shared spans
      (2L, s"pre amble $shared"),      // loses the shared block
      (3L, "all unique words here"),   // untouched
      (4L, "dup dup"), (5L, "dup  DUP"), // short-doc whole-text rule
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
        windowTokens = 10, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 keeps everything (it is min-id for every flagged span);
    // doc 2 loses exactly the 12 shared tokens (overlapping 10-token
    // spans union); docs 4/5 normalize to the same 2-token text -> doc 5
    // cleared
    out(0) shouldBe (1L, 15L, 0L, s"$shared tail one two")
    out(1) shouldBe (2L, 14L, 12L, "pre amble")
    out(2) shouldBe (3L, 4L, 0L, "all unique words here")
    out(3) shouldBe (4L, 2L, 0L, "dup dup")
    out(4) shouldBe (5L, 2L, 2L, "")
  }

  test("span removal unions overlapping flagged spans") {
    // two docs share two OVERLAPPING 5-token spans (a 6-token block);
    // the loser must lose the union, not double-count
    val block = "b1 b2 b3 b4 b5 b6"
    val docs = Seq(
      (1L, s"$block x1 x2"),
      (2L, s"y1 $block y2"),
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
        windowTokens = 5, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    out(0) shouldBe (1L, 0L, s"$block x1 x2")
    out(1) shouldBe (2L, 6L, "y1 y2")
  }

  test("corpus diff classifies by content fingerprint, not text bytes") {
    import graft.operators.CorpusDiff
    val old = Seq(
      (1L, "same doc"), (2L, "will change"), (3L, "will vanish"),
      (4L, "Spacing   And Case"),
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same doc"), (2L, "has changed"), (5L, "brand new"),
      (4L, "spacing and case"), // fingerprint-equal: normalization
    ).toDF("doc_id", "text")
    val d = CorpusDiff.diff(old, neu, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    d.toSeq shouldBe Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "unchanged"), (5L, "added"))
    val s = CorpusDiff.summary(
        CorpusDiff.diff(old, neu, "doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    s.toSeq shouldBe Seq(("added", 1L), ("changed", 1L),
      ("removed", 1L), ("unchanged", 2L))
  }

  test("jsDivergenceTopK: hand-computed drift, exact-0 on identical " +
      "corpora, ln 2 on disjoint, tail-bucket coarsening") {
    import graft.operators.CorpusDiff
    // A: a a b (N=3); B: a b b b (N=4); no tail at k=10
    val a = Seq("a a b").toDF("text")
    val b = Seq("a b b b").toDF("text")
    val got = CorpusDiff.jsDivergenceTopK(a, b, "text", k = 10).head()
    (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) shouldBe ((3L, 4L, 2L, 2L, 3L))
    val expect = 0.5 * (
      2.0 / 3 * math.log((2.0 / 3) / (11.0 / 24)) +
        0.25 * math.log(0.25 / (11.0 / 24)) +
        1.0 / 3 * math.log((1.0 / 3) / (13.0 / 24)) +
        0.75 * math.log(0.75 / (13.0 / 24)))
    got.getDouble(5) shouldBe expect +- 1e-12
    // identical distributions: every p/m is exactly 1.0 -> jsd == 0.0
    CorpusDiff.jsDivergenceTopK(a, a, "text", k = 10).head()
      .getDouble(5) shouldBe 0.0
    // disjoint support -> exactly ln 2
    val dj = CorpusDiff.jsDivergenceTopK(
      Seq("x").toDF("text"), Seq("y").toDF("text"), k = 10,
      textCol = "text").head()
    dj.getDouble(5) shouldBe math.log(2.0) +- 1e-15
    // k = 1: top bucket is b (combined 4 > 3); tail folds (a: 2, 1)
    val c1 = CorpusDiff.jsDivergenceTopK(a, b, "text", k = 1).head()
    c1.getLong(4) shouldBe 2L
    val coarse = 0.5 * (
      1.0 / 3 * math.log((1.0 / 3) / (13.0 / 24)) +
        0.75 * math.log(0.75 / (13.0 / 24)) +
        2.0 / 3 * math.log((2.0 / 3) / (11.0 / 24)) +
        0.25 * math.log(0.25 / (11.0 / 24)))
    c1.getDouble(5) shouldBe coarse +- 1e-12
    // the coarsened value lower-bounds the full JSD (log-sum)
    c1.getDouble(5) should be <= got.getDouble(5) + 1e-12
    an[IllegalArgumentException] should be thrownBy
      CorpusDiff.jsDivergenceTopK(a, b, "text", k = 0)
  }

  test("jsDivergenceFromCounts over mergeDelta-maintained counts " +
      "equals the one-shot JSD of every prefix, bit for bit") {
    import graft.operators.{CorpusDiff, IncrementalAgg}
    import graft.functions.{TextAnalysis => TA}
    val a = Seq("a a b").toDF("text")
    val batches = Seq(Seq("a"), Seq("b b"), Seq("a c"))
    def tokensOf(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TA.alnumTokens(col("text"))).as("token"))
    val aCounts = tokensOf(a).groupBy("token")
      .agg(count(lit(1)).as("ca"))
    var bCounts = tokensOf(batches(0).toDF("text")).groupBy("token")
      .agg(count(lit(1)).as("cb"))
    (0 until 3).foreach { k =>
      if (k > 0)
        bCounts = IncrementalAgg.mergeDelta(bCounts,
          tokensOf(batches(k).toDF("text")), Seq("token"),
          counts = Seq("cb"), sums = Nil)
      val incr = CorpusDiff.jsDivergenceFromCounts(
        aCounts.join(bCounts, Seq("token"), "full_outer"), k = 10)
        .head()
      val oneShot = CorpusDiff.jsDivergenceTopK(a,
        batches.take(k + 1).flatten.toDF("text"), "text", k = 10)
        .head()
      incr.getDouble(5) shouldBe oneShot.getDouble(5) // exact bits
      incr.getLong(1) shouldBe oneShot.getLong(1)
      incr.getLong(3) shouldBe oneShot.getLong(3)
    }
  }

  test("UnigramLm: hand-computed Viterbi, single-char fallback, " +
      "piece counting weighted by word frequency") {
    import graft.operators.UnigramLm
    // vocab: p(a)=1/2, p(b)=1/4, p(ab)=1/4 — "ab" as ONE piece
    // (ln 1/4) beats a+b (ln 1/8)
    val lnp = Map("a" -> math.log(0.5), "b" -> math.log(0.25),
      "ab" -> math.log(0.25))
    UnigramLm.viterbi("ab", lnp, maxPieceLen = 2) shouldBe
      math.log(0.25) +- 1e-15
    // "ba": no "ba" piece -> b + a = ln(1/8)
    UnigramLm.viterbi("ba", lnp, maxPieceLen = 2) shouldBe
      (math.log(0.25) + math.log(0.5)) +- 1e-15
    // unreachable char -> -Infinity (callers guarantee the fallback)
    UnigramLm.viterbi("ax", lnp, 2).isNegInfinity shouldBe true
    // piece counts weight by word frequency; seed vocab keeps every
    // single char even when it misses the top-V cut
    val words = Seq(("aa", 10L), ("zq", 1L)).toDF("word", "freq")
    val counts = UnigramLm.pieceCounts(words, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    counts("a") shouldBe 20L // two occurrences x freq 10
    counts("aa") shouldBe 10L
    counts("z") shouldBe 1L
    val vocab = UnigramLm.seedVocab(
        UnigramLm.pieceCounts(words, 2), vocabSize = 1)
      .collect().map(_.getString(0)).toSet
    vocab should contain allOf ("a", "z", "q") // fallback chars kept
    // segmentation output: "ab" one piece; "ba" falls back to chars;
    // score ties break to the LONGEST last piece
    UnigramLm.segment("ab", lnp, 2) shouldBe Seq("ab")
    UnigramLm.segment("ba", lnp, 2) shouldBe Seq("b", "a")
    UnigramLm.segment("ax", lnp, 2) shouldBe Nil
    // exact dyadic scores force a bit-exact tie: [a,a] = -2.0 = [aa]
    val tied = Map("a" -> -1.0, "aa" -> -2.0)
    UnigramLm.segment("aa", tied, 2) shouldBe Seq("aa") // tie -> longer
    // end to end: the most frequent word scores, never -inf
    val docs = Seq("the cat the cat the").toDF("text")
    val got = UnigramLm.segmentScores(docs, col("text"),
      maxPieceLen = 3, vocabSize = 5, topWords = 2)
      .orderBy("word").collect()
    got.map(_.getString(0)).toSeq shouldBe Seq("cat", "the")
    all(got.map(_.getDouble(3))) should be < 0.0
  }

  test("UnigramLm EM: hand-computed posteriors, expected piece mass, " +
      "non-decreasing corpus likelihood") {
    import graft.operators.UnigramLm
    // word "ab" (freq 3), vocab p(a)=1/2, p(b)=1/4, p(ab)=1/4:
    // segmentations [ab] 1/4 and [a,b] 1/8, Z = 3/8 ->
    // posterior([ab]) = 2/3; E[ab] = 2, E[a] = E[b] = 1 at freq 3
    val lnp = Map("a" -> math.log(0.5), "b" -> math.log(0.25),
      "ab" -> math.log(0.25))
    val words = Seq(("ab", 3L)).toDF("word", "freq")
    val e = UnigramLm.emExpectedCounts(words, lnp, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    e("ab") shouldBe 2.0 +- 1e-9
    e("a") shouldBe 1.0 +- 1e-9
    e("b") shouldBe 1.0 +- 1e-9
    // total expected mass = freq x expected segmentation length (4/3)
    e.values.sum shouldBe 4.0 +- 1e-9
    // EM ascends the corpus likelihood on a mixed fixture
    val corpus = Seq(("ab", 5L), ("ba", 2L), ("aab", 3L))
    val wdf = corpus.toDF("word", "freq")
    var model = lnp
    var prev = UnigramLm.corpusLogLikelihood(corpus, model, 2)
    (0 until 3).foreach { _ =>
      model = UnigramLm.emIteration(wdf, model, maxPieceLen = 2)
      val ll = UnigramLm.corpusLogLikelihood(corpus, model, 2)
      ll should be >= prev - 1e-12
      prev = ll
    }
    // probabilities stay normalized: sum of exp(lnp) = 1
    model.values.map(math.exp).sum shouldBe 1.0 +- 1e-12
    // the deterministic-order iteration (q412's M-step) agrees with
    // the native one to float noise and preserves the ascent
    var modelS = lnp
    var prevS = UnigramLm.corpusLogLikelihood(corpus, modelS, 2)
    (0 until 3).foreach { _ =>
      modelS = UnigramLm.emIterationSorted(wdf, modelS, maxPieceLen = 2)
      val ll = UnigramLm.corpusLogLikelihood(corpus, modelS, 2)
      ll should be >= prevS - 1e-12
      prevS = ll
    }
    prevS shouldBe prev +- 1e-9
    modelS.keySet shouldBe model.keySet
    // wordLogZ is corpusLogLikelihood's per-word factor
    UnigramLm.corpusLogLikelihood(Seq(("ab", 3L)), lnp, 2) shouldBe
      (3L * UnigramLm.wordLogZ("ab", lnp, 2)) +- 1e-12
  }

  test("UnigramLm pruneIterationSorted: top-K multi-char survival, " +
      "single-char floor, renormalized and deterministic") {
    import graft.operators.UnigramLm
    val lnp = Map("a" -> math.log(0.3), "b" -> math.log(0.2),
      "ab" -> math.log(0.25), "ba" -> math.log(0.15),
      "aab" -> math.log(0.1))
    val words = Seq(("aab", 4L), ("ab", 2L)).toDF("word", "freq")
    val pruned = UnigramLm.pruneIterationSorted(words, lnp, 3, keepTopK = 1)
    // the single-char floor always survives; exactly ONE multi-char
    // piece does, and it is the expected-count argmax of the E-step
    pruned.keySet should contain allOf ("a", "b")
    val multis = pruned.keySet.filter(_.length > 1)
    multis.size shouldBe 1
    val counts = UnigramLm.emExpectedCountsSorted(words, lnp, 3)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val bestMulti = counts.filter(_._1.length > 1)
      .toSeq.sortBy { case (p, c) => (-c, p) }.head._1
    multis.head shouldBe bestMulti
    // survivors renormalize to a probability distribution
    pruned.values.map(math.exp).sum shouldBe 1.0 +- 1e-12
    // every input word stays segmentable under the pruned model
    // (the floor's whole point), and the call is deterministic
    UnigramLm.wordLogZ("aab", pruned, 3) should be > Double.NegativeInfinity
    UnigramLm.wordLogZ("ab", pruned, 3) should be > Double.NegativeInfinity
    UnigramLm.pruneIterationSorted(words, lnp, 3, keepTopK = 1) shouldBe
      pruned
    // keepTopK beyond the piece count keeps everything with mass
    UnigramLm.pruneIterationSorted(words, lnp, 3, keepTopK = 100)
      .keySet shouldBe counts.keySet
    // the SentencePiece alternation: EM iterations AFTER the prune
    // still ascend the (pruned-model) corpus likelihood — the EM
    // guarantee holds from any starting model, including a pruned one
    val corpus = Seq(("aab", 4L), ("ab", 2L))
    var m = pruned
    var prev = UnigramLm.corpusLogLikelihood(corpus, m, 3)
    (0 until 2).foreach { _ =>
      m = UnigramLm.emIterationSorted(words, m, 3)
      val ll = UnigramLm.corpusLogLikelihood(corpus, m, 3)
      ll should be >= prev - 1e-12
      prev = ll
    }
  }

  test("token-budget mixture sample respects quotas deterministically") {
    val docs = (1 to 60).map { i =>
      (i.toLong, s"src${i % 3}", 100)
    }.toDF("doc_id", "source", "tok")
    val out = Sampling.tokenBudgetSample(
      docs, "doc_id", "tok", "source", budget = 650L)
    // 100-token docs: running total hits 600 at 6 docs; the 7th crosses
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("cum_tokens").as("cum"))
      .collect()
    perSrc.length shouldBe 3
    perSrc.foreach { r =>
      r.getLong(1) shouldBe 6L
      r.getLong(2) shouldBe 600L
    }
    // stable across partitionings and reruns
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    Sampling.tokenBudgetSample(docs.repartition(7), "doc_id", "tok",
        "source", budget = 650L)
      .select("doc_id").as[Long].collect().sorted.toSeq shouldBe ids
  }

  test("dedupLines: corpus-wide first occurrence wins, docs rebuilt in order") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "footer\nalpha one\nbeta two"),
      (2L, "footer\ngamma three\nbeta two"),
      (3L, "  footer  \n\ndelta four"), // trims + blank line dropped
      (4L, "footer")                    // fully deduped -> empty text
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq shouldBe Seq(
      (1L, 3L, 3L, "footer\nalpha one\nbeta two"),
      (2L, 3L, 1L, "gamma three"), // footer AND 'beta two' both lost
      (3L, 2L, 1L, "delta four"),
      (4L, 1L, 0L, ""))
    // partitioning invariance: same winners on any layout
    val re = Dedup.dedupLines(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
    re.map(_.getString(3)).toSeq shouldBe out.map(_.getString(3)).toSeq
  }

  test("ringNegatives: k different-group successors, deterministic, bounded") {
    val docs = (1L to 40L).map(i => (i, s"g${i % 4}"))
      .toDF("doc_id", "grp")
    val out = Sampling.ringNegatives(docs, "doc_id", "grp",
      k = 2, lookahead = 6, seed = 11L)
    val rows = out.collect()
    // deterministic for this seed: 39 anchors find 2 negatives, one
    // lands before a same-group run and finds only 1 (the documented
    // fewer-than-k case)
    rows.length shouldBe 79
    rows.groupBy(_.getLong(0)).values.map(_.size).count(_ == 2) shouldBe 39
    rows.foreach { r =>
      r.getLong(3) should not be r.getLong(0) // never itself
    }
    // negatives really are cross-group
    val g = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => g(r.getLong(3)) should not be g(r.getLong(0)))
    // rank ordering follows ring offset
    rows.groupBy(_.getLong(0)).values.foreach { anchor =>
      val sorted = anchor.sortBy(_.getInt(1))
      sorted.map(_.getInt(2)).toSeq shouldBe
        sorted.map(_.getInt(2)).sorted.toSeq
    }
    // deterministic across partitionings
    val re = Sampling.ringNegatives(docs.repartition(7), "doc_id",
      "grp", k = 2, lookahead = 6, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).sorted
    re shouldBe rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
      .sorted
    // degenerate: single group -> no negatives at all
    val solo = (1L to 10L).map(i => (i, "only")).toDF("doc_id", "grp")
    Sampling.ringNegatives(solo, "doc_id", "grp", k = 2, lookahead = 5,
      seed = 1L).count() shouldBe 0L
  }

  test("shardRoundRobin: LPT-ish balance, deterministic, exact dealing") {
    // weights 1..100: sorted round-robin across 4 shards
    val docs = (1L to 100L).map(i => (i, i % 100 + 1)).toDF("doc_id", "w")
    val out = Packing.shardRoundRobin(docs, "doc_id", col("w"), 4)
    val byShard = out.groupBy("shard")
      .agg(sum("w").as("tot"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    byShard.length shouldBe 4
    byShard.foreach(_._3 shouldBe 25L)
    // totals within one max-item of each other
    val tots = byShard.map(_._2)
    (tots.max - tots.min) should be <= 100L
    // deterministic across partitionings
    val re = Packing.shardRoundRobin(docs.repartition(9), "doc_id",
      col("w"), 4).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("doc_id", "shard").collect()
      .foreach(r => re(r.getLong(0)) shouldBe r.getLong(1))
    // heaviest item (doc 99, w=100) goes to shard 0 (pos 1)
    re(99L) shouldBe 0L
  }

  test("ecdf: hand-computed fractions over duplicated values") {
    import graft.operators.Quantiles
    val v = (Seq.fill(3)(10L) ++ Seq.fill(5)(20L) ++ Seq.fill(2)(30L))
      .map(Tuple1(_)).toDF("v")
    val out = Quantiles.ecdf(v, "v").orderBy("value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.toSeq shouldBe Seq(
      (10L, 3L, 3L, 0.3), (20L, 5L, 8L, 0.8), (30L, 2L, 10L, 1.0))
    // partitioning invariance (prefix offsets must stitch)
    Quantiles.ecdf(v.repartition(7), "v").orderBy("value").collect()
      .map(_.getDouble(3)).toSeq shouldBe Seq(0.3, 0.8, 1.0)
  }

  test("ddSketch base-2: merge = whole-input sketch, 2x error bound") {
    val vals = (1L to 5000L).map(v => Tuple1(v * v % 100000)).toDF("v")
    val whole = Sketches.ddSketchCounts(vals, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), exactly
    val a = vals.filter(col("v") % 3 === 0)
    val b = vals.filter(col("v") % 3 =!= 0)
    val merged = Sketches.ddSketchCounts(a, "v")
      .unionAll(Sketches.ddSketchCounts(b, "v"))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    merged shouldBe whole
    // gamma=2 guarantee: estimate within [true/2, 2*true] of the
    // exact rank-statistic for each fraction
    val sorted = vals.collect().map(_.getLong(0)).sorted
    val est = Sketches.ddSketchQuantiles(
      Sketches.ddSketchCounts(vals, "v"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getLong(3)).toMap
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val truth = sorted(math.max(0,
        math.ceil(q * sorted.length).toInt - 1)).max(1L)
      est(q).toDouble should be >= truth / 2.0
      est(q).toDouble should be <= truth * 2.0
    }
    // zero handling: bucket 0 representative is 0
    val z = Seq(0L, 0L, 0L).map(Tuple1(_)).toDF("v")
    Sketches.ddSketchQuantiles(Sketches.ddSketchCounts(z, "v"), Seq(0.5))
      .collect()(0).getLong(3) shouldBe 0L
  }

  test("marketBasket pairLift: hand-counted pairs, skew cap, dup-safe") {
    import graft.operators.MarketBasket
    // baskets: 1={a,b,c} 2={a,b} 3={a} ; duplicate (1,a) row must not
    // inflate counts
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a")).toDF("bk", "it")
    val got = MarketBasket.pairLift(df, "bk", "it")
      .orderBy("item_a", "item_b")
      .select("item_a", "item_b", "c_ab", "c_a", "c_b", "n_baskets")
      .as[(String, String, Long, Long, Long, Long)].collect()
    got shouldBe Array(
      ("a", "b", 2L, 3L, 2L, 3L),
      ("a", "c", 1L, 3L, 1L, 3L),
      ("b", "c", 1L, 2L, 1L, 3L))
    // lift of (a,b): 3*2/(3*2) = 1.0 exactly
    MarketBasket.pairLift(df, "bk", "it")
      .filter(col("item_a") === "a" && col("item_b") === "b")
      .head().getDouble(7) shouldBe 1.0
    // cap: basket 1 (3 items) dropped at maxBasketItems=2 -> only the
    // basket-2 pair survives and n_baskets counts surviving baskets
    val capped = MarketBasket.pairLift(df, "bk", "it", maxBasketItems = 2)
      .select("item_a", "item_b", "c_ab", "n_baskets")
      .as[(String, String, Long, Long)].collect()
    capped shouldBe Array(("a", "b", 1L, 2L))
  }

  test("chunkFixedStride: overlap, partial tail, exact reassembly") {
    import graft.operators.Retrieval
    val text = ('a' to 'z').mkString // 26 chars
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Retrieval.chunkFixedStride(df, "doc_id", "text",
      size = 10, step = 6).orderBy("chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    got.map(_._3).toSeq shouldBe Seq(0L, 6L, 12L, 18L, 24L)
    got.map(_._5).toSeq shouldBe Seq("abcdefghij", "ghijklmnop",
      "mnopqrstuv", "stuvwxyz", "yz")
    got.map(_._4).toSeq shouldBe Seq(10L, 10L, 10L, 8L, 2L)
    // empty/null docs emit nothing
    Retrieval.chunkFixedStride(
      Seq((2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", 10, 6)
      .count() shouldBe 0L
  }

  test("suffixBlocklistCensus: parent-domain containment, exact flag") {
    import graft.operators.WebFilter
    val docs = Seq((1L, "a.b.example.com"), (2L, "example.com"),
      (3L, "example.org"), (4L, "notexample.com"))
      .toDF("doc_id", "host")
    val rules = Seq("example.com", "b.example.com").toDF("rule")
    val got = WebFilter
      .suffixBlocklistCensus(docs, "doc_id", "host", rules, "rule")
      .orderBy("rule").as[(String, Long, Long)].collect()
    // notexample.com must NOT match example.com (dot boundary)
    got shouldBe Array(
      ("b.example.com", 1L, 0L),
      ("example.com", 2L, 1L))
  }

  test("cooccurrence: window-2 pairs and lift on a tiny corpus") {
    import graft.operators.Vocab
    // tokens: a b a  -> win2 pairs: (a,b),(b,a)->(a,b), (a,a)
    val df = Seq((1L, "a b a")).toDF("doc_id", "text")
    val got = Vocab.cooccurrence(df, "doc_id", "text", 2, 10)
      .orderBy("w1", "w2")
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    got shouldBe Array(
      ("a", "a", 1L, 2L, 2L, 3L, 1.0 * 3 / 4),
      ("a", "b", 2L, 2L, 1L, 3L, 2.0 * 3 / 2))
  }

  test("invertedIndex: df/tf exact, postings capped and sorted") {
    import graft.operators.Retrieval
    val df = Seq((3L, "x y x"), (1L, "x z"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = Retrieval.invertedIndex(df, "doc_id", "text", 1L, 2)
      .orderBy("term").as[(String, Long, Long, String)].collect()
    got shouldBe Array(
      ("x", 3L, 4L, "1,2"), // capped at 2, sorted doc ids
      ("y", 1L, 1L, "3"),
      ("z", 1L, 1L, "1"))
    Retrieval.invertedIndex(df, "doc_id", "text", 2L, 2)
      .count() shouldBe 1L // minDf drops the tail
  }

  test("hashingTrick: same token collides to same signed bucket") {
    import graft.operators.FeatureEncoding
    val df = Seq((1L, "foo foo bar"), (2L, "foo")).toDF("doc_id", "text")
    val got = FeatureEncoding.hashingTrick(df, "doc_id", "text", 64)
      .orderBy("doc_id", "bucket")
      .as[(Long, Long, Long, Long)].collect()
    // doc 1 has two buckets (foo x2, bar x1) unless they collide
    val d1 = got.filter(_._1 == 1L)
    d1.map(_._4).sum shouldBe 3L // token count preserved
    // the foo bucket in doc 1 carries |value| = 2, and doc 2's single
    // foo bucket matches it exactly (same hash, same sign)
    val d2 = got.filter(_._1 == 2L).head
    val fooIn1 = d1.find(r => r._2 == d2._2).get
    fooIn1._3 shouldBe 2L * d2._3
    (got.map(_._3).forall(v => v != 0)) shouldBe true
  }

  test("chi2FeatureSelection: perfectly discriminative token tops") {
    import graft.operators.Vocab
    // 'aa' only in class x, 'bb' only in y, 'cc' everywhere
    val df = Seq((1L, "x", "aa cc"), (2L, "x", "aa cc"),
      (3L, "y", "bb cc"), (4L, "y", "bb cc")).toDF("doc_id", "lang", "text")
    val got = Vocab.chi2FeatureSelection(df, "doc_id", "text", "lang", 2)
      .orderBy("cls", "rank").collect()
    // per class the rank-1 feature is its exclusive token with chi2=N
    got(0).getString(1) shouldBe "aa"
    got(0).getDouble(6) shouldBe 4.0 // N(ad-bc)^2/(2*2*2*2) = 4*16/16
    got(2).getString(1) shouldBe "bb"
    // 'cc' is everywhere -> degenerate margin, chi2 pinned to 0
    got(1).getString(1) shouldBe "cc"
    got(1).getDouble(6) shouldBe 0.0
  }

  test("tfCosinePairs: identical docs cosine 1, blocking bounds pairs") {
    import graft.operators.SetSimJoin
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta delta"), (4L, "epsilon")).toDF("doc_id", "text")
    val got = SetSimJoin.tfCosinePairs(df, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    got.length shouldBe 1 // only the (1,2) pair shares rare terms
    got.head shouldBe ((1L, 2L, 3L, 3L, 3L, 1.0))
  }

  // ------------------------------------------- CIDR longest-prefix match

  test("ipv4ToLong parses valid quads and NULLs malformed input") {
    import graft.operators.WebFilter
    val df = Seq("10.0.0.1", "255.255.255.255", "0.0.0.0",
      "10.999.0.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "10..0.1")
      .toDF("ip")
      .select(col("ip"), WebFilter.ipv4ToLong(col("ip")).as("v"))
    val m = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    m("10.0.0.1") shouldBe Some((10L << 24) + 1)
    m("255.255.255.255") shouldBe Some((1L << 32) - 1)
    m("0.0.0.0") shouldBe Some(0L)
    m("10.999.0.1") shouldBe None // octet out of range
    m("1.2.3") shouldBe None // wrong arity
    m("1.2.3.4.5") shouldBe None
    m("a.b.c.d") shouldBe None
    m("10..0.1") shouldBe None
  }

  test("longestPrefixMatch picks the most specific rule and keeps misses") {
    import graft.operators.WebFilter
    val ips = Seq(
      (1L, Some((10L << 24) + (5L << 16) + (3L << 8) + 9)), // /24 wins
      (2L, Some((10L << 24) + (5L << 16) + (9L << 8) + 1)), // /16 wins
      (3L, Some((10L << 24) + (200L << 16))),               // /8 only
      (4L, Some(11L << 24)),                                // no rule
      (5L, None))                                           // unparseable
      .toDF("id", "ip_long")
    val rules = Seq(
      ((10L << 24), 8),
      ((10L << 24) + (5L << 16), 16),
      ((10L << 24) + (5L << 16) + (3L << 8), 24))
      .toDF("net_long", "prefix_len")
    val got = WebFilter.longestPrefixMatch(ips, "ip_long", rules)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    got(1L) shouldBe Some(24)
    got(2L) shouldBe Some(16)
    got(3L) shouldBe Some(8)
    got(4L) shouldBe None // kept, unmatched
    got(5L) shouldBe None // kept, unparseable
    got.size shouldBe 5
  }

  // -------------------------------------------------- RRF / Naive Bayes

  test("rrfFuse: sums only over lists containing the doc, ties by id") {
    import graft.operators.Retrieval
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "doc_id", k = 10, c = 60)
      .as[(Long, Double, Long)].collect()
    val m = got.map(r => r._1 -> r._2).toMap
    m(20L) shouldBe (1.0 / 62 + 1.0 / 61) // both lists
    m(10L) shouldBe 1.0 / 61
    m(40L) shouldBe 1.0 / 62
    m(30L) shouldBe 1.0 / 63
    got.map(_._1).toSeq shouldBe Seq(20L, 10L, 40L, 30L) // fused order
    got.find(_._1 == 20L).get._3 shouldBe 2L // n_lists
  }

  test("naiveBayesCounts: exact counts, totals, vocab, rational P") {
    import graft.operators.Vocab
    val docsDf = Seq(
      ("en", "the cat the dog"), ("en", "the fish"),
      ("de", "der hund")).toDF("lang", "text")
    val got = Vocab.naiveBayesCounts(docsDf, "lang", "text")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // vocab = {the, cat, dog, fish, der, hund} = 6
    got(("en", "the"))._3 shouldBe 3L  // cnt
    got(("en", "the"))._4 shouldBe 6L  // en total tokens
    got(("en", "the"))._5 shouldBe 6L  // vocab size
    got(("en", "the"))._6 shouldBe 4L  // p_num = cnt+1
    got(("en", "the"))._7 shouldBe 12L // p_den = 6+6
    got(("de", "der"))._4 shouldBe 2L
    got(("de", "der"))._6 shouldBe 2L
    got(("de", "der"))._7 shouldBe 8L
    got.size shouldBe 6
  }

  test("wordpieceEncode: greedy longest match, ## continuations, UNK") {
    import graft.operators.Vocab
    val vocab = Seq("un", "##aff", "##able", "##ffa", "a", "##a",
      "##b", "##l", "##e", "##f", "b", "x").toDF("piece")
    val words = Seq("unaffable", "unb", "q1x", "a").toDF("word")
    val got = Vocab.wordpieceEncode(words, "word", vocab)
      .as[(String, String, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    // greedy: un + ##aff (len 3 beats ##a) + ##able
    got("unaffable")._2 shouldBe "un,##aff,##able"
    got("unaffable")._4 shouldBe 0L
    got("unb")._2 shouldBe "un,##b"
    // q: no piece -> [UNK], then 1/x continue as ##-pieces; '1' has
    // no continuation either -> second [UNK]
    got("q1x")._2 shouldBe "[UNK],[UNK],[UNK]"
    got("q1x")._4 shouldBe 3L
    got("a")._2 shouldBe "a"
    got.size shouldBe 4
  }

  test("wordpieceEncode: truncation bound and duplicate input words") {
    import graft.operators.Vocab
    val vocab = Seq("a", "##a").toDF("piece")
    val words = Seq("aaaaaa", "aaaaaa", "aaa").toDF("word")
    val got = Vocab.wordpieceEncode(words, "word", vocab,
        maxWordLen = 4)
      .as[(String, String, Int, Long)].collect().map(r => r._1 -> r).toMap
    got.size shouldBe 2 // truncation collapses duplicates
    got("aaaa")._2 shouldBe "a,##a,##a,##a"
    got("aaa")._3 shouldBe 3
  }

  // -------------------------------------------------- r12 optimization

  test("minhashPrecisionAuditWords equals the two-arm form (r12)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy cat today"),
      (4L, "entirely different text with no shared shingles here at all"),
      (5L, "another unrelated document body for the control group rows"))
      .toDF("doc_id", "text")
    val fused = Dedup.minhashPrecisionAuditWords(docs, "doc_id", "text",
      shingleWords = 3, k = 16, bands = 4, threshold = 0.5).head()
    // the r11 two-arm reference shape
    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val banded = docs.select(col("doc_id"),
      C(graft.expressions.MinHashBandsExpression(
        E(graft.functions.TextAnalysis.wordShingles(col("text"), 3)),
        4, 4)).as("bands"))
    val nCand = Dedup.candidatePairs(banded, "doc_id", "bands",
      Int.MaxValue).count()
    val nVer = Dedup.minhashNearDupsWords(docs, "doc_id", "text",
      shingleWords = 3, k = 16, bands = 4, threshold = 0.5,
      maxBucketSize = Int.MaxValue).count()
    fused.getLong(0) shouldBe nCand
    fused.getLong(1) shouldBe nVer
    fused.getDouble(2) shouldBe nVer.toDouble / nCand.toDouble
    nCand should be >= nVer
    nVer should be >= 1L
  }

  test("simhashNearDupsFromSketch equals simhashNearDups (r12)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta"),
      (4L, "totally different words everywhere now"))
      .toDF("doc_id", "text")
    val viaText = Dedup.simhashNearDups(docs, "doc_id", "text",
        maxHamming = 8, maxBucketSize = Int.MaxValue)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSeq
    val sketch = docs.select(col("doc_id"),
      Dedup.simhash32(graft.functions.TextAnalysis.tokens(col("text")))
        .as("sh")).persist()
    val viaSketch = Dedup.simhashNearDupsFromSketch(sketch, "doc_id",
        "sh", maxHamming = 8, maxBucketSize = Int.MaxValue)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSeq
    sketch.unpersist()
    viaSketch shouldBe viaText
    viaSketch.nonEmpty shouldBe true
  }
}
