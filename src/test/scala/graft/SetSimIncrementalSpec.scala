package graft

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, SetSimJoin}

/** Exact set-similarity join (prefix filtering) and incremental
  * aggregate maintenance: brute-force equivalence on seeded-random
  * inputs — the completeness claims these operators make are exactly
  * what these specs assert. */
class SetSimIncrementalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ set-similarity

  /** Seeded random docs over a small vocab (forces real overlap). */
  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    (1 to n).map { i =>
      val k = 3 + rnd.nextInt(6)
      (i.toLong, Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  private def brute(docsSeq: Seq[(Long, String)], tau: Double) =
    (for {
      (ia, ta) <- docsSeq; (ib, tb) <- docsSeq if ia < ib
      sa = ta.split("\\s+").toSet; sb = tb.split("\\s+").toSet
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa intersect sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= tau
    } yield (ia, ib, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet

  test("prefix-filter join equals brute force on seeded random corpora") {
    for (seed <- Seq(3, 17)) {
      val docsSeq = randomDocs(seed, 80)
      val df = docsSeq.toDF("doc_id", "text")
      val got = SetSimJoin.jaccardSelfJoin(df, "doc_id",
          split(col("text"), "\\s+"), tau = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      withClue(s"seed=$seed: ") { got shouldBe brute(docsSeq, 0.5) }
    }
  }

  test("exact pairs: identical sets, disjoint sets, threshold boundary") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"),      // J = 1
      (3L, "a b c d"),                   // J(1,3) = 3/4
      (4L, "x y z"),                     // disjoint from 1-3
      (5L, "")).toDF("doc_id", "text")   // empty: never matches
    val got = SetSimJoin.jaccardSelfJoin(df, "doc_id",
        graft.functions.TextAnalysis.tokens(col("text")), tau = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
    got shouldBe Set((1L, 2L, 1.0), (1L, 3L, 0.75), (2L, 3L, 0.75))
  }

  test("containment join: directed, catches subset pairs Jaccard misses") {
    val df = Seq(
      (1L, "a b c"),                        // A ⊂ B below
      (2L, "a b c d e f g h i j"),          // superset of 1
      (3L, "x y z")).toDF("doc_id", "text")
    val got = SetSimJoin.containmentSelfJoin(df, "doc_id",
        split(col("text"), "\\s+"), tau = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5))).toSet
    // (1 -> 2): 3/3 = 1.0 qualifies; (2 -> 1): 3/10 does not;
    // J(1,2) = 0.3 would never pass a 0.8 jaccard join
    got shouldBe Set((1L, 2L, 3L, 1.0))
    // brute-force equivalence on a random corpus
    val docsSeq = randomDocs(7, 60)
    val rdf = docsSeq.toDF("doc_id", "text")
    val fast = SetSimJoin.containmentSelfJoin(rdf, "doc_id",
        split(col("text"), "\\s+"), tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = (for {
      (ia, ta) <- docsSeq; (ib, tb) <- docsSeq
      if ia != ib
      sa = ta.split("\\s+").toSet; sb = tb.split("\\s+").toSet
      if sa.nonEmpty && sb.nonEmpty
      if (sa intersect sb).size.toDouble / sa.size >= 0.6
    } yield (ia, ib)).toSet
    fast shouldBe slow
  }

  test("duplicate tokens collapse to set semantics") {
    val df = Seq((1L, "a a a b"), (2L, "a b b")).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardSelfJoin(df, "doc_id",
        split(col("text"), "\\s+"), tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    got shouldBe Array((1L, 2L, 1.0)) // both are the set {a, b}
  }

  // --------------------------------------- incremental aggregation

  test("merged delta equals full recompute, including delta-only keys") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map { i =>
      (s"k${rnd.nextInt(12)}", rnd.nextInt(100).toLong,
        math.round(rnd.nextDouble() * 1e4) / 100.0)
    }
    val df = rows.toDF("g", "v", "price")
      .withColumn("vd", col("v").cast("decimal(18,2)"))
    // split so some groups exist ONLY in the delta
    val base0 = df.filter(col("g") =!= "k3" && col("v") < 50)
    val delta = df.exceptAll(base0)
    val base = base0.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"),
        min(col("price")).as("mn"), max(col("price")).as("mx"))
    val deltaRows = delta
      .select(col("g"), col("vd").as("s"), col("price").as("mn"),
        col("price").as("mx"))
    val merged = IncrementalAgg.mergeDelta(base, deltaRows, Seq("g"),
        counts = Seq("n"), sums = Seq("s"), mins = Seq("mn"),
        maxs = Seq("mx"))
      .select(col("g"), col("n"), col("s").cast("decimal(38,2)").as("s"),
        col("mn"), col("mx"))
    val full = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"),
        min(col("price")).as("mn"), max(col("price")).as("mx"))
      .select(col("g"), col("n"), col("s").cast("decimal(38,2)").as("s"),
        col("mn"), col("mx"))
    merged.collect().map(_.toSeq).toSet shouldBe
      full.collect().map(_.toSeq).toSet
  }

  test("empty delta leaves the base aggregate unchanged") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("g", "v")
      .withColumn("vd", col("v").cast("decimal(18,2)"))
    val base = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("vd")).as("s"))
    val empty = df.filter(lit(false))
      .select(col("g"), col("vd").as("s"))
    val merged = IncrementalAgg.mergeDelta(base, empty, Seq("g"),
      counts = Seq("n"), sums = Seq("s"))
    merged.collect().map(_.toSeq).toSet shouldBe
      base.collect().map(_.toSeq).toSet
  }

  test("idempotentRefresher skips replayed batch ids (exactly-once)") {
    // foreachBatch is at-least-once: after a crash between sink commit
    // and offset commit the last batch re-runs; the marker (committed
    // inside the same atomic swap as the data) must make the re-run a
    // no-op instead of a double merge
    import graft.operators.ParquetTable
    val work = java.nio.file.Files.createTempDirectory("graft_idem")
    val pub = work.resolve("pub").toString
    val base = Seq(("a", 2L), ("b", 1L)).toDF("g", "n")
    ParquetTable.overwriteAtomic(base, pub)
    val refresh = IncrementalAgg.idempotentRefresher(spark, pub,
      keys = Seq("g"), counts = Seq("n"), sums = Nil)
    def state() = ParquetTable.read(spark, pub).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val batch0 = Seq(("a", 0), ("a", 0), ("c", 0)).toDF("g", "x")
    refresh(batch0, 0L)
    state() shouldBe Map("a" -> 4L, "b" -> 1L, "c" -> 1L)
    IncrementalAgg.appliedBatchId(spark, pub) shouldBe 0L

    refresh(batch0, 0L) // replay of the SAME batch id: must be a no-op
    state() shouldBe Map("a" -> 4L, "b" -> 1L, "c" -> 1L)

    // an empty batch advances the marker without touching values
    refresh(batch0.filter(lit(false)), 1L)
    state() shouldBe Map("a" -> 4L, "b" -> 1L, "c" -> 1L)
    IncrementalAgg.appliedBatchId(spark, pub) shouldBe 1L

    // the next real batch still applies
    refresh(Seq(("b", 0)).toDF("g", "x"), 2L)
    state() shouldBe Map("a" -> 4L, "b" -> 2L, "c" -> 1L)
    IncrementalAgg.appliedBatchId(spark, pub) shouldBe 2L

    // crash window: target renamed away to __old (the state a death
    // between the swap's two renames leaves) — the next refresh must
    // self-heal, see the markers, and keep exactly-once semantics
    val fs = new org.apache.hadoop.fs.Path(pub)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(pub),
      new org.apache.hadoop.fs.Path(pub + "__old"))
    refresh(Seq(("b", 0)).toDF("g", "x"), 2L) // replay after "crash"
    state() shouldBe Map("a" -> 4L, "b" -> 2L, "c" -> 1L) // healed, no dup
    refresh(Seq(("c", 0)).toDF("g", "x"), 3L)
    state() shouldBe Map("a" -> 4L, "b" -> 2L, "c" -> 2L)
  }

  test("mergeDeltaWithRetractions: sums/counts exact, min/max rescan," +
      " emptied group removed") {
    // facts0: a->{1,5,9}, b->{2,4}, c->{7}
    val facts0 = Seq(("a", 1L), ("a", 5L), ("a", 9L), ("b", 2L),
      ("b", 4L), ("c", 7L)).toDF("g", "v")
    val base = facts0.groupBy("g").agg(
      count(lit(1)).as("n"), sum("v").as("s"),
      min("v").as("lo"), max("v").as("hi"))
    // delta: delete a's max 9 (rescan!), insert a->3; delete both b
    // rows and insert b->6 (rescan, survives); delete c entirely;
    // brand-new d->8
    val delta = Seq(
      ("a", 9L, -1), ("a", 3L, 1),
      ("b", 2L, -1), ("b", 4L, -1), ("b", 6L, 1),
      ("c", 7L, -1), ("d", 8L, 1))
      .toDF("g", "v", "op")
      .select(col("g"), col("op"),
        col("v").as("s"), col("v").as("lo"), col("v").as("hi"))
    val facts1 = Seq(("a", 1L), ("a", 5L), ("a", 3L), ("b", 6L),
      ("d", 8L)).toDF("g", "v")
      .select(col("g"), col("v").as("lo"), col("v").as("hi"))
    val got = IncrementalAgg.mergeDeltaWithRetractions(base, delta,
        facts1, Seq("g"), "op",
        counts = Seq("n"), sums = Seq("s"),
        mins = Seq("lo"), maxs = Seq("hi"))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("a", 3L, 9L, 1L, 5L),  // 15-9+3=9; max rescanned 9->5
      ("b", 1L, 6L, 6L, 6L),
      ("d", 1L, 8L, 8L, 8L))  // c emptied and removed
  }
}
