package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Scale utilities: salted aggregation correctness and the
  * zero-Exchange bucketed-join plan shape. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregate equals plain aggregate on a skewed key") {
    // 10k rows for key "hot", a handful elsewhere — the skew shape
    val skewed = spark.range(10000).select(lit("hot").as("k"),
        (col("id") % 7).cast("double").as("v"))
      .unionAll(spark.range(5).select(concat(lit("cold"), col("id")).as("k"),
        col("id").cast("double").as("v")))
    val salted = Scale.saltedAggregate(skewed, Seq("k"), Seq("v"), 8)
      .orderBy("k").collect()
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .orderBy("k").collect()
    salted.length shouldBe plain.length
    salted.zip(plain).foreach { case (s, p) =>
      s.getString(0) shouldBe p.getString(0)
      s.getLong(1) shouldBe p.getLong(1)
      s.getDouble(2) shouldBe p.getDouble(2) +- 1e-9
    }
    // and the salted phase-1 actually fans the hot key out (salt is the
    // retry-stable content hash — same formula as Scale.deterministicSalt)
    val phase1Groups = skewed.withColumn("__salt",
      pmod(abs(hash(spark_partition_id(), col("k"), col("v"))), lit(8)))
      .filter(col("k") === "hot").select("__salt").distinct().count()
    phase1Groups should be > 1L
  }

  test("salted join equals the plain join on a skewed key") {
    val fact = spark.range(5000).select(
        when(col("id") % 10 === 0, lit("hot"))
          .otherwise(concat(lit("k"), (col("id") % 97).cast("string")))
          .as("k"),
        col("id").as("v"))
    val dim = Seq(("hot", 1L), ("k3", 2L), ("k50", 3L)).toDF("k", "d")
    val salted = Scale.saltedJoin(fact, dim, "k", 8)
      .select("k", "v", "d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    salted shouldBe plain
    salted should not be empty
  }

  test("salting works on tables with map columns and prunable scans") {
    // hash() rejects MapType — the salt must skip map columns
    val fact = spark.range(100).select(
      concat(lit("k"), (col("id") % 5).cast("string")).as("k"),
      col("id").cast("double").as("v"),
      map(lit("a"), col("id").cast("string")).as("attrs"))
    val dim = Seq(("k1", 10L), ("k3", 30L)).toDF("k", "d")
    Scale.saltedJoin(fact, dim, "k", 4).count() shouldBe 40
    Scale.saltedAggregate(fact, Seq("k"), Seq("v"), 4).count() shouldBe 5
  }

  test("partitioned layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = spark.range(300).select(
      col("id"),
      element_at(array(lit("click"), lit("view"), lit("error")),
        (col("id") % 3 + 1).cast("int")).as("event_type"),
      (col("id") % 7).as("v"))
    Scale.writePartitioned(events, dir, Seq("event_type"))
    // one directory per value
    new java.io.File(dir).listFiles().count(_.getName.startsWith(
      "event_type=")) shouldBe 3
    val filtered = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    // the filter lands in PartitionFilters (directory pruning), not in
    // a post-scan Filter over all rows
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head
      .toString
    scan should include ("PartitionFilters")
    scan should include ("event_type")
    filtered.count() shouldBe 100
  }

  test("pivot spreads groups to columns and unpivot inverts it") {
    val df = Seq((1L, "click"), (1L, "click"), (1L, "view"), (2L, "view"))
      .toDF("user", "event_type")
    val types = Seq("click", "view")
    val wide = df.groupBy(col("user")).pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    wide.orderBy("user").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 2L, 1L), (2L, 0L, 1L))
    // unpivot (melt) restores the long form
    val long = wide.unpivot(Array(col("user")),
        types.map(col).toArray, "event_type", "n")
      .filter(col("n") > 0)
    long.orderBy("user", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, "click", 2L), (1L, "view", 1L), (2L, "view", 1L))
  }

  test("bucketed join runs without a shuffle exchange") {
    val left = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("a"))
    val right = spark.range(1000).select(col("id").as("k"),
      (col("id") * 3).as("b"))
    Scale.writeBucketed(left, "bkt_left", "k", 4)
    Scale.writeBucketed(right, "bkt_right", "k", 4)
    // tiny test tables would broadcast (planner then ignores buckets);
    // force the shuffle-join path the assertion is about
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include ("SortMergeJoin")
      // co-located buckets: no hash-partitioning exchange on either side
      plan should not include ("Exchange hashpartitioning")
      joined.count() shouldBe 1000
      // control: the same join on plain (non-bucketed) frames shuffles
      val controlPlan = left.join(right, Seq("k"))
        .queryExecution.executedPlan.toString
      controlPlan should include ("Exchange hashpartitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("spread: widens starved scans, no-ops elsewhere, keeps rows (r12)") {
    val target = spark.sparkContext.defaultParallelism
    // single-partition source (the single-file fixture shape)
    val narrow = spark.range(0, 1000, 1, 1).toDF("id")
    val widened = Scale.spread(narrow)
    widened.rdd.getNumPartitions shouldBe target
    widened.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) shouldBe
      (999L * 1000L / 2L)
    widened.count() shouldBe 1000L
    // already-parallel source: untouched (same plan, no exchange added)
    val wide = spark.range(0, 1000, 1, target).toDF("id")
    Scale.spread(wide).queryExecution.executedPlan.toString should
      not include ("Exchange")
  }

  test("spread: post-shuffle input returns unchanged without executing " +
      "stages (r13 contract hardening)") {
    import org.apache.spark.sql.functions._
    // aggregate output = exchange-bearing plan; spread must not probe
    // .rdd on it (which would materialize the shuffle stage eagerly
    // under AQE) — it returns the frame untouched
    val shuffled = spark.range(0, 1000, 1, 1).toDF("id")
      .groupBy((col("id") % 7).as("k")).agg(sum(col("id")).as("s"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = Scale.spread(shuffled)
      out should be theSameInstanceAs shuffled
      spark.sparkContext.listenerBus.waitUntilEmpty()
      jobs.get() shouldBe 0
    } finally spark.sparkContext.removeSparkListener(l)
    // scan-shaped inputs still probe and widen
    Scale.scanShaped(shuffled.queryExecution.logical) shouldBe false
    val narrowUnion = spark.range(0, 10, 1, 1).toDF("id")
      .unionAll(spark.range(10, 20, 1, 1).toDF("id"))
      .filter(col("id") >= 0).select(col("id"))
    Scale.scanShaped(narrowUnion.queryExecution.logical) shouldBe true
  }
}
