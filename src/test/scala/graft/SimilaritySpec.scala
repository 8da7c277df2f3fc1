package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, Similarity}

/** Top-k similarity + LSH candidate-generation scale behavior: the
  * bounded-heap top-k must equal the window form, the IVF plan must not
  * sort-shuffle the centroid expansion, and pathological LSH buckets must
  * be droppable. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dims: Int = 8) = {
    // deterministic pseudo-random vectors (md5-free: fine for specs)
    (0 until n).map { i =>
      (i.toLong, (0 until dims).map(d => math.sin(i * 31 + d * 7).abs).toSeq)
    }.toDF("vec_id", "e")
  }

  test("bruteForceTopK equals the row_number window form") {
    val all = vecs(60)
    val queries = all.filter(col("vec_id") % 10 === 0)
    val fast = Similarity.bruteForceTopK(queries, all, "vec_id", "e", 4)
      .orderBy(col("query_id"), col("rank")).collect()

    // reference: global window over every scored pair
    val ref = queries.select(col("vec_id").as("query_id"), col("e").as("__qe"))
      .join(all.select(col("vec_id").as("neighbor_id"), col("e").as("__ce")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("__qe"), col("__ce")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank")).collect()

    fast.length shouldBe ref.length
    fast.zip(ref).foreach { case (f, r) => f shouldBe r }
  }

  test("top-k plan has no Window sort over the scored cross product") {
    val all = vecs(20)
    val queries = all.filter(col("vec_id") % 5 === 0)
    val plan = Similarity.bruteForceTopK(queries, all, "vec_id", "e", 3)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include ("collect_top_k")
  }

  test("ivfTopK assignment aggregates instead of window-sorting n×k rows") {
    val all = vecs(40)
    val centroids = all.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
    val queries = all.filter(col("vec_id") % 20 === 0)
    val df = Similarity.ivfTopK(queries, all, "vec_id", "e", 3, centroids)
    df.queryExecution.executedPlan.toString should not include "Window"
    // every query gets rows and ranks start at 1
    val rows = df.collect()
    rows.map(_.getLong(0)).distinct.sorted shouldBe Array(0L, 20L)
    rows.filter(_.getLong(0) == 0L).map(_.getInt(1)).min shouldBe 1
  }

  test("assignToCentroids is map-only and matches a driver-side argmax") {
    val all = vecs(50)
    val centroids = all.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
    val assigned = Similarity.assignToCentroids(all, "vec_id", "e",
      centroids, "row_id")
    // the literal-argmax form must plan ZERO exchanges: the single
    // shuffle the old broadcast-join + row-id groupBy form paid carried
    // every row with its full embedding, for a partial aggregation that
    // reduced nothing (row-id groups are unique)
    assigned.queryExecution.executedPlan.toString should not include "Exchange"

    // independent oracle: plain-Scala cosine argmax, cos desc / id asc
    val data = all.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cs = centroids.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na > 0 && nb > 0) dot / (na * nb) else 0.0
    }
    val expected = data.map { case (id, v) =>
      id -> cs.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, s) => (-s, cid) }._1
    }.toMap
    val got = assigned.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got shouldBe expected
  }

  test("exactDedup keeps the smallest-id row per fingerprint, no window") {
    val docs = Seq(
      (5L, "same text here", "e"), (2L, "same  TEXT here ", "b"),
      (9L, "same text here", "x"), (3L, "unique one", "u"))
      .toDF("doc_id", "text", "tag")
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    out.queryExecution.executedPlan.toString should not include "Window"
    val rows = out.orderBy("doc_id").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(2L, 3L)
    // full original row survives (all columns, the keeper's values)
    rows(0).getString(2) shouldBe "b"
  }

  test("candidatePairs caps pathological buckets and keeps the rest") {
    // 12 docs share band "hot" (66 pairs); 2 docs share band "ok"
    val hot = (1 to 12).map(i => (i.toLong, Seq("hot")))
    val ok = Seq((100L, Seq("ok")), (101L, Seq("ok")))
    val df = (hot ++ ok).toDF("id", "bands")

    val uncapped = Dedup.candidatePairs(df, "id", "bands")
    uncapped.count() shouldBe 66 + 1

    val capped = Dedup.candidatePairs(df, "id", "bands", maxBucketSize = 10)
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    rows shouldBe Array((100L, 101L))
  }

  test("minhashNearDups: cap/storage/partition knobs preserve results") {
    val base = (0 until 40).map(i =>
      (i.toLong, s"document number $i with some shared vocabulary tokens"))
    val dups = Seq((1000L, base(3)._2), (1001L, base(7)._2 + " extra"))
    val corpus = (base ++ dups).toDF("doc_id", "text")

    // default now carries the finite DefaultMaxBucketSize cap — on a
    // corpus with no pathological bucket it must equal the explicitly
    // UNCAPPED run (the cap only drops oversized buckets, never pairs
    // from healthy ones), knobs or no knobs
    val default = Dedup.minhashNearDups(corpus, "doc_id", "text",
      shingleSize = 4, k = 16, bands = 4, threshold = 0.5)
      .orderBy("id1", "id2").collect()
    val tuned = Dedup.minhashNearDups(corpus, "doc_id", "text",
      shingleSize = 4, k = 16, bands = 4, threshold = 0.5,
      maxBucketSize = Int.MaxValue,
      storageLevel = org.apache.spark.storage.StorageLevel.MEMORY_ONLY,
      numPartitions = Some(8))
      .orderBy("id1", "id2").collect()
    default should not be empty
    tuned shouldBe default
    // the exact-copy pair survives with jaccard 1.0
    default.exists(r => r.getLong(0) == 3L && r.getLong(1) == 1000L &&
      r.getDouble(2) == 1.0) shouldBe true
  }

  test("ivfTopK nprobe widens recall toward brute force") {
    val all = vecs(60)
    val queries = all.filter(col("vec_id") % 15 === 0)
    val centroids = all.filter(col("vec_id") % 6 === 0)
      .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = resultSet(
      Similarity.bruteForceTopK(queries, all, "vec_id", "e", 3))
    val p1 = resultSet(
      Similarity.ivfTopK(queries, all, "vec_id", "e", 3, centroids))
    val p3 = resultSet(
      Similarity.ivfTopK(queries, all, "vec_id", "e", 3, centroids,
        nprobe = 3))
    // more probes can only add candidates: recall is monotone
    (p1 intersect exact).size should be <= (p3 intersect exact).size
    p3.size should be >= p1.size
  }

  test("multi-probe LSH widens recall over exact-bucket probing") {
    val all = vecs(80)
    val queries = all.filter(col("vec_id") % 20 === 0)
    val planes = Similarity.planeCoefficients(4, 8)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactTop = hits(Similarity.bruteForceTopK(queries, all, "vec_id", "e", 3))
    val single = hits(Similarity.lshTopK(queries, all, "vec_id", "e", 3, planes))
    val multi = hits(Similarity.lshTopK(queries, all, "vec_id", "e", 3, planes,
      multiProbe = true))
    // more probes -> at least as many candidates and at least the recall
    multi.size should be >= single.size
    (multi intersect exactTop).size should be >= (single intersect exactTop).size
  }

  test("embeddingNearDupsLsh finds bucketed near-dups, bounds the work") {
    val base = vecs(100)
    // near-identical copies (tiny first-dim perturbation keeps the sign
    // pattern): must share every hyperplane bucket with the original
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000).as("vec_id"),
        concat(array(element_at(col("e"), 1) * 1.001),
          slice(col("e"), 2, 100)).as("e"))
    val corpus = base.unionAll(copies)
    val planes = Similarity.planeCoefficients(4, 8)
    val lsh = Dedup.embeddingNearDupsLsh(corpus, "vec_id", "e", 0.999, planes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.embeddingNearDups(corpus, "vec_id", "e", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (i, i+1000) pair survives bucketing
    (0 until 100 by 10).foreach { i =>
      lsh should contain ((i.toLong, (i + 1000).toLong))
    }
    // LSH output is a subset of brute force (bucketing only prunes)
    lsh.subsetOf(brute) shouldBe true
  }

  test("trainCentroids recovers well-separated clusters") {
    // three tight clusters far apart in 4-d; k-means must put each
    // cluster's members on one centroid regardless of FP reduction order
    val bases = Vector(
      Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 0.0))
    val pts = (0 until 30).map { i =>
      (i.toLong, bases(i % 3).updated(3, 0.01 * (i / 3)))
    }.toDF("vec_id", "e")
    val cents = Similarity.trainCentroids(pts, "vec_id", "e", k = 3,
      iterations = 4)
    cents.count() shouldBe 3
    val assigned = Similarity.assignToCentroids(pts, "vec_id", "e",
      cents, "vec_id").collect()
    // each input cluster maps to exactly one centroid
    val byCluster = assigned.groupBy(r => r.getLong(0) % 3)
      .map { case (c, rows) => c -> rows.map(_.getLong(2)).distinct }
    byCluster.values.foreach(_.length shouldBe 1)
    byCluster.values.flatten.toSeq.distinct.length shouldBe 3
  }

  test("PQ: encode is deterministic and ADC recovers cluster neighbors") {
    // two tight clusters far apart in 8-d: after PQ compression, every
    // query's nearest ADC neighbors must come from its own cluster
    val bases = Vector(
      Seq(10.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 0.0, 0.0))
    val pts = (0 until 20).map { i =>
      (i.toLong, bases(i % 2).map(_ + 0.01 * (i / 2)))
    }.toDF("vec_id", "e")
    // deterministic codebooks: 4 sampled vectors' slices, m=2 subspaces
    val sampled = pts.filter(col("vec_id") < 4)
    val codebooks = (0 until 2).map { sp =>
      sampled.select(lit(sp).as("subspace"), col("vec_id").as("centroid_id"),
        slice(col("e"), sp * 4 + 1, 4).as("codeword"))
    }.reduce(_ unionAll _)
    val codes1 = Similarity.pqEncode(pts, "vec_id", "e", codebooks)
    val codes7 = Similarity.pqEncode(pts.repartition(7), "vec_id", "e",
      codebooks)
    codes1.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap shouldBe
      codes7.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes1.head().getSeq[Int](1).length shouldBe 2 // m codes per vector
    val queries = pts.filter(col("vec_id") < 2)
    val top = Similarity.pqTopK(queries, codes1, "vec_id", "e", codebooks,
        k = 5).collect()
    top.foreach { r =>
      // same-cluster parity: neighbor id has the query's parity
      (r.getLong(2) % 2) shouldBe (r.getLong(0) % 2)
    }
    // ranks ascend with distance per query
    top.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      byRank shouldBe byRank.sorted
    }
  }

  test("ivfPqTopK scores within probed lists and finds cluster neighbors") {
    val bases = Vector(
      Seq(10.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 0.0, 0.0))
    val pts = (0 until 20).map { i =>
      (i.toLong, bases(i % 2).map(_ + 0.01 * (i / 2)))
    }.toDF("vec_id", "e")
    // coarse quantizer: one representative per cluster
    val centroids = pts.filter(col("vec_id") < 2)
      .select(col("vec_id").as("centroid_id"), col("e").as("centroid"))
    val sampled = pts.filter(col("vec_id") < 4)
    val codebooks = (0 until 2).map { sp =>
      sampled.select(lit(sp).as("subspace"), col("vec_id").as("centroid_id"),
        slice(col("e"), sp * 4 + 1, 4).as("codeword"))
    }.reduce(_ unionAll _)
    val codes = Similarity.pqEncode(pts, "vec_id", "e", codebooks)
    val queries = pts.filter(col("vec_id") < 2)
    val top = Similarity.ivfPqTopK(queries, pts, codes, "vec_id", "e",
      centroids, codebooks, k = 5).collect()
    top.length shouldBe 10 // 2 queries x 5 (each list has 10 members)
    top.foreach { r =>
      (r.getLong(2) % 2) shouldBe (r.getLong(0) % 2) // same-cluster only
    }
  }

  test("trainPqCodebooks produces dense per-subspace ids and round-trips") {
    val bases = Vector(
      Seq(10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val pts = (0 until 16).map { i =>
      (i.toLong, bases(i % 2).map(_ + 0.01 * i))
    }.toDF("vec_id", "e")
    val cb = Similarity.trainPqCodebooks(pts, "vec_id", "e",
      m = 2, k = 2, dims = 8, iterations = 3)
    cb.select(col("subspace")).distinct().count() shouldBe 2
    cb.groupBy(col("subspace")).count().collect()
      .foreach(_.getLong(1) shouldBe 2L)
    // codewords have subspace length
    cb.head().getSeq[Double](2).length shouldBe 4
    // trained codebooks drive encode without error and yield m codes
    Similarity.pqEncode(pts, "vec_id", "e", cb)
      .head().getSeq[Int](1).length shouldBe 2
  }

  test("size-ratio prefilter is result-preserving at the threshold") {
    // doc pair with size ratio below threshold can never reach jaccard >=
    // threshold; verify the pipeline output equals an unfiltered
    // brute-force jaccard over all candidate pairs
    val corpus = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff"),
      (2L, "aaaa bbbb cccc dddd eeee ffgg"),
      (3L, "aaaa"),                       // tiny doc: ratio prunes it
      (4L, "zzzz yyyy xxxx wwww vvvv uuuu")).toDF("doc_id", "text")
    val out = Dedup.minhashNearDups(corpus, "doc_id", "text",
      shingleSize = 4, k = 16, bands = 4, threshold = 0.5).collect()
    // 1-2 are near dups; 3 must not appear even though it may share a band
    out.map(r => (r.getLong(0), r.getLong(1))) should contain ((1L, 2L))
    out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L) shouldBe false
  }

  test("semDeDup flags within-cluster cosine dups against lower ids") {
    // two well-separated clusters on orthogonal axes; ids 11/12 are
    // near-copies of 10, id 21 a near-copy of 20, id 30 unique in its
    // cluster
    def v(axis: Int, eps: Double) =
      (0 until 4).map(d => if (d == axis) 1.0 else eps).toSeq
    val docs = Seq(
      (10L, v(0, 0.0)), (11L, v(0, 0.01)), (12L, v(0, 0.02)),
      (20L, v(1, 0.0)), (21L, v(1, 0.01)), (30L, v(1, 0.3)),
    ).toDF("vec_id", "e")
    val centroids = Seq((0L, v(0, 0.0)), (1L, v(1, 0.0)))
      .toDF("centroid_id", "centroid")
    val dups = Dedup.semDeDup(docs, "vec_id", "e", centroids, tau = 0.999)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 11 dups 10; 12 dups both 10 and 11; 21 dups 20; 30 survives
    dups.toSeq shouldBe Seq(
      (11L, 0L, 10L, 1L), (12L, 0L, 10L, 2L), (21L, 1L, 20L, 1L))
    val kept = Dedup.dropSemanticDups(docs, "vec_id", "e", centroids,
      tau = 0.999).select("vec_id").as[Long].collect().sorted
    kept.toSeq shouldBe Seq(10L, 20L, 30L)
  }

  test("semDeDup cluster cap drops oversized clusters but keeps their rows") {
    def v(axis: Int, eps: Double) =
      (0 until 4).map(d => if (d == axis) 1.0 else eps).toSeq
    // cluster 0 has 4 members (over the cap of 3), cluster 1 has 2
    val docs = Seq(
      (1L, v(0, 0.0)), (2L, v(0, 0.01)), (3L, v(0, 0.02)), (4L, v(0, 0.03)),
      (20L, v(1, 0.0)), (21L, v(1, 0.01)),
    ).toDF("vec_id", "e")
    val centroids = Seq((0L, v(0, 0.0)), (1L, v(1, 0.0)))
      .toDF("centroid_id", "centroid")
    val dups = Dedup.semDeDup(docs, "vec_id", "e", centroids,
        tau = 0.999, maxClusterSize = 3)
      .select("vec_id").as[Long].collect().sorted
    dups.toSeq shouldBe Seq(21L) // cluster 0 skipped entirely
    // pruning must NOT delete the skipped cluster's rows
    val kept = Dedup.dropSemanticDups(docs, "vec_id", "e", centroids,
      tau = 0.999, maxClusterSize = 3).select("vec_id").as[Long].collect().sorted
    kept.toSeq shouldBe Seq(1L, 2L, 3L, 4L, 20L)
  }

  test("int8 quantization round-trips within the error bound") {
    val vecs = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.0)),
      (2L, Seq(0.001, 0.002, -0.003, 0.0015)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0)) // zero vector: scale 0, codes 0
    ).toDF("id", "v")
    val out = vecs.select(col("id"), col("v"),
        Similarity.quantizeInt8(col("v")).as("q"))
      .withColumn("d", Similarity.dequantizeInt8(col("q")))
      .collect().map(r => (r.getLong(0), r)).toMap

    // codes in [-127, 127], max-abs element maps to ±127 exactly
    val q1 = out(1L).getStruct(2).getSeq[Int](1)
    q1 shouldBe Seq(64, -127, 32, 0)
    out(1L).getStruct(2).getDouble(0) shouldBe 1.0
    // reconstruction error bounded by scale/254 per element
    for (id <- Seq(1L, 2L)) {
      val v = out(id).getSeq[Double](1)
      val d = out(id).getSeq[Double](3)
      val scale = out(id).getStruct(2).getDouble(0)
      v.zip(d).foreach { case (a, b) =>
        math.abs(a - b) should be <= scale / 254.0 + 1e-12
      }
    }
    // zero vector: all-zero codes, zero reconstruction
    out(3L).getStruct(2).getSeq[Int](1) shouldBe Seq(0, 0, 0, 0)
    out(3L).getSeq[Double](3) shouldBe Seq(0.0, 0.0, 0.0, 0.0)
  }

  test("knnLooEval: separable clusters classify perfectly, k ties break low") {
    // two tight clusters on orthogonal axes, labels 0 and 1
    val rows = Seq(
      (1L, Seq(10f, 0f, 0f, 1f), 0), (2L, Seq(9f, 1f, 0f, 0f), 0),
      (3L, Seq(10f, 1f, 0f, 0f), 0),
      (4L, Seq(0f, 0f, 10f, 1f), 1), (5L, Seq(0f, 1f, 9f, 0f), 1),
      (6L, Seq(0f, 0f, 10f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLooEval(rows, "vec_id", "embedding",
      "label", k = 2).orderBy("label").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq shouldBe
      Seq((0L, 3L, 3L, 1.0), (1L, 3L, 3L, 1.0))
    // partitioning invariance (deterministic integer ranking)
    Similarity.knnLooEval(rows.repartition(5), "vec_id", "embedding",
      "label", k = 2).orderBy("label").collect() shouldBe got
  }

  test("annRecallEval: identical-bucket corpus -> recall 1, split -> loss") {
    // all vectors along +x land in one LSH bucket -> recall@k = 1
    val planes = Similarity.planeCoefficients(2, 4)
    val sameBucket = (1 to 6).map(i =>
      (i.toLong, Seq(10f + i, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val q1 = sameBucket.filter(col("vec_id") === 1L)
    val r1 = Similarity.annRecallEval(q1, sameBucket, "vec_id",
      "embedding", planes, k = 3).head()
    r1.getLong(2) shouldBe 3L
    r1.getDouble(3) shouldBe 1.0
    // opposite-direction vectors land in the complementary bucket:
    // the true nearest (by int dot) of a +x query includes only +x
    // vectors anyway, so build a corpus where exact top-k spans both
    // buckets: two +x, two -x; query +x with k=3 -> approx misses the
    // cross-bucket members
    val mixed = Seq(
      (1L, Seq(10f, 0f, 0f, 0f)), (2L, Seq(9f, 0f, 0f, 0f)),
      (3L, Seq(-1f, 0f, 0f, 0f)), (4L, Seq(-2f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.annRecallEval(
      mixed.filter(col("vec_id") === 1L), mixed, "vec_id",
      "embedding", planes, k = 3).head()
    r2.getLong(1) shouldBe 1L // only vec 2 shares the bucket
    r2.getLong(2) shouldBe 1L
    r2.getDouble(3) shouldBe (1.0 / 3.0)
  }

  test("sortedNeighborhood: exact pair set, window edge, determinism") {
    // keys sort as b1 < b2 < b3 < c9 < d4; ranks 1..5
    val rows = Seq((10L, "b2"), (20L, "d4"), (30L, "b1"), (40L, "c9"),
      (50L, "b3")).toDF("id", "k")
    val got = Dedup.sortedNeighborhood(rows, "id", col("k"), 3)
      .select("rank1", "rank2").as[(Long, Long)].collect().toSeq.sorted
    // window 3: pairs with 0 < r2-r1 < 3
    got shouldBe Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L))
    // duplicate keys: id tiebreak keeps ranks (and pairs) stable
    val dup = Seq((7L, "x"), (3L, "x"), (5L, "x")).toDF("id", "k")
    val ranks = Dedup.sortedNeighborhood(dup, "id", col("k"), 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq.sorted
    ranks shouldBe Seq((3L, 5L), (5L, 7L)) // id order under equal keys
  }

  test("RecordLinkage.score: weights, null-field zero, thresholds") {
    import graft.operators.RecordLinkage
    import graft.operators.RecordLinkage.LinkField
    val pairs = Seq(
      (1L, 2L, true, Some(true)),   // 4000 + 300 = 4300 -> possible
      (3L, 4L, true, None),         // 4000 + 0   = 4000 -> possible
      (5L, 6L, false, Some(false)), // -1000 - 300 = -1300 -> nonlink
      (7L, 8L, true, Some(false))   // 4000 - 300 = 3700 -> possible
    ).toDF("id1", "id2", "nm", "bs")
    val out = RecordLinkage.score(pairs, Seq(
        LinkField("name", col("nm"), 4000L, -1000L),
        LinkField("bal", col("bs"), 300L, -300L)),
        upperMilli = 4300L, lowerMilli = 0L)
      .select("id1", "score_milli", "verdict")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    out shouldBe Seq((1L, 4300L, "link"), (3L, 4000L, "possible"),
      (5L, -1300L, "nonlink"), (7L, 3700L, "possible"))
  }

  // ------------------------------------------------------------- Pca

  test("gramMatrixInt8: exact triangle, partitioning-invariant") {
    import graft.operators.Pca
    // vectors quantize exactly: components are k/127-scaled already
    val rows = Seq(
      Array(127.0f, 0.0f, 127.0f),
      Array(0.0f, 127.0f, 0.0f),
      Array(127.0f, 127.0f, 0.0f)).map(Tuple1(_))
    val df = rows.toDF("v")
    val g1 = Pca.gramMatrixInt8(df.repartition(1), "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val g7 = Pca.gramMatrixInt8(df.repartition(7), "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    g1 shouldBe g7
    val s = 127L * 127L
    g1((0, 0)) shouldBe 2 * s // rows 1 and 3 have x=127
    g1((0, 1)) shouldBe s     // row 3 only
    g1((0, 2)) shouldBe s     // row 1 only
    g1((1, 1)) shouldBe 2 * s
    g1((1, 2)) shouldBe 0L
    g1((2, 2)) shouldBe s
    g1.size shouldBe 6
  }

  test("topEigen: recovers the known principal axis of rank-1 data") {
    import graft.operators.Pca
    // every row is k·(3,4): Gram = Σk² · [[9,12],[12,16]], top
    // eigenvector (0.6, 0.8), eigenvalue 25·Σk²
    val sumK2 = (1 to 5).map(k => k.toLong * k).sum
    val triangle = Array(
      (0, 0, 9 * sumK2), (0, 1, 12 * sumK2), (1, 1, 16 * sumK2))
    val (lambda, v) = Pca.topEigen(triangle)
    lambda shouldBe (25.0 * sumK2) +- 1e-6
    v(0) shouldBe 0.6 +- 1e-9
    v(1) shouldBe 0.8 +- 1e-9
  }

  test("mutualTopMatches: reciprocal pairs only, deterministic ties") {
    import spark.implicits._
    // 1<->2 mutual best (score 10); 3's best is 1 but 1's best is 2;
    // tie on (5,6): equal scores both ways -> argmax picks smaller dst
    val cands = Seq(
      (1L, 2L, 10L), (2L, 1L, 10L), (1L, 3L, 5L), (3L, 1L, 9L),
      (2L, 3L, 4L), (3L, 2L, 1L),
      (5L, 6L, 7L), (6L, 5L, 7L), (5L, 7L, 7L), (7L, 5L, 7L))
      .toDF("src", "dst", "score")
    val got = graft.operators.Similarity
      .mutualTopMatches(cands, "src", "dst", "score")
      .orderBy("id1").as[(Long, Long, Long)].collect().toSeq
    // 5's argmax ties between 6 and 7 -> smaller dst (6); 6's best is
    // 5 -> (5,6) mutual; 7->5 but 5->6, so 7 unmatched
    got shouldBe Seq((1L, 2L, 10L), (5L, 6L, 7L))
  }

  test("topEigen: sign fix and zero matrix") {
    import graft.operators.Pca
    val (l0, v0) = Pca.topEigen(Array((0, 0, 0L), (0, 1, 0L), (1, 1, 0L)))
    l0 shouldBe 0.0
    v0.length shouldBe 2
    // dominant axis along -e1 direction data still yields positive rep
    val (_, v1) = Pca.topEigen(Array((0, 0, 100L), (0, 1, 0L), (1, 1, 1L)))
    v1(0) should be > 0.0
  }

  test("hardNegatives: exact int8 dots, label filter, id tie-break, " +
      "multi-probe reach, no pair duplication") {
    // scale 1 everywhere -> q = 127·x exactly; sign bits from dims 1-2
    val df = Seq(
      (1L, Seq(1.0, 1.0, 1.0, 1.0), 0),
      (2L, Seq(1.0, 1.0, 1.0, -1.0), 1),
      (3L, Seq(1.0, 1.0, -1.0, 1.0), 1),
      (4L, Seq(-1.0, -1.0, -1.0, -1.0), 1))
      .toDF("vec_id", "emb", "label")
    val d2 = 2L * 127L * 127L // dot of two ±1 vectors agreeing on 3 dims
    val got = Similarity.hardNegatives(df, "vec_id", "emb", "label",
        k = 2, signBits = 2, probeFlips = 0)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    // anchor 1 (label 0) meets 2 and 3 in bucket 3: equal dots, so the
    // SMALLER neighbor_id ranks first; anchors 2/3 each see only 1;
    // anchor 4 sits alone in bucket 0 -> no rows
    got.toSeq shouldBe Seq(
      (1L, 0, 1, 2L, 1, d2), (1L, 0, 2, 3L, 1, d2),
      (2L, 1, 1, 1L, 0, d2), (3L, 1, 1, 1L, 0, d2))
    // two sign flips reach bucket 3 from bucket 0: anchor 4 now mines
    // its one different-label negative (all dims disagree -> -4·127²)
    val probed = Similarity.hardNegatives(df, "vec_id", "emb", "label",
        k = 3, signBits = 2, probeFlips = 2)
      .filter(col("query_id") === 4L).collect()
    probed.length shouldBe 1
    probed.head.getLong(3) shouldBe 1L
    probed.head.getLong(5) shouldBe -4L * 127L * 127L
    // probing never duplicates a pair: anchor 1 reaches all 4 buckets
    // at 2 flips and mines each different-label vector exactly once
    val full = Similarity.hardNegatives(df, "vec_id", "emb", "label",
        k = 10, signBits = 2, probeFlips = 2)
      .filter(col("query_id") === 1L)
    full.count() shouldBe 3L
    full.select("neighbor_id").distinct().count() shouldBe 3L
    an[IllegalArgumentException] should be thrownBy
      Similarity.hardNegatives(df, "vec_id", "emb", "label", k = 0)
  }
}
