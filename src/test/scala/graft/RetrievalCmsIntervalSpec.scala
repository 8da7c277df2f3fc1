package graft

import org.apache.spark.sql.functions._
import graft.operators.{IntervalJoin, Retrieval, Sketches}

/** Round-4 additions: BM25 retrieval, the count-min frequency sketch,
  * and the binned large×large interval overlap join. */
class RetrievalCmsIntervalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ BM25

  private val corpus = Seq(
    (1L, "spark hash join hash"),       // dl 4: hash x2, join
    (2L, "sort merge join"),            // dl 3: join
    (3L, "hash table scan scan scan"),  // dl 5: hash
    (4L, "filter filter filter"),       // dl 3: neither
    (5L, "")                            // dl 0
  ).toDF("doc_id", "text")

  private def bm25Reference(
      tf: Long, df: Long, dl: Long, n: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double =
    ((n.toDouble - df + 0.5) / (df + 0.5)) *
      ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))

  test("bm25 matches a hand-computed reference on a tiny corpus") {
    val queries = Seq(("q1", "hash"), ("q1", "join")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap

    val n = 5L; val avgdl = 15.0 / 5.0
    // doc 1: hash tf=2 df=2, join tf=1 df=2 -> sorted fold (asc)
    val d1Terms = Seq(bm25Reference(2, 2, 4, n, avgdl),
      bm25Reference(1, 2, 4, n, avgdl)).sorted
    val d1 = d1Terms.foldLeft(0.0)(_ + _)
    val d2 = bm25Reference(1, 2, 3, n, avgdl)
    val d3 = bm25Reference(1, 2, 5, n, avgdl)

    out(("q1", 1L))._2 shouldBe d1
    out(("q1", 1L))._3 shouldBe 2L // both terms matched
    out(("q1", 2L))._2 shouldBe d2 // join-only doc beats longer hash-only doc
    out(("q1", 3L))._2 shouldBe d3
    out.keySet shouldBe Set(("q1", 1L), ("q1", 2L), ("q1", 3L))
  }

  test("bm25 top-k truncates and ranks deterministically") {
    val queries = Seq(("f", "filter")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, k = 1)
      .collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 4L
    out.head.getLong(1) shouldBe 1L
  }

  test("bm25 is partitioning-invariant (bit-exact scores)") {
    val queries = Seq(("q1", "hash"), ("q1", "join"), ("q2", "scan"))
      .toDF("query_id", "term")
    def run(parts: Int) =
      Retrieval.bm25TopK(corpus.repartition(parts), "doc_id", "text",
          queries, k = 10)
        .orderBy("query_id", "rank").collect().toSeq
    run(1) shouldBe run(7)
  }

  // ------------------------------------------------- count-min sketch

  test("cms estimates are >= exact counts and exact without collisions") {
    val d = 4; val w = 1024
    val items = (1 to 50).flatMap(i => Seq.fill(i)(i.toLong)).toDF("v")
    val sk = items.agg(Sketches.cmsSketch(col("v"), d, w).as("sk"))
    val est = spark.range(1, 51).toDF("probe")
      .crossJoin(sk)
      .select(col("probe"),
        Sketches.cmsEstimate(col("sk"), col("probe"), d, w).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { i => est(i.toLong) should be >= i.toLong }
    // 50 items in 4x1024 buckets: expect at least most rows collision-free
    val exactHits = (1 to 50).count(i => est(i.toLong) == i.toLong)
    exactHits should be >= 45
  }

  test("cms is partitioning-invariant (merge is elementwise addition)") {
    val items = (1 to 500).map(i => (i % 37).toLong).toDF("v")
    def sketch(parts: Int): Seq[Long] =
      items.repartition(parts)
        .agg(Sketches.cmsSketch(col("v"), 4, 64)).head()
        .getSeq[Long](0)
    sketch(1) shouldBe sketch(13)
  }

  test("cms counters total d * rowcount") {
    val items = (1 to 200).map(_.toLong % 11).toDF("v")
    val counters = items.agg(Sketches.cmsSketch(col("v"), 3, 32)).head()
      .getSeq[Long](0)
    counters.length shouldBe 3 * 32
    counters.sum shouldBe 3L * 200
  }

  test("cms unseen item estimates 0 when its buckets are empty") {
    val items = Seq(1L).toDF("v")
    val sk = items.agg(Sketches.cmsSketch(col("v"), 4, 4096).as("sk"))
    val e = sk.select(
      Sketches.cmsEstimate(col("sk"), lit(999999L), 4, 4096)).head().getLong(0)
    e shouldBe 0L
  }

  // ---------------------------------------------------- interval join

  private def naiveOverlap(
      li: org.apache.spark.sql.DataFrame,
      ri: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    li.join(ri, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlapJoin equals the naive theta join across bin widths") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(40))
    }.toDF("lid", "ls", "le")
    val right = (1 to 200).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(60))
    }.toDF("rid", "rs", "re")
    val expected = naiveOverlap(left, right)
    expected.size should be > 100 // fixture sanity: real overlap density
    for (binW <- Seq(1L, 7L, 32L, 4096L)) {
      val got = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", binW)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe expected
    }
  }

  test("overlapJoin emits each overlapping pair exactly once") {
    // long intervals spanning many bins: the max-start-bin rule must
    // dedup without a distinct
    val left = Seq((1L, 0L, 100L), (2L, 10L, 200L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 50L, 150L)).toDF("rid", "rs", "re")
    val out = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", 8L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    out.length shouldBe 2
    out.toSet shouldBe Set((1L, 10L), (2L, 10L))
  }

  test("overlapJoin handles touching endpoints (closed intervals)") {
    val left = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 10L, 20L), (11L, 11L, 20L)).toDF("rid", "rs", "re")
    val out = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", 5L)
      .select("rid").collect().map(_.getLong(0)).toSet
    out shouldBe Set(10L) // [0,10] meets [10,20]; [11,20] does not
  }

  test("mmrDiversify: redundancy penalized, hand-computed greedy") {
    import graft.operators.Retrieval
    // candidates for one query: a & b are near-duplicates with top
    // relevance; c is less relevant but orthogonal to both
    val cands = Seq(
      (1L, 1L, 100L, Seq(10, 0, 0)),   // a
      (1L, 2L, 99L, Seq(10, 1, 0)),    // b ~ a (sim 100)
      (1L, 3L, 60L, Seq(0, 0, 10)),    // c ⊥ a,b (sim 0)
      (1L, 4L, 10L, Seq(0, 10, 0))
    ).toDF("qid", "id", "rel", "qv")
    val out = Retrieval.mmrDiversify(cands, "qid", "id", "rel", "qv", 3)
      .orderBy("sel_rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(4)))
    // step1: pure relevance -> a (score 100)
    // step2: b scores 99-100=-1, c scores 60-0=60 -> c wins DESPITE
    // lower relevance (the point of MMR); step3: b (99-100=-1) vs
    // d (10-0=10) -> d
    out.toSeq shouldBe Seq((1, 1L, 100L), (2, 3L, 60L), (3, 4L, 10L))
    // ties break on smaller id; k caps at candidate count
    val tie = Seq((9L, 5L, 50L, Seq(1, 0)), (9L, 4L, 50L, Seq(0, 1)))
      .toDF("qid", "id", "rel", "qv")
    val t = Retrieval.mmrDiversify(tie, "qid", "id", "rel", "qv", 5)
      .orderBy("sel_rank").collect().map(_.getLong(2)).toSeq
    t shouldBe Seq(4L, 5L)
  }

  test("rakeKeywords: hand-traced phrases, stopword and punct splits") {
    // doc: "deep learning of neural nets. deep nets" stop={of}
    //   phrases: [deep learning] [neural nets] | [deep nets]
    // deep: freq 2, deg 2+2; learning: 1, 2; neural: 1, 2; nets: 2, 4
    val df = Seq((1L, "deep learning of neural nets. deep nets"))
      .toDF("doc_id", "text")
    val got = Retrieval.rakeKeywords(df, "doc_id", "text", Seq("of"))
      .orderBy("word")
      .as[(String, Long, Long, Double)].collect()
    got shouldBe Array(
      ("deep", 2L, 4L, 2.0), ("learning", 1L, 2L, 2.0),
      ("nets", 2L, 4L, 2.0), ("neural", 1L, 2L, 2.0))
    // a doc of only stopwords/punct contributes nothing
    Retrieval.rakeKeywords(
      Seq((2L, "of, of! of")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("of")).count() shouldBe 0L
    // phrase ids do not leak across fragments: "x. y" is two
    // length-1 phrases, not one of length 2
    val fr = Retrieval.rakeKeywords(
      Seq((3L, "alpha. beta")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("of")).orderBy("word")
      .as[(String, Long, Long, Double)].collect()
    fr.map(_._3).toSeq shouldBe Seq(1L, 1L)
  }
}
