package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, TimeSeries, UpdateJob}

/** Unit pins for the round-6 operator additions: full ANSI MERGE INTO
  * (clause presence/absence/conditions, cardinality guard), per-node
  * clustering coefficient (hand-checkable graph), and the ordered
  * per-key time-series folds (EWMA recurrence, jump census). */
class MergeClusteringTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0))
    .toDF("k", "name", "bal")

  test("mergeInto: all four clauses fire on their own rows") {
    val src = Seq(
      (1, "A", 5.0),   // matched, lower bal -> update cond false -> keep base
      (2, "B", 99.0),  // matched, higher bal -> update
      (3, "C", 31.0),  // matched, delete cond (name C)
      (9, "I", 1.0))   // not matched -> insert
      .toDF("k", "name", "bal")
    val out = UpdateJob.mergeInto(base, src, Seq("k"),
        whenMatchedDelete = Some(col("src_name") === "C"),
        whenMatchedUpdate = Some(col("src_bal") > col("bal")),
        whenNotMatchedInsert = Some(lit(true)),
        whenNotMatchedBySourceDelete = Some(col("k") === 4))
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    out shouldBe Seq((1, "a", 10.0), (2, "B", 99.0), (9, "I", 1.0))
  }

  test("mergeInto: absent clauses are no-ops (ANSI defaults)") {
    val src = Seq((2, "B", 99.0), (9, "I", 1.0)).toDF("k", "name", "bal")
    // no clauses at all: nothing changes
    UpdateJob.mergeInto(base, src, Seq("k"))
      .orderBy("k").collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 2, 3, 4)
    // only insert: base untouched, new key appended
    UpdateJob.mergeInto(base, src, Seq("k"),
        whenNotMatchedInsert = Some(lit(true)))
      .orderBy("k").collect().map(_.getInt(0)).toSeq shouldBe
      Seq(1, 2, 3, 4, 9)
  }

  test("mergeInto: matched delete wins over update; duplicate source rejected") {
    val src = Seq((2, "B", 99.0)).toDF("k", "name", "bal")
    val out = UpdateJob.mergeInto(base, src, Seq("k"),
      whenMatchedDelete = Some(lit(true)),
      whenMatchedUpdate = Some(lit(true)))
    out.orderBy("k").collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 3, 4)
    val dup = Seq((2, "B", 1.0), (2, "B2", 2.0)).toDF("k", "name", "bal")
    intercept[IllegalArgumentException] {
      UpdateJob.mergeInto(base, dup, Seq("k"),
        whenMatchedUpdate = Some(lit(true)))
    }
  }

  test("clusteringCoefficient: triangle-plus-tail hand check") {
    // triangle 1-2-3 plus pendant 4 attached to 1
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val out = Graph.clusteringCoefficient(e, "s", "d")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // node 1: deg 3, 1 triangle, c = 2/(3*2) = 1/3
    out(0) shouldBe ((1L, 3L, 1L, 1.0 / 3.0))
    out(1) shouldBe ((2L, 2L, 1L, 1.0))
    out(2) shouldBe ((3L, 2L, 1L, 1.0))
    out(3) shouldBe ((4L, 1L, 0L, 0.0))
  }

  test("mergeClusters == full recompute, including singleton bridging") {
    import graft.operators.Dedup
    import spark.implicits._
    // old graph: {1,2,3} and {10,11}; new pairs bridge 3-10 and attach
    // brand-new node 20 to 11; node 30 pairs with former singleton 31
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val newPairs = Seq((3L, 10L), (20L, 11L), (30L, 31L)).toDF("id1", "id2")
    val oldAssign = Dedup.connectedComponents(oldPairs)
    val merged = Dedup.mergeClusters(oldAssign, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.connectedComponents(
        oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    merged shouldBe full
    merged(20L) shouldBe 1L // bridged mega-cluster keeps min id 1
    merged(31L) shouldBe 30L
  }

  test("holt level+trend recurrence, hand-computed") {
    import spark.implicits._
    // xs = 1,2,3,4 at alpha=1/4, beta=1/8 (hand-traced):
    // l1=1,t1=0; l2=1.25,t2=0.03125; l3=1.7109375,t3=0.0849609375;
    // l4=2.346923828125,t4=0.153839111328125
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (1L, 4L, 4.0), (2L, 1L, 7.0)).toDF("k", "t", "v")
    val out = TimeSeries.holt(df, Seq("k"), Seq(col("t")), col("v"))
      .orderBy("k").collect()
    out(0).getLong(1) shouldBe 4L
    out(0).getDouble(2) shouldBe 2.346923828125
    out(0).getDouble(3) shouldBe 0.153839111328125
    out(0).getDouble(4) shouldBe (2.346923828125 + 0.153839111328125)
    // single observation: level = x, trend = 0
    out(1).getDouble(2) shouldBe 7.0
    out(1).getDouble(3) shouldBe 0.0
    // partitioning invariance (ordered fold, not arrival order)
    TimeSeries.holt(df.repartition(5), Seq("k"), Seq(col("t")),
        col("v")).orderBy("k").collect()(0)
      .getDouble(2) shouldBe 2.346923828125
  }

  test("ewma recurrence and jump census fold in order") {
    val df = Seq((1, 1, 8.0), (1, 2, 4.0), (1, 3, 100.0), (2, 1, 7.0))
      .toDF("k", "t", "v")
    val ew = TimeSeries.ewma(df, Seq("k"), Seq(col("t")), col("v"), 0.25)
      .orderBy("k").collect()
    // k=1: y1=8; y2=4*.25+8*.75=7; y3=100*.25+7*.75=30.25
    ew(0).getLong(1) shouldBe 3L
    ew(0).getDouble(2) shouldBe 100.0
    ew(0).getDouble(3) shouldBe 30.25
    // single-observation key: ewma = the value
    ew(1).getLong(1) shouldBe 1L
    ew(1).getDouble(3) shouldBe 7.0
    val jc = TimeSeries.jumpCensus(df, Seq("k"), Seq(col("t")), col("v"),
        tau = 50.0)
      .orderBy("k").collect()
    jc(0).getLong(2) shouldBe 1L // only the 4 -> 100 jump exceeds 50
    jc(1).getLong(2) shouldBe 0L
  }

  test("cusum: window closed form equals the sequential recurrence") {
    // reference: s_i = max(0, s_{i-1} + x - k), alarms where s > h
    def ref(xs: Seq[Long], k: Long, h: Long): (Long, Long, Long) = {
      var s = 0L; var mx = 0L; var alarms = 0L
      xs.foreach { x =>
        s = math.max(0L, s + x - k)
        mx = math.max(mx, s); if (s > h) alarms += 1
      }
      (mx, s, alarms)
    }
    val xs = Seq(5L, 30L, 2L, 0L, 50L, 45L, 1L, 80L, 3L, 3L, 90L)
    val (mx, fin, al) = ref(xs, k = 10L, h = 40L)
    val df = xs.zipWithIndex
      .map { case (x, i) => ("u", i.toLong, x) }.toDF("k", "t", "x")
    val got = TimeSeries.cusum(df, Seq("k"), Seq(col("t")), col("x"),
      k = 10L, h = 40L).head()
    got.getLong(1) shouldBe xs.length.toLong // n_obs
    got.getLong(2) shouldBe mx
    got.getLong(3) shouldBe fin
    got.getLong(4) shouldBe al
  }

  test("cusum: resets clamp at zero and result is partition-invariant") {
    // deep negative drift then a spike: the reset must forget the hole
    val xs = Seq(0L, 0L, 0L, 100L)
    val df = xs.zipWithIndex
      .map { case (x, i) => ("u", i.toLong, x) }.toDF("k", "t", "x")
    val r = TimeSeries.cusum(df, Seq("k"), Seq(col("t")), col("x"),
      k = 10L, h = 1000L).head()
    r.getLong(2) shouldBe 90L // NOT 100-40: the floor held at 0
    r.getLong(3) shouldBe 90L
    val big = (1 to 400).map(i => ("u" + (i % 3), i.toLong,
      (i * 31 % 97).toLong)).toDF("k", "t", "x")
    TimeSeries.cusum(big, Seq("k"), Seq(col("t")), col("x"), 40L, 100L)
      .orderBy("k").collect() shouldBe
      TimeSeries.cusum(big.repartition(17), Seq("k"), Seq(col("t")),
        col("x"), 40L, 100L).orderBy("k").collect()
  }

  test("seasonalIndex: flat series -> all 1.0; hand-computed ratios") {
    val flat = (1 to 14).map(i => ("k", (i % 7).toLong, 50L))
      .toDF("k", "wd", "v")
    TimeSeries.seasonalIndex(flat, Seq("k"), col("wd"), col("v"))
      .select("s_index").as[Double].collect()
      .foreach(_ shouldBe 1.0)
    // bucket a: mean 10; bucket b: mean 30; overall mean 20
    val two = Seq(("k", "a", 10L), ("k", "a", 10L),
      ("k", "b", 30L), ("k", "b", 30L)).toDF("k", "wd", "v")
    TimeSeries.seasonalIndex(two, Seq("k"), col("wd"), col("v"))
      .orderBy("bucket").select("s_index").as[Double]
      .collect().toSeq shouldBe Seq(0.5, 1.5)
  }

  test("lagAutocorr: alternating -> -1, trend -> +1, constant -> NULL") {
    def series(xs: Seq[Long]) = xs.zipWithIndex
      .map { case (x, i) => ("u", i.toLong, x) }.toDF("k", "t", "x")
    val alt = TimeSeries.lagAutocorr(series(Seq(1L, 9L, 1L, 9L, 1L, 9L)),
      Seq("k"), Seq(col("t")), col("x")).head()
    alt.getDouble(2) shouldBe -1.0 +- 1e-12
    val up = TimeSeries.lagAutocorr(series((1L to 10L)),
      Seq("k"), Seq(col("t")), col("x")).head()
    up.getDouble(2) shouldBe 1.0 +- 1e-12
    val const = TimeSeries.lagAutocorr(series(Seq(5L, 5L, 5L)),
      Seq("k"), Seq(col("t")), col("x")).head()
    const.isNullAt(2) shouldBe true
  }
}
