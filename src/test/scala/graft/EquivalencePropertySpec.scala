package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import graft.functions.{TextAnalysis => TA}
import graft.operators.Dedup

/** Randomized equivalence hardening: every codegen'd hot-path expression
  * must agree with its Column-composition reference form over a few
  * hundred adversarial random inputs (unicode, whitespace runs, empty
  * and short strings, negative/zero vectors). Seeded — failures
  * reproduce. */
class EquivalencePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)
  private val alphabets = Vector(
    "abcdefg hij",                       // ascii + spaces
    "абвгд её ж",                        // cyrillic (2-byte utf8)
    "日本語テキスト",                     // cjk (3-byte utf8)
    "a\tb  c\nd",                        // whitespace variety
    "x")
  private def randomText(): String = {
    val ab = alphabets(rnd.nextInt(alphabets.length))
    val n = rnd.nextInt(60)
    (0 until n).map(_ => ab(rnd.nextInt(ab.length))).mkString
  }

  test("shingles/minhash-bands/simhash agree with composed forms on random text") {
    val texts = (0 until 300).map(_ => randomText()).toDF("text")
    val sh = TA.charShingles(col("text"), 4)
    val bandsFast = ColumnBridge.column(
      graft.expressions.MinHashBandsExpression(
        ColumnBridge.expression(sh), 4, 4))
    val toks = TA.tokens(col("text"))
    val rows = texts.select(
      sh.as("sh_fast"), TA.charShinglesComposed(col("text"), 4).as("sh_ref"),
      bandsFast.as("b_fast"),
      Dedup.lshBandKeysFromShingles(sh, 4, 4).as("b_ref"),
      Dedup.simhash32(toks).as("sim_fast"),
      Dedup.simhash32Composed(toks).as("sim_ref")).collect()
    rows.foreach { r =>
      r.getSeq[String](0).sorted shouldBe r.getSeq[String](1).sorted
      r.getSeq[String](2) shouldBe r.getSeq[String](3)
      r.getLong(4) shouldBe r.getLong(5)
    }
  }

  test("hashed-long intersect equals string intersect on random pairs") {
    val pairs = (0 until 300).map(_ => (randomText(), randomText()))
      .toDF("a", "b")
    val sa = TA.charShingles(col("a"), 4)
    val sb = TA.charShingles(col("b"), 4)
    def hashed(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      graft.expressions.HashedShinglesExpression(ColumnBridge.expression(c)))
    val fast = ColumnBridge.column(
      graft.expressions.SortedLongIntersectSizeExpression(
        ColumnBridge.expression(hashed(sa)),
        ColumnBridge.expression(hashed(sb))))
    val slowStr = ColumnBridge.column(
      graft.expressions.SortedIntersectSizeExpression(
        ColumnBridge.expression(sa), ColumnBridge.expression(sb)))
    val rows = pairs.select(fast.as("fast"),
      org.apache.spark.sql.functions.size(array_intersect(sa, sb)).as("ref"),
      slowStr.as("merge")).collect()
    rows.foreach { r =>
      r.getInt(0) shouldBe r.getInt(1)
      r.getInt(2) shouldBe r.getInt(1)
    }
  }

  test("codegen'd morton interleave equals the per-bit composed form") {
    val coords = (0 until 300).map(_ =>
      (rnd.nextLong(1L << 20), rnd.nextLong(1L << 20))).toDF("x", "y")
    val fast = graft.operators.Layout.zkey(col("x"), col("y"), bits = 20)
    // reference: Σ ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1)
    val ref = (0 until 20).map { i =>
      shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    coords.select(fast.as("f"), ref.as("r")).collect()
      .foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("applyChangelog equals the event-by-event sequential fold") {
    // property: net-effect compaction == applying every event one at a
    // time in seq order (upsert via UpdateJob.upsert, delete via
    // DeleteJob.deleteByKeys) — the correctness claim that lets a CDC
    // consumer batch an arbitrary window of its log
    import graft.operators.{DeleteJob, UpdateJob}
    for (trial <- 0 until 3) {
      val nKeys = 6
      val base = (0 until nKeys).map(k => (k.toLong, s"base-$k"))
        .toDF("id", "v")
      val events = (0 until 15).map { i =>
        val key = rnd.nextInt(nKeys + 2).toLong // some keys absent in base
        val op = if (rnd.nextInt(3) == 0) "delete" else "upsert"
        (key, s"t$trial-e$i", (i + 1).toLong, op)
      }
      val compacted = UpdateJob.applyChangelog(base,
          events.toDF("id", "v", "seq", "op"), Seq("id"), "seq", "op")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // sequential reference fold on a plain Scala map
      val ref = events.sortBy(_._3).foldLeft(
        base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap) {
        case (state, (k, v, _, op)) =>
          if (op == "delete") state - k else state + (k -> v)
      }
      compacted shouldBe ref
      // and the DataFrame single-event ops agree too (one spot event)
      val (k0, v0, _, op0) = events.maxBy(_._3)
      val oneOp =
        if (op0 == "delete")
          DeleteJob.deleteByKeys(base, Seq(k0).toDF("id"), Seq("id"))
        else UpdateJob.upsert(base, Seq((k0, v0)).toDF("id", "v"), Seq("id"))
      val oneRef =
        if (op0 == "delete")
          base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap - k0
        else base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap +
          (k0 -> v0)
      oneOp.collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
        oneRef
    }
  }

  test("codegen'd cosine equals composed cosine on random vectors") {
    val vecs = (0 until 300).map { _ =>
      val d = 1 + rnd.nextInt(16)
      def v() = (0 until d).map(_ => (rnd.nextDouble() - 0.5) *
        math.pow(10, rnd.nextInt(6) - 3)).toSeq
      val a = v()
      (a, if (rnd.nextInt(5) == 0) Seq.fill(d)(0.0) else v())
    }.toDF("a", "b")
    val rows = vecs.select(
      Dedup.cosine(col("a"), col("b")).as("fast"),
      Dedup.cosineComposed(col("a"), col("b")).as("ref")).collect()
    rows.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }
}
