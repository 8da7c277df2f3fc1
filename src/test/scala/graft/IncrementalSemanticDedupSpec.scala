package graft

import graft.operators.IncrementalSemanticDedup
import org.apache.spark.sql.functions._

/** Incremental semantic dedup: the all-seen-index contract (flag iff
  * any EARLIER doc is a bucket-mate within minDot) must make the
  * 3-batch run equal the one-shot run even on CHAINS — the exact case
  * a survivors-only index would get wrong — plus tag-idempotent
  * retries over the persistent index. */
class IncrementalSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // integer vectors with max-abs 127 quantize to themselves (scale
  // 127 → qv = x), so every dot below is exact and hand-checkable.
  // All share sign bucket 1 (dim 1 positive, dims 2-4 zero);
  // A·B = 23129, B·C = 23129, A·C = 16129 — a chain at minDot 20000.
  private val A = Seq(127.0, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0, 0.0)
  private val B = Seq(127.0, 0.0, 0.0, 0.0, 70.0, 70.0, 0.0, 0.0)
  private val C = Seq(127.0, 0.0, 0.0, 0.0, 0.0, 100.0, 0.0, 0.0)
  private val MinDot = 20000L

  private def run(batches: Seq[Seq[(Long, Seq[Double])]],
      idx: String): Seq[(Long, Boolean, Long, Option[Long], Option[Long])] =
    batches.zipWithIndex.flatMap { case (rows, b) =>
      val df = rows.toDF("doc_id", "e")
      IncrementalSemanticDedup
        .acceptBatch(df, "doc_id", "e", idx, s"day$b", MinDot)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
    }.sortBy(_._1)

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_isd_spec").toString

  test("3-batch incremental equals one-shot batch ON A CHAIN " +
      "(A~B, B~C, A!~C): flagged docs stay in the index") {
    val incr = run(Seq(Seq((1L, A)), Seq((2L, B)), Seq((3L, C))), tmp())
    val oneShot = run(Seq(Seq((1L, A), (2L, B), (3L, C))), tmp())
    incr shouldBe oneShot
    incr shouldBe Seq(
      (1L, false, 0L, None, None),
      (2L, true, 1L, Some(23129L), Some(1L)), // B dups A
      // C is near only the FLAGGED B — all-seen index still flags it;
      // a survivors-only index would wrongly accept C here
      (3L, true, 1L, Some(23129L), Some(2L)))
  }

  test("retrying a batch tag republishes instead of double-appending") {
    val idx = tmp()
    val day0 = Seq((1L, A), (2L, B)).toDF("doc_id", "e")
    IncrementalSemanticDedup
      .acceptBatch(day0, "doc_id", "e", idx, "day0", MinDot).collect()
    // redeliver the SAME tag: same verdicts (novelty excludes own files)
    val retry = IncrementalSemanticDedup
      .acceptBatch(day0, "doc_id", "e", idx, "day0", MinDot)
      .orderBy("doc_id").collect()
    retry.map(r => (r.getLong(0), r.getBoolean(1))).toSeq shouldBe
      Seq((1L, false), (2L, true))
    // a later probe counts each indexed doc ONCE: D = A sees A (26129)
    // and B (23129) — n_earlier 2, not 4
    val probe = IncrementalSemanticDedup
      .acceptBatch(Seq((9L, A)).toDF("doc_id", "e"), "doc_id", "e",
        idx, "day1", MinDot).collect()
    probe.map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq shouldBe
      Seq((9L, true, 2L, 26129L, 1L))
  }

  test("bucket blocking misses a one-sign-flip near-dup (the " +
      "documented recall trade); probeFlips = 1 recovers it at " +
      "probe-side cost only") {
    // E sits in bucket 1 (dim 1 positive); the later probe P is the
    // same dim-5-heavy vector with dim 1 barely negative — home
    // bucket 0, one bit away. Quantized: qE = (127,0,0,0,127,0,0,0),
    // qP = (-3,0,0,0,127,0,0,0); exact dot = -3·127 + 127² = 15748.
    val idx = tmp()
    val E = Seq(127.0, 0.0, 0.0, 0.0, 127.0, 0.0, 0.0, 0.0)
    val P = Seq(-0.02 * 127.0, 0.0, 0.0, 0.0, 127.0, 0.0, 0.0, 0.0)
    IncrementalSemanticDedup
      .acceptBatch(Seq((1L, E)).toDF("doc_id", "e"), "doc_id", "e",
        idx, "day0", minDot = 15000L).collect()
    val miss = IncrementalSemanticDedup
      .acceptBatch(Seq((2L, P)).toDF("doc_id", "e"), "doc_id", "e",
        idx, "day1", minDot = 15000L).collect()
    miss.map(r => (r.getLong(0), r.getBoolean(1))).toSeq shouldBe
      Seq((2L, false)) // single probe never looks outside bucket 0
    // redeliver the same tag WITH the dial: the one-bit probe reaches
    // bucket 1 and the pair is found; index state is unchanged (one
    // home bucket per doc — the dial amplifies probes, never state)
    val hit = IncrementalSemanticDedup
      .acceptBatch(Seq((2L, P)).toDF("doc_id", "e"), "doc_id", "e",
        idx, "day1", minDot = 15000L, probeFlips = 1).collect()
    hit.map(r => (r.getLong(0), r.getBoolean(1), r.getLong(3))).toSeq shouldBe
      Seq((2L, true, 15748L))
  }
}
