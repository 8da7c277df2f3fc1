package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontamination, Evaluation, Multimodal, Profiler,
  Vocab}

/** Randomized hardening for the round-7 operators: each one must agree
  * with a plain-Scala reference implementation over a few hundred
  * seeded random inputs (the EquivalencePropertySpec discipline —
  * failures reproduce). */
class R7PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0x537AB1E)

  test("WAV codec: decode∘encode recovers reference sample moments " +
      "on random PCM") {
    (0 until 50).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val samples = Seq.fill(n)(rnd.nextInt(65536) - 32768)
      val rate = 1 + rnd.nextInt(48000)
      val f = Multimodal.decodeWavPcm16(
        Multimodal.encodeWavPcm16(samples, rate))
      f.sample_rate shouldBe rate
      f.n_samples shouldBe n.toLong
      f.duration_ms shouldBe n.toLong * 1000L / rate
      f.peak shouldBe samples.map(math.abs).max
      f.sum_sq shouldBe samples.map(s => s.toLong * s).sum
    }
  }

  test("BMP codec: decode∘encode recovers reference pixel moments on " +
      "random grayscale images") {
    (0 until 50).foreach { _ =>
      val w = 1 + rnd.nextInt(13)
      val h = 1 + rnd.nextInt(9)
      val lumas = Seq.fill(w * h)(rnd.nextInt(256))
      val f = Multimodal.decodeBmpGray24(
        Multimodal.encodeBmpGray24(lumas, w))
      (f.width, f.height, f.n_pixels) shouldBe (w, h, w.toLong * h)
      f.sum_gray shouldBe lumas.map(_.toLong).sum
      f.max_gray shouldBe lumas.max
      f.first_gray shouldBe lumas.head
      f.last_gray shouldBe lumas.last
    }
  }

  test("ndcgAtK matches a brute-force reference on random rankings") {
    val rows = (0 until 300).map { i =>
      (s"q${i % 7}", i.toLong, rnd.nextInt(50).toLong,
        rnd.nextInt(4).toLong)
    }
    val df = rows.toDF("q", "id", "score", "rel")
    val k = 5
    val got = Evaluation.ndcgAtK(df, "q", col("score"), col("id"),
      col("rel"), k).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (q, g) =>
      val ranked = g.sortBy(t => (-t._3, t._2)).take(k)
      val dcg = ranked.zipWithIndex.map { case (t, i) =>
        t._4.toDouble / (math.log(i + 2.0) / math.log(2.0)) }.sum
      val ideal = g.filter(_._4 > 0).sortBy(t => (-t._4, t._2)).take(k)
      val idcg = ideal.zipWithIndex.map { case (t, i) =>
        t._4.toDouble / (math.log(i + 2.0) / math.log(2.0)) }.sum
      val r = got(q)
      r.getLong(1) shouldBe math.min(k, g.size).toLong
      r.getDouble(3) shouldBe dcg +- 1e-10
      r.getDouble(4) shouldBe idcg +- 1e-10
      if (idcg > 0) r.getDouble(5) shouldBe (dcg / idcg) +- 1e-10
      else r.isNullAt(5) shouldBe true
    }
  }

  test("reciprocalRankAtK matches a brute-force reference") {
    val rows = (0 until 300).map { i =>
      (s"q${i % 11}", i.toLong, rnd.nextInt(40).toLong,
        if (rnd.nextInt(5) == 0) 1L else 0L)
    }
    val got = Evaluation.reciprocalRankAtK(rows.toDF("q", "id", "s", "rel"),
        "q", col("s"), col("id"), col("rel"), k = 10).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (q, g) =>
      val first = g.sortBy(t => (-t._3, t._2)).take(10)
        .zipWithIndex.collectFirst { case (t, i) if t._4 > 0 => i + 1 }
      val r = got(q)
      first match {
        case Some(fr) =>
          r.getLong(1) shouldBe fr.toLong
          r.getLong(2) shouldBe 2520L / fr
        case None =>
          r.isNullAt(1) shouldBe true
          r.getLong(2) shouldBe 0L
      }
    }
  }

  test("benfordAudit matches reference digit counts on random values") {
    val vals = Seq.fill(500)(rnd.nextLong().abs % 1000000L - 100L)
    val got = Profiler.benfordAudit(vals.toDF("c"), col("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pos = vals.filter(_ > 0L)
    val ref = pos.groupBy(_.toString.head.asDigit)
      .map { case (d, v) => d -> v.size.toLong }
    (1 to 9).foreach(d => got(d) shouldBe ref.getOrElse(d, 0L))
  }

  test("zipfSlope matches a reference OLS on random frequency tables") {
    (0 until 5).foreach { _ =>
      val nWords = 5 + rnd.nextInt(20)
      val words = (0 until nWords).map(i => s"w$i")
      val bag = words.flatMap(w => Seq.fill(1 + rnd.nextInt(30))(w))
      val text = rnd.shuffle(bag).mkString(" ")
      val k = 4 + rnd.nextInt(nWords - 3)
      val got = Vocab.zipfSlope(Seq((1L, text)).toDF("id", "text"),
        "text", k).head()
      // reference: rank by (freq desc, token asc), OLS on (ln r, ln f)
      val freqs = bag.groupBy(identity).map { case (w, v) => (w, v.size) }
        .toSeq.sortBy(t => (-t._2, t._1)).take(k)
      val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
        (math.log(i + 1.0), math.log(f.toDouble)) }
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      got.getLong(0) shouldBe pts.size.toLong
      got.getDouble(1) shouldBe slope +- 1e-9
      got.getDouble(2) shouldBe ((sy - slope * sx) / n) +- 1e-9
    }
  }

  test("semanticContaminatedDocs matches a reference over random " +
      "vectors (quantization, bucketing, dots replicated)") {
    def quant(v: Seq[Double]): Seq[Int] = {
      val scale = v.map(math.abs).max
      if (scale == 0.0) v.map(_ => 0)
      else v.map(x => math.floor(x * 127.0 / scale + 0.5).toInt)
    }
    def bkt(q: Seq[Int]): Int =
      (0 until 4).map(i => if (q(i) > 0) 1 << i else 0).sum
    val dim = 8
    val corpus = (0 until 120).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val eval = (0 until 9).map(i =>
      (1000L + i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val minDot = 20000L
    val got = Decontamination.semanticContaminatedDocs(
        corpus.toDF("doc_id", "e"), "doc_id", "e",
        eval.toDF("eval_id", "e"), "eval_id", "e", minDot)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ref = corpus.flatMap { case (cid, cv) =>
      val cq = quant(cv)
      eval.flatMap { case (eid, ev) =>
        val eq = quant(ev)
        if (bkt(cq) != bkt(eq)) None
        else {
          val dot = cq.zip(eq).map { case (a, b) => a.toLong * b }.sum
          if (dot >= minDot) Some((cid, eid, dot)) else None
        }
      }
    }.groupBy(_._1).map { case (cid, hits) =>
      cid -> (hits.size.toLong, hits.map(_._3).max,
        hits.map(_._2).min)
    }
    got shouldBe ref
  }
}
