package graft

import org.apache.spark.sql.functions._
import graft.expressions.WkbPointUtil
import graft.operators.{Evaluation, EventAnalytics, LanguageModel, Multimodal}

/** Randomized hardening for the round-8 operators: each must agree
  * with a plain-Scala reference implementation over seeded random
  * inputs (the R7PropertySpec discipline — failures reproduce). */
class R8PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0x8A17D0)

  test("PNG codec: decode∘encode recovers reference pixel moments on " +
      "random geometries (all five filters exercised at height >= 5)") {
    (0 until 40).foreach { _ =>
      val w = 1 + rnd.nextInt(17)
      val h = 1 + rnd.nextInt(11)
      val lumas = Seq.fill(w * h)(rnd.nextInt(256))
      val f = Multimodal.decodePngGray8(
        Multimodal.encodePngGray8(lumas, w))
      (f.width, f.height, f.color_type) shouldBe (w, h, 0)
      f.n_pixels shouldBe w.toLong * h
      f.sum_gray shouldBe lumas.map(_.toLong).sum
      f.max_gray shouldBe lumas.max
      f.first_gray shouldBe lumas.head
      f.last_gray shouldBe lumas.last
    }
  }

  test("WKB codec: encode∘decode is bit-lossless on random doubles " +
      "including NaN payloads, infinities, and subnormals") {
    def randDouble(): Double = rnd.nextInt(6) match {
      case 0 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any bits
      case 1 => rnd.nextDouble() * 360.0 - 180.0
      case 2 => Double.PositiveInfinity
      case 3 => Double.MinPositiveValue * (1 + rnd.nextInt(100))
      case 4 => -0.0
      case _ => rnd.nextGaussian() * 1e7
    }
    (0 until 200).foreach { _ =>
      val x = randDouble(); val y = randDouble()
      val srid = if (rnd.nextBoolean()) -1 else 1 + rnd.nextInt(1000000)
      val little = rnd.nextBoolean()
      val arr = WkbPointUtil.parseHex(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          WkbPointUtil.encodeHex(x, y, srid, little)))
      // NaN payloads may legally canonicalize through longBitsToDouble
      // on some platforms — assert NaN-ness there, exact bits elsewhere
      def check(gotV: Double, want: Double): Unit =
        if (want.isNaN) gotV.isNaN shouldBe true
        else java.lang.Double.doubleToRawLongBits(gotV) shouldBe
          java.lang.Double.doubleToRawLongBits(want)
      check(arr.getDouble(0), x)
      check(arr.getDouble(1), y)
      arr.getDouble(2) shouldBe srid.toDouble
    }
  }

  test("corpusBleu matches a brute-force reference on random " +
      "candidate/reference corpora") {
    def ngrams(tk: Seq[String], n: Int): Seq[String] =
      if (tk.length < n) Nil
      else (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" "))
    val vocab = Vector("a", "b", "c", "d")
    (0 until 20).foreach { _ =>
      val pairs = (0 until (2 + rnd.nextInt(6))).map { i =>
        def text(len: Int) =
          Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text(1 + rnd.nextInt(12)), text(1 + rnd.nextInt(12)))
      }
      val maxN = 1 + rnd.nextInt(3)
      val got = Evaluation.corpusBleu(pairs.toDF("id", "cand", "ref"),
        "id", col("cand"), col("ref"), maxN)
        .orderBy("n").collect()
      // reference: clipped counts per doc per order, corpus-summed
      val perN = (1 to maxN).map { n =>
        val (m, c) = pairs.map { case (_, cand, ref) =>
          val cg = ngrams(cand.split(" ").toSeq, n)
            .groupBy(identity).view.mapValues(_.size)
          val rg = ngrams(ref.split(" ").toSeq, n)
            .groupBy(identity).view.mapValues(_.size)
          val clip = cg.map { case (g, cc) =>
            math.min(cc, rg.getOrElse(g, 0))
          }.sum
          (clip.toLong, cg.values.sum.toLong)
        }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
        (n, m, c)
      }
      got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
        perN
      val cLen = pairs.map(_._2.split(" ").length.toLong).sum
      val rLen = pairs.map(_._3.split(" ").length.toLong).sum
      val bleuRef =
        if (perN.exists(_._2 == 0L)) 0.0
        else {
          val bp = if (cLen >= rLen) 1.0
            else math.exp(1.0 - rLen.toDouble / cLen)
          bp * math.exp(perN.map(t =>
            math.log(t._2.toDouble / t._3)).sum / maxN)
        }
      got.head.getDouble(5) shouldBe bleuRef +- 1e-9
    }
  }

  test("kaplanMeier matches a sequential reference on random " +
      "censoring patterns") {
    (0 until 10).foreach { _ =>
      val n = 20 + rnd.nextInt(200)
      val subj = Seq.fill(n)((rnd.nextInt(15).toLong, rnd.nextBoolean()))
      val got = EventAnalytics.kaplanMeier(
        subj.toDF("dur", "ev").repartition(1 + rnd.nextInt(5)),
        col("dur"), col("ev")).orderBy("t").collect()
      var atRisk = n.toLong
      var surv = 1.0
      val perT = subj.groupBy(_._1).view.mapValues(g =>
        (g.count(_._2).toLong, g.count(!_._2).toLong)).toMap
      for (r <- got) {
        val (d, c) = perT(r.getLong(0))
        r.getLong(1) shouldBe atRisk
        r.getLong(2) shouldBe d
        r.getLong(3) shouldBe c
        if (d == atRisk) surv = 0.0
        else if (d > 0) surv *= 1.0 - d.toDouble / atRisk
        r.getDouble(4) shouldBe surv +- (math.abs(surv) * 1e-9 + 1e-15)
        atRisk -= d + c
      }
      atRisk shouldBe 0L
    }
  }

  test("scoreDocsAgainst matches a reference cross-entropy on random " +
      "model/candidate splits") {
    val vocab = Vector("p", "q", "r", "s")
    (0 until 15).foreach { _ =>
      def text(len: Int) =
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val model = (0 until 3).map(i => (100L + i, text(2 + rnd.nextInt(8))))
      val cands = (0 until 4).map(i => (i.toLong, text(2 + rnd.nextInt(8))))
      val got = LanguageModel.scoreDocsAgainst(
        cands.toDF("doc_id", "text"), model.toDF("doc_id", "text"),
        "doc_id", "text").orderBy("doc_id").collect()
      // reference model
      val mbg = model.flatMap(_._2.split(" ").toSeq.sliding(2))
        .filter(_.length == 2).map(w => (w(0), w(1)))
      val bgc = mbg.groupBy(identity).view.mapValues(_.size).toMap
      val hc = mbg.groupBy(_._1).view.mapValues(_.size).toMap
      val v = model.flatMap(_._2.split(" ")).distinct.size
      for (r <- got) {
        val tk = cands.find(_._1 == r.getLong(0)).get._2.split(" ").toSeq
        val lnps = tk.sliding(2).filter(_.length == 2).map { w =>
          math.log((bgc.getOrElse((w(0), w(1)), 0) + 1.0) /
            (hc.getOrElse(w(0), 0) + v))
        }.toSeq
        r.getLong(1) shouldBe lnps.size.toLong
        r.getDouble(2) shouldBe -lnps.sum / lnps.size +- 1e-9
      }
    }
  }

  test("c4/gopher codegen'd batteries equal the composed references " +
      "on seeded random text (whitespace zoo, punctuation, unicode)") {
    import graft.functions.{TextAnalysis => TA}
    val alphabet =
      "abc DEF.!?\"#…{}-*• \t\n\r àé一😀" + "lorem ipsum javascript"
    def randText(): String =
      Seq.fill(1 + rnd.nextInt(300))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val texts = Seq.fill(60)(randText())
    val df = texts.toDF("text")
    df.select(TA.c4Quality(col("text")).as("g")).select("g.*")
      .collect().map(_.toSeq).toSeq shouldBe
      df.select(TA.c4QualityComposed(col("text")).as("g")).select("g.*")
        .collect().map(_.toSeq).toSeq
    df.select(TA.gopherQuality(col("text")).as("g")).select("g.*")
      .collect().map(_.toSeq).toSeq shouldBe
      df.select(TA.gopherQualityComposed(col("text")).as("g"))
        .select("g.*").collect().map(_.toSeq).toSeq
  }

  test("GIF codec: decode∘encode recovers reference pixel moments on " +
      "random geometries (LZW through mixed entropy levels)") {
    (0 until 30).foreach { t =>
      val w = 1 + rnd.nextInt(23)
      val h = 1 + rnd.nextInt(13)
      // alternate high-entropy and repetitive content: both LZW paths
      val lumas =
        if (t % 2 == 0) Seq.fill(w * h)(rnd.nextInt(256))
        else Seq.tabulate(w * h)(i => (i / (1 + rnd.nextInt(9))) % 5 * 40)
      val f = Multimodal.decodeGifGray8(
        Multimodal.encodeGifGray8(lumas, w))
      (f.width, f.height) shouldBe (w, h)
      f.n_pixels shouldBe w.toLong * h
      f.sum_gray shouldBe lumas.map(_.toLong).sum
      f.max_gray shouldBe lumas.max
      f.first_gray shouldBe lumas.head
      f.last_gray shouldBe lumas.last
    }
  }

  test("tokenLcs matches a brute-force full-matrix reference on random " +
      "token arrays (small alphabet forces repeats and ties)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def refLcs(a: Seq[String], b: Seq[String]): Int = {
      // independent O(mn) FULL matrix (the operator uses rolling rows)
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) =
          if (a(i - 1) == b(j - 1)) d(i - 1)(j - 1) + 1
          else math.max(d(i - 1)(j), d(i)(j - 1))
      d(a.length)(b.length)
    }
    def arr(s: Seq[String]) = new GenericArrayData(
      s.map(UTF8String.fromString).toArray: Array[Any])
    val vocab = Vector("a", "b", "c")
    (0 until 120).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size)))
      graft.expressions.EditDistanceUtil.tokenLcs(arr(a), arr(b)) shouldBe
        refLcs(a, b)
    }
    // LCS invariants: symmetric, bounded by min length, monotone
    // under concatenation
    val x = Seq("a", "b", "a", "c")
    val y = Seq("b", "a", "a")
    graft.expressions.EditDistanceUtil.tokenLcs(arr(x), arr(y)) shouldBe
      graft.expressions.EditDistanceUtil.tokenLcs(arr(y), arr(x))
    graft.expressions.EditDistanceUtil
      .tokenLcs(arr(x), arr(y)) should be <= 3
  }
}
