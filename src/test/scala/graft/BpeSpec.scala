package graft

import graft.operators.BpeTrainer

/** BPE merge training: the learned merge list must be the unique
  * (count desc, pair lex asc) sequence on the classic Sennrich
  * low/lower/newest/widest fixture, and the encoder must apply merges
  * in order, left-to-right, non-overlapping. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val freq = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge list follows weighted counts with lexicographic ties") {
    val merges = BpeTrainer.trainFromFreq(freq, numMerges = 6)
    // (e,s) 9 > (l,o)(lo,w) 7 ... after est</w> forms, the 6-count tie
    // {(n,e),(e,w),(w,est</w>)} must break lexicographically AFTER the
    // 7-count lo/low merges: es, est, est</w>, lo, low, then (e,w)
    merges shouldBe Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w"))
  }

  test("encoder applies merges in order, unseen words fall to chars") {
    val merges = BpeTrainer.trainFromFreq(freq, numMerges = 6)
    BpeTrainer.encodeWord("lowest", merges) shouldBe
      Seq("low", "est</w>")
    BpeTrainer.encodeWord("newest", merges) shouldBe
      Seq("n", "ew", "est</w>")
    BpeTrainer.encodeWord("zq", merges) shouldBe
      Seq("z", "q", "</w>")
  }

  test("merge application is left-to-right non-overlapping") {
    BpeTrainer.mergeOnce(Vector("a", "a", "a"), ("a", "a")) shouldBe
      Vector("aa", "a")
    BpeTrainer.mergeOnce(Vector("a", "a", "a", "a"), ("a", "a")) shouldBe
      Vector("aa", "aa")
  }

  test("corpus training stops early when no pair repeats") {
    val docs = Seq((1L, "ab ab ab"), (2L, "cd")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", numMerges = 50)
    // (a,b) 3 then (ab,</w>) 3; everything in 'cd' is unique
    merges shouldBe Seq(("a", "b"), ("ab", "</w>"))
  }

  test("distributed token counts agree with driver-side encoding") {
    val docs = Seq(
      (1L, "low lower"), (2L, "newest widest newest")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainFromFreq(freq, numMerges = 6)
    val got = BpeTrainer.bpeTokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val enc = (w: String) => BpeTrainer.encodeWord(w, merges).length.toLong
    got.toSeq shouldBe Seq(
      (1L, enc("low") + enc("lower"), 2L),
      (2L, 2 * enc("newest") + enc("widest"), 3L))
  }

  test("codegen'd BpeEncodeExpression fuzz-matches encodeWord on " +
      "random words and ADVERSARIAL merge lists") {
    // adversarial: merge lists NOT from training — repeated pairs,
    // merges referencing never-formed symbols, chains where a later
    // merge consumes an earlier merge's output, end-of-word merges,
    // and the KwKwK shape (a,a) on runs — the expression must mirror
    // encodeWord's in-order pass semantics on ALL of them, not just
    // well-formed trained lists
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcd"
    def randWord(): String =
      (0 until (1 + rnd.nextInt(10)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def randSym(): String = rnd.nextInt(4) match {
      case 0 => alphabet(rnd.nextInt(alphabet.length)).toString
      case 1 => (0 until 2).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      case 2 => BpeTrainer.EndOfWord
      case _ => alphabet(rnd.nextInt(alphabet.length)).toString +
        BpeTrainer.EndOfWord
    }
    (0 until 30).foreach { trial =>
      val merges = Vector.fill(1 + rnd.nextInt(12))((randSym(), randSym()))
      val words = (0 until 40).map(_ => randWord()).distinct
      val expected = words.map(w => (w, BpeTrainer.encodeWord(w, merges)))
      val got = BpeTrainer
        .encodeVocab(spark, words.toDF("w"), merges)
        .collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getLong(2)))
        .sortBy(_._1)
      withClue(s"trial $trial merges=$merges: ") {
        got.map(g => (g._1, g._2.toSeq)).toSeq shouldBe
          expected.sortBy(_._1).map(e => (e._1, e._2))
        got.foreach { case (_, toks, n) => n shouldBe toks.length.toLong }
      }
    }
    // trained-list spot check through the full Spark path
    val merges = BpeTrainer.trainFromFreq(freq, numMerges = 6)
    val viaExpr = BpeTrainer
      .encodeVocab(spark, Seq("lowest", "newest", "zq").toDF("w"), merges)
      .orderBy("w").collect().map(_.getSeq[String](1).toSeq)
    viaExpr.toSeq shouldBe Seq("lowest", "newest", "zq").sorted
      .map(w => BpeTrainer.encodeWord(w, merges))
  }
}
