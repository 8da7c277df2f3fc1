package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOverlap

class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("containment is exact on a planted-overlap fixture") {
    // srcA: two docs, 3-gram sets {a b c, b c d} and {x y z}
    // srcB: one doc sharing exactly "a b c" plus its own grams
    val docs = Seq(
      (1L, "A", "a b c d"),      // grams: "a b c", "b c d"
      (2L, "A", "x y z"),        // gram:  "x y z"
      (3L, "B", "a b c q r s"),  // grams: "a b c", "b c q", "c q r", "q r s"
      (4L, "C", "p p p")         // no overlap with anyone
    ).toDF("doc_id", "source", "text")
    val got = CorpusOverlap.sourceOverlap(docs, "source", "text", n = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // s1 < s2 ordering puts A before B; C overlaps nobody -> absent
    got.keySet shouldBe Set(("A", "B"))
    val (shared, nA, nB, cont) = got(("A", "B"))
    shared shouldBe 1L // exactly "a b c"
    nA shouldBe 3L
    nB shouldBe 4L
    cont shouldBe (1.0 / 3.0)
  }

  test("short texts (< n tokens) contribute no grams") {
    val docs = Seq((1L, "A", "a b"), (2L, "B", "a b")).toDF(
      "doc_id", "source", "text")
    CorpusOverlap.sourceOverlap(docs, "source", "text", n = 3)
      .count() shouldBe 0L
  }

  test("normalization folds case and whitespace before gramming") {
    val docs = Seq(
      (1L, "A", "Alpha  Beta\tGamma"),
      (2L, "B", "alpha beta gamma")).toDF("doc_id", "source", "text")
    val row = CorpusOverlap.sourceOverlap(docs, "source", "text", n = 3)
      .head()
    row.getLong(2) shouldBe 1L   // the shared normalized 3-gram
    row.getDouble(5) shouldBe 1.0
  }
}
