package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Hand-computed fixtures for the three merge_asof directions.
  * Fixture per key 1: right rows at t = 10, 20, 40 (values a, b, c);
  * left probes at t = 5, 10, 25, 31, 40. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 5L), (1L, 10L), (1L, 25L), (1L, 31L), (1L, 40L),
    (2L, 7L) // key with no right rows at all
  ).toDF("k", "t")
  private lazy val right = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 40L, "c")
  ).toDF("k", "rt", "v")

  private def run(direction: String, strict: Boolean = false) =
    AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"),
        strict = strict, direction = direction)
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-")))
      .toSeq

  test("backward non-strict: latest right <= t") {
    run("backward") shouldBe Seq(
      (1L, 5L, "-"), (1L, 10L, "a"), (1L, 25L, "b"),
      (1L, 31L, "b"), (1L, 40L, "c"), (2L, 7L, "-"))
  }

  test("backward strict: same-timestamp right row is excluded") {
    run("backward", strict = true) shouldBe Seq(
      (1L, 5L, "-"), (1L, 10L, "-"), (1L, 25L, "b"),
      (1L, 31L, "b"), (1L, 40L, "b"), (2L, 7L, "-"))
  }

  test("forward non-strict: earliest right >= t") {
    run("forward") shouldBe Seq(
      (1L, 5L, "a"), (1L, 10L, "a"), (1L, 25L, "c"),
      (1L, 31L, "c"), (1L, 40L, "c"), (2L, 7L, "-"))
  }

  test("forward strict: same-timestamp right row is excluded") {
    run("forward", strict = true) shouldBe Seq(
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 25L, "c"),
      (1L, 31L, "c"), (1L, 40L, "-"), (2L, 7L, "-"))
  }

  test("nearest: closer side wins, exact tie and self-match go backward") {
    // t=25: bwd b at 20 (d=5) vs fwd c at 40 (d=15) -> b
    // t=31: bwd b at 20 (d=11) vs fwd c at 40 (d=9) -> c
    // t=5:  no bwd -> fwd a
    // t=40: self-match distance 0 -> c
    run("nearest") shouldBe Seq(
      (1L, 5L, "a"), (1L, 10L, "a"), (1L, 25L, "b"),
      (1L, 31L, "c"), (1L, 40L, "c"), (2L, 7L, "-"))
  }

  test("nearest equal-distance tie resolves to the backward match") {
    val l = Seq((1L, 30L)).toDF("k", "t") // b at 20, c at 40: both d=10
    val got = AsOfJoin.asOf(l, right, Seq("k"), "t", "rt", Seq("v"),
      direction = "nearest").collect()
    got.head.getString(2) shouldBe "b"
  }

  test("nearest rejects strict") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"),
        strict = true, direction = "nearest")
    }
  }
}
