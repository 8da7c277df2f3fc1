package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalJoin

class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ta = (1 to 500).map(i => (i.toLong, i % 60, s"a$i"))
    .toDF("aid", "k", "pa")
  private lazy val tb = (1 to 120).map(j => (j % 60, s"b$j"))
    .toDF("k", "pb")

  private def full = ta.join(tb, Seq("k"))

  test("delta rule equals full recompute under seeded random splits") {
    for (seed <- Seq(7, 23, 41)) {
      // deterministic pseudo-random split of each side into old/delta
      val aFlag = abs(hash(col("aid") + lit(seed))) % 3 === 0
      val bFlag = abs(hash(col("pb"), lit(seed))) % 4 === 0
      val merged = IncrementalJoin.mergeDelta(
        ta.filter(!aFlag).join(tb.filter(!bFlag), Seq("k")),
        ta.filter(!aFlag), ta.filter(aFlag),
        tb.filter(!bFlag), tb.filter(bFlag), Seq("k"))
      val got = merged.groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = full.groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      got shouldBe want
      assert(merged.count() == full.count())
    }
  }

  test("empty deltas are the identity; all-delta builds from nothing") {
    val none = ta.limit(0)
    val noneB = tb.limit(0)
    assert(IncrementalJoin.mergeDelta(full, ta, none, tb, noneB, Seq("k"))
      .count() == full.count())
    assert(IncrementalJoin.mergeDelta(
      none.join(noneB, Seq("k")), none, ta, noneB, tb, Seq("k"))
      .count() == full.count())
  }
}
