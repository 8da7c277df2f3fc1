package graft

import org.apache.spark.sql.functions._

/** Each join-strategy hint must actually land its physical operator
  * (q139 pins that the RESULTS are identical; this pins that the
  * hints are not silently ignored — the 100 TB manual-override
  * lane). */
class JoinHintSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact =
    (1 to 1000).map(i => (i.toLong, i % 50)).toDF("id", "k")
  private lazy val dim =
    (0 until 50).map(i => (i, s"g$i")).toDF("dk", "name")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast hint plans BroadcastHashJoin") {
    planOf(fact.join(broadcast(dim), $"k" === $"dk")) should
      include("BroadcastHashJoin")
  }

  test("merge hint plans SortMergeJoin") {
    planOf(fact.join(dim.hint("merge"), $"k" === $"dk")) should
      include("SortMergeJoin")
  }

  test("shuffle_hash hint plans ShuffledHashJoin") {
    planOf(fact.join(dim.hint("shuffle_hash"), $"k" === $"dk")) should
      include("ShuffledHashJoin")
  }

  test("all three strategies agree on the join result") {
    val expected = fact.join(dim, $"k" === $"dk").count()
    fact.join(broadcast(dim), $"k" === $"dk").count() shouldBe expected
    fact.join(dim.hint("merge"), $"k" === $"dk").count() shouldBe expected
    fact.join(dim.hint("shuffle_hash"), $"k" === $"dk").count() shouldBe
      expected
  }
}
