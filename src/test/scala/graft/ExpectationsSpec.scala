package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations._

/** Declarative data-quality expectations: hand fixtures with one planted
  * violation per constraint class. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  // (id, name, score, flag) with planted defects:
  //  - row 4: NULL name (completeness)
  //  - row 5: score 1.5 out of [0,1] (range)
  //  - row 6: flag "X" outside {A,B} (set) and lowercase name (regex)
  //  - rows 7+8: duplicate id 7 (uniqueness)
  private val rows = Seq(
    (1L, "AA", 0.5, "A"), (2L, "BB", 0.0, "B"), (3L, "CC", 1.0, "A"),
    (4L, null, 0.5, "A"), (5L, "EE", 1.5, "B"), (6L, "ff", 0.5, "X"),
    (7L, "GG", 0.5, "A"), (7L, "HH", 0.5, "B"))
  private lazy val df = rows.toDF("id", "name", "score", "flag")

  test("each constraint class counts its planted violation exactly") {
    val dim = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("pk") // 7 missing -> 2 rows fail
    val got = Expectations.run(df,
        expects = Seq(
          complete("name"),
          inRange("score", 0.0, 1.0),
          inSet("flag", Seq("A", "B")),
          matches("name", "^[A-Z]+$")),
        unique = Seq(Seq("id")),
        refs = Seq(("id", dim, "pk")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(4)))).toMap
    got("complete(name)") shouldBe ((8L, 7L, false))
    got("in_range(score)") shouldBe ((8L, 7L, false))
    got("in_set(flag)") shouldBe ((8L, 7L, false))
    // NULL name also fails the regex -> 6 ok
    got("matches(name)") shouldBe ((8L, 6L, false))
    // key 7 appears twice: 6 of 8 rows have a unique key
    got("unique(id)") shouldBe ((8L, 6L, false))
    got("ref(id -> pk)") shouldBe ((8L, 6L, false))
  }

  test("clean data passes, and minFraction tolerates a quota of violations") {
    val clean = df.filter(col("id") <= 3)
    val all = Expectations.run(clean, Seq(
      complete("name"), inRange("score", 0.0, 1.0))).collect()
    all.map(_.getBoolean(4)).toSeq shouldBe Seq(true, true)
    // 7/8 complete passes at minFraction 0.8 but fails at 0.9
    Expectations.run(df, Seq(complete("name", minFraction = 0.8)))
      .head().getBoolean(4) shouldBe true
    Expectations.run(df, Seq(complete("name", minFraction = 0.9)))
      .head().getBoolean(4) shouldBe false
  }

  test("fractions are exact count ratios") {
    val r = Expectations.run(df, Seq(complete("name"))).head()
    r.getDouble(3) shouldBe 7.0 / 8.0
  }

  test("an empty table fails closed (pass=false, never NULL)") {
    // 0/0 must not yield a NULL verdict: an empty drop REJECTS, so a
    // publish gate can't silently wave through a dataset with no rows
    val empty = df.filter(col("id") < 0)
    val rows = Expectations.run(empty,
        expects = Seq(complete("name"), inRange("score", 0.0, 1.0)),
        unique = Seq(Seq("id"))).collect()
    rows should have length 3
    rows.foreach { r =>
      r.getLong(1) shouldBe 0L        // n_rows
      r.isNullAt(4) shouldBe false    // pass is defined...
      r.getBoolean(4) shouldBe false  // ...and rejects
    }
  }
}
