package graft

import org.apache.spark.sql.functions._
import graft.operators.{DeleteJob, UpdateJob}

/** Set-oriented restatements of the reference's UPDATE/DELETE sinks
  * (`etl/etl.py:315-372`): MERGE semantics, last-writer-wins, NULL
  * update values, anti-join delete. */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)
  ).toDF("id", "name", "v")

  test("merge updates matched rows, carries unmatched through") {
    val updates = Seq((2, "B")).toDF("id", "name")
    val out = UpdateJob.merge(base, updates, Seq("id"))
      .orderBy("id").collect()
    out.map(_.getString(1)).toSeq shouldBe Seq("a", "B", "c")
    // untouched column carried through unchanged
    out.map(_.getDouble(2)).toSeq shouldBe Seq(10.0, 20.0, 30.0)
  }

  test("merge writes NULL update values (quirk Q10: geom set even to NULL)") {
    val updates = Seq((1, Option.empty[String])).toDF("id", "name")
    val out = UpdateJob.merge(base, updates, Seq("id")).orderBy("id").collect()
    out(0).isNullAt(1) shouldBe true
    out(1).getString(1) shouldBe "b"
  }

  test("preserveNullUpdates keeps base values under NULL updates (fixed Q10)") {
    val updates = Seq((1, Option.empty[String]), (2, Some("B")))
      .toDF("id", "name")
    val out = UpdateJob.merge(base, updates, Seq("id"),
      preserveNullUpdates = true).orderBy("id").collect()
    out(0).getString(1) shouldBe "a" // NULL update preserved base
    out(1).getString(1) shouldBe "B" // non-NULL update applied
  }

  test("merge duplicate keys: last writer wins by order column") {
    val updates = Seq((2, "first", 1L), (2, "second", 2L))
      .toDF("id", "name", "pos")
    val out = UpdateJob.merge(base, updates, Seq("id"), orderCol = Some("pos"))
      .orderBy("id").collect()
    out(1).getString(1) shouldBe "second"
  }

  test("upsert inserts unmatched keys and updates matched") {
    val updates = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("id", "name", "v")
    val out = UpdateJob.upsert(base, updates, Seq("id")).orderBy("id").collect()
    out.map(_.getInt(0)).toSeq shouldBe Seq(1, 2, 3, 4)
    out(1).getDouble(2) shouldBe 99.0
    out(3).getString(1) shouldBe "d"
  }

  test("deleteByKeys removes exactly the keyed rows") {
    val keys = Seq(1, 3, 999).toDF("id")
    val out = DeleteJob.deleteByKeys(base, keys, Seq("id")).collect()
    out.map(_.getInt(0)).toSeq shouldBe Seq(2)
  }

  test("deleteByKeys with duplicate keys in the key file") {
    val keys = Seq(2, 2, 2).toDF("id")
    DeleteJob.deleteByKeys(base, keys, Seq("id")).count() shouldBe 2
  }

  // ------------------------------------------------------------ SCD2

  private def scdDim = Seq(
    (1L, "gold", 0L, Option.empty[Long]),
    (2L, "silver", 0L, Option.empty[Long]),
    // key 3 already has history: a closed row plus the open one
    (3L, "bronze", 0L, Some(500L)),
    (3L, "iron", 500L, Option.empty[Long])
  ).toDF("id", "tier", "valid_from", "valid_to")

  test("scd2 closes changed versions and appends new ones") {
    val upd = Seq((1L, "platinum", 1000L)).toDF("id", "tier", "ts")
    val got = graft.operators.Scd2(scdDim, upd, Seq("id"), Seq("tier"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    got shouldBe Set(
      (1L, "gold", 0L, 1000L),      // closed out
      (1L, "platinum", 1000L, -1L), // new open version
      (2L, "silver", 0L, -1L),      // untouched
      (3L, "bronze", 0L, 500L),     // history passes through
      (3L, "iron", 500L, -1L))
  }

  test("scd2 no-op updates do not create versions") {
    val upd = Seq((2L, "silver", 1000L)).toDF("id", "tier", "ts")
    val got = graft.operators.Scd2(scdDim, upd, Seq("id"), Seq("tier"), "ts")
    got.count() shouldBe scdDim.count()
    got.filter(col("valid_from") === 1000L).count() shouldBe 0L
  }

  test("scd2 inserts unknown keys as fresh open versions") {
    val upd = Seq((9L, "new", 1000L)).toDF("id", "tier", "ts")
    val got = graft.operators.Scd2(scdDim, upd, Seq("id"), Seq("tier"), "ts")
      .filter(col("id") === 9L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.isNullAt(3)))
    got shouldBe Array(("new", 1000L, true))
  }

  test("scd2 applied twice builds a three-version chain") {
    val d0 = Seq((1L, "gold", 0L, Option.empty[Long]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val d1 = graft.operators.Scd2(d0,
      Seq((1L, "silver", 100L)).toDF("id", "tier", "ts"),
      Seq("id"), Seq("tier"), "ts")
    val d2 = graft.operators.Scd2(d1,
      Seq((1L, "bronze", 200L)).toDF("id", "tier", "ts"),
      Seq("id"), Seq("tier"), "ts")
    val got = d2.orderBy("valid_from")
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    got shouldBe Array(("gold", 0L, 100L), ("silver", 100L, 200L),
      ("bronze", 200L, -1L))
  }

  test("pointInTime resolves the version valid at each fact timestamp") {
    val facts = Seq(
      (101L, 3L, 100L),  // key 3 at t=100 -> bronze (closed at 500)
      (102L, 3L, 500L),  // boundary: valid_from inclusive -> iron
      (103L, 3L, 9999L), // open version -> iron
      (104L, 1L, 50L),   // gold (never versioned)
      (105L, 7L, 50L)    // unknown key -> NULL tier
    ).toDF("fact_id", "id", "ts")
    val got = graft.operators.Scd2.pointInTime(facts, scdDim,
        Seq("id"), "ts")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) null else r.getString(3))).toMap
    got shouldBe Map(101L -> "bronze", 102L -> "iron", 103L -> "iron",
      104L -> "gold", 105L -> null)
  }

  test("pointInTime before a key's first version yields NULL attributes") {
    val dim = Seq((1L, "gold", 100L, Option.empty[Long]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val facts = Seq((1L, 1L, 50L)).toDF("fact_id", "id", "ts")
    graft.operators.Scd2.pointInTime(facts, dim, Seq("id"), "ts")
      .head().isNullAt(3) shouldBe true
  }

  test("applyChangelog compacts to net effect: last write, delete, insert") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (1L, "x1", 10L, "upsert"),  // superseded by the later delete
      (1L, "x2", 20L, "delete"),  // net: key 1 removed
      (2L, "y1", 5L, "upsert"),
      (2L, "y2", 6L, "upsert"),   // net: last writer wins -> y2
      (4L, "new", 1L, "upsert"),  // net: insert of an unseen key
      (5L, "gone", 2L, "delete")  // delete of an absent key: no-op
    ).toDF("id", "v", "seq", "op")
    val got = graft.operators.UpdateJob
      .applyChangelog(base, changes, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(2L -> "y2", 3L -> "c", 4L -> "new")
  }

  test("applyChangelog ties at equal seq break by op: upsert beats delete") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq(
      (1L, "u", 7L, "upsert"),
      (1L, "d", 7L, "delete")).toDF("id", "v", "seq", "op")
    graft.operators.UpdateJob
      .applyChangelog(base, changes, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(1L -> "u")
    // op matching is case-insensitive, so the tie-break must be too:
    // an uppercase UPSERT still beats a lowercase delete
    val mixed = Seq(
      (1L, "u", 7L, "UPSERT"),
      (1L, "d", 7L, "delete")).toDF("id", "v", "seq", "op")
    graft.operators.UpdateJob
      .applyChangelog(base, mixed, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(1L -> "u")
  }

  test("tableChecksum is order/partitioning-independent and value-sensitive") {
    import graft.operators.Maintenance
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "name")
    val digest = Maintenance.tableChecksum(a, Seq("id", "name")).collect()(0)
    // same rows, reversed order, different partitioning -> same digest
    val b = Seq((3, "z"), (1, "x"), (2, "y")).toDF("id", "name")
      .repartition(7)
    Maintenance.tableChecksum(b, Seq("id", "name"))
      .collect()(0) shouldBe digest
    // one changed cell -> different sum and xor
    val c = Seq((1, "x"), (2, "y"), (3, "Z")).toDF("id", "name")
    val changed = Maintenance.tableChecksum(c, Seq("id", "name")).collect()(0)
    changed.getLong(1) should not be digest.getLong(1)
    changed.getLong(2) should not be digest.getLong(2)
    // NULL canonicalizes to '' (engine-portable), still a defined digest
    val withNull = Seq((1, Option.empty[String])).toDF("id", "name")
    Maintenance.tableChecksum(withNull, Seq("id", "name"))
      .collect()(0).getLong(0) shouldBe 1L
    // grouped form: one digest row per group key
    Maintenance.tableChecksum(a, Seq("id"), groupCols = Seq("name"))
      .collect().length shouldBe 3
  }

  test("bucketedDiff: identical tables diff empty; changes localized") {
    import graft.operators.Maintenance
    val a = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    // identical snapshots: NO output rows (diff-proportional contract)
    Maintenance.bucketedDiff(a, a, Seq("id"), Seq("v"), 8)
      .count() shouldBe 0L
    // one update, one delete, one insert
    val b = (1L to 200L).filter(_ != 50L)
      .map(i => (i, if (i == 7L) "CHANGED" else s"v$i"))
      .toDF("id", "v")
      .unionAll(Seq((999L, "new")).toDF("id", "v"))
    val d = Maintenance.bucketedDiff(a, b, Seq("id"), Seq("v"), 8)
      .collect()
    // at most 3 buckets differ; censuses sum to exactly the edits
    d.length should be <= 3
    d.map(_.getLong(3)).sum shouldBe 1L // added (999)
    d.map(_.getLong(4)).sum shouldBe 1L // removed (50)
    d.map(_.getLong(5)).sum shouldBe 1L // changed (7)
    // row counts on differing buckets are reported for both sides
    d.foreach { r =>
      (r.getLong(1) > 0L || r.getLong(2) > 0L) shouldBe true
    }
  }
}
