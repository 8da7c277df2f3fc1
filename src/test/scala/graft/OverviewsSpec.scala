package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsyncJobs, Overviews}

/** Overview pyramid + the async submit/poll lifecycle (T14). */
class OverviewsSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (10.0, 45.0, 1.0), (10.1, 45.1, 2.0), (-170.0, -80.0, 3.0),
    (179.9, 89.9, 4.0)).toDF("lon", "lat", "v")

  test("level snaps points to bounded grid cells with aggregates") {
    val lvl = Overviews.level(points, "lon", "lat", zoom = 2,
      valueCols = Seq("v")).collect()
    // zoom 2 -> 4x4 grid; nearby points share a cell
    lvl.length shouldBe 3
    val cells = lvl.map(r => (r.getLong(0), r.getLong(1))).toSet
    all(cells.toSeq.flatMap(c => Seq(c._1, c._2))) should (be >= 0L and be <= 3L)
    val merged = lvl.find(_.getLong(2) == 2).get // the two nearby points
    merged.getDouble(5) shouldBe 3.0 // sum_v = 1 + 2
  }

  test("pyramid builds independent levels") {
    val p = Overviews.pyramid(points, "lon", "lat", Seq(0, 12))
    p(0).count() shouldBe 1 // single world cell
    // zoom 12 cells are ~0.09 deg — every fixture point lands alone
    p(12).count() shouldBe points.count()
  }

  test("async regenerate_overviews: submit returns, poll reaches done") {
    val out = java.nio.file.Files.createTempDirectory("graft_ov").toString
    val id = AsyncJobs.regenerateOverviews(points, "lon", "lat",
      Seq(1, 3), out)
    AsyncJobs.checkJob(id) should not be None
    var waited = 0
    while (AsyncJobs.checkJob(id).exists(s =>
        s.name == "pending" || s.name == "running") && waited < 600) {
      Thread.sleep(100); waited += 1
    }
    AsyncJobs.checkJob(id).map(_.name) shouldBe Some("done")
    spark.read.parquet(s"$out/zoom=1").count() should be >= 1L
    spark.read.parquet(s"$out/zoom=3").count() should be >= 1L
  }

  test("unknown job id -> None") {
    AsyncJobs.checkJob("nope") shouldBe None
  }
}
