package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def cid(cx: Long, cy: Long): Long =
    (cx + (1L << 30)) * (1L << 31) + (cy + (1L << 30))

  test("gridDbscan: core chain, border, isolated core, noise") {
    val pts = Seq(
      // cells (0,0) and (1,0): core (2 pts each), adjacent -> cluster
      (1L, 0.1, 0.1), (2L, 0.5, 0.5),
      (3L, 1.2, 0.3), (4L, 1.8, 0.9),
      // cell (2,0): single point, adjacent to core (1,0) -> border
      (5L, 2.5, 0.5),
      // cell (5,5): isolated core pair -> own-cell cluster
      (6L, 5.2, 5.2), (7L, 5.8, 5.8),
      // far away single point -> noise
      (8L, 10.5, 10.5)).toDF("id", "x", "y")
    val got = Clustering.gridDbscan(pts, "id", "x", "y",
        cell = 1.0, minPts = 2L)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    val a = cid(0, 0)
    got(1L) shouldBe a
    got(2L) shouldBe a
    got(3L) shouldBe a
    got(4L) shouldBe a
    got(5L) shouldBe a // border takes the adjacent core cluster
    got(6L) shouldBe cid(5, 5) // isolated core keeps its own id
    got(7L) shouldBe cid(5, 5)
    got(8L) shouldBe -1L // noise
    got.size shouldBe 8
  }

  test("gridDbscan: diagonal adjacency connects, 2-cell gap does not") {
    val pts = Seq(
      (1L, 0.5, 0.5), (2L, 0.6, 0.6),   // core (0,0)
      (3L, 1.5, 1.5), (4L, 1.6, 1.6),   // core (1,1) — diagonal neighbor
      (5L, 4.5, 4.5), (6L, 4.6, 4.6))   // core (4,4) — out of reach
      .toDF("id", "x", "y")
    val got = Clustering.gridDbscan(pts, "id", "x", "y", 1.0, 2L)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    got(1L) shouldBe cid(0, 0)
    got(3L) shouldBe cid(0, 0) // diagonal merged
    got(5L) shouldBe cid(4, 4) // separate component
  }

  test("gridDbscan: negative coordinates floor correctly") {
    val pts = Seq(
      (1L, -0.5, -0.5), (2L, -0.1, -0.1), // cell (-1,-1), core
      (3L, -3.5, -3.5))                   // noise
      .toDF("id", "x", "y")
    val got = Clustering.gridDbscan(pts, "id", "x", "y", 1.0, 2L)
      .select("id", "cx", "cy", "cluster")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    got(1L)._2 shouldBe -1L // floor(-0.5) = -1, not trunc 0
    got(1L)._4 shouldBe cid(-1, -1)
    got(2L)._4 shouldBe cid(-1, -1)
    got(3L)._4 shouldBe -1L
  }
}
