package graft

import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin

/** Grid-cell spatial join: equivalence with the naive cross-join form
  * (including cell-boundary cases) and haversine sanity. */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  test("cell-bucketed withinDistance equals the naive cross join") {
    // deterministic pseudo-random points, including exact cell-boundary
    // coordinates (integers) and near-boundary pairs
    val left = (1 to 200).map { i =>
      (i.toLong, ((i * 37) % 100 - 50) / 7.0, ((i * 53) % 80 - 40) / 7.0)
    }.toDF("lid", "lon", "lat")
    val right = (1 to 150).map { i =>
      (i.toLong, ((i * 41) % 100 - 50) / 7.0, ((i * 29) % 80 - 40) / 7.0)
    }.toDF("rid", "lon", "lat")
    val fast = SpatialJoin.withinDistance(left, right,
        "lid", "rid", "lon", "lat", radiusDeg = 1.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = SpatialJoin.withinDistanceNaive(left, right,
        "lid", "rid", "lon", "lat", radiusDeg = 1.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    fast shouldBe naive
    fast should not be empty
  }

  test("boundary points on exact cell edges still pair") {
    val left = Seq((1L, 2.0, 3.0)).toDF("lid", "lon", "lat")
    // just across the cell boundary, within radius
    val right = Seq((10L, 1.9, 3.0), (11L, 2.95, 3.0), (12L, 2.0, 4.2))
      .toDF("rid", "lon", "lat")
    val got = SpatialJoin.withinDistance(left, right,
        "lid", "rid", "lon", "lat", radiusDeg = 1.0)
      .collect().map(_.getLong(1)).sorted.toSeq
    got shouldBe Seq(10L, 11L) // 12 is 1.2 degrees away
  }

  test("haversine matches known city distance") {
    // Paris (2.3522, 48.8566) to London (-0.1276, 51.5072) ~ 344 km
    val d = Seq((2.3522, 48.8566, -0.1276, 51.5072))
      .toDF("lon1", "lat1", "lon2", "lat2")
      .select(SpatialJoin.haversineKm(col("lon1"), col("lat1"),
        col("lon2"), col("lat2")).as("km"))
      .head().getDouble(0)
    d shouldBe 344.0 +- 5.0
  }
}
