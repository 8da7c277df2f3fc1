package graft

import org.apache.spark.sql.functions._
import graft.operators.{Geocoding, LookupTableGeocoder}

/** Lookup-table geocoder unit behavior (the oracle covers q10
  * end-to-end; this pins the operator-level contracts). */
class GeocodingSpec extends SparkSpec {
  import spark.implicits._

  private def lookup = Seq(
    ("Dublin", -6.26, 53.35),
    ("  MADRID ", -3.70, 40.42)).toDF("address", "lon", "lat")

  private def input = Seq(
    (1, "dublin"), (2, "Madrid"), (3, "atlantis"), (4, ""), (5, null))
    .toDF("id", "addr")

  test("address matching is case and whitespace insensitive") {
    val out = new LookupTableGeocoder(lookup).geocode(input, "addr")
      .orderBy("id").collect()
    out(0).getAs[Double]("geo_lon") shouldBe -6.26
    out(1).getAs[Double]("geo_lat") shouldBe 40.42
    out(2).isNullAt(out(2).fieldIndex("geo_lon")) shouldBe true
  }

  test("three-way routing: found / not_found / invalid") {
    val routed = Geocoding.routed(new LookupTableGeocoder(lookup),
      input, "addr").orderBy("id").collect()
    routed.map(_.getAs[String]("status")).toSeq shouldBe
      Seq("found", "found", "not_found", "invalid", "invalid")
  }

  test("non-broadcast dim path produces identical results") {
    val b = Geocoding.routed(new LookupTableGeocoder(lookup, broadcastDim = true),
      input, "addr").orderBy("id").collect()
    val s = Geocoding.routed(new LookupTableGeocoder(lookup, broadcastDim = false),
      input, "addr").orderBy("id").collect()
    b.map(_.toString).toSeq shouldBe s.map(_.toString).toSeq
  }

  test("duplicate addresses in the lookup keep one deterministic entry") {
    val dup = lookup.unionAll(Seq(("dublin", 0.0, 0.0)).toDF("address", "lon", "lat"))
    val out = new LookupTableGeocoder(dup).geocode(input.filter(col("id") === 1), "addr")
      .collect()
    out.length shouldBe 1 // no fan-out from the duplicate key
  }
}
