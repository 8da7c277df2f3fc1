package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geocoding — the engine-side restatement of the reference's two
  * geocoders (HERE batch HTTP, `etl/geocoding.py:40-116`; CARTO
  * row-at-a-time SQL `cdb_geocode_street_point`,
  * `etl/geocoding.py:132-172`).
  *
  * The zero-egress analog of both is a reference-table join: a `Geocoder`
  * resolves an address column to (lon, lat), and `routed` reproduces the
  * reference's three-way result split (found / not_found / invalid,
  * `etl/geocoding.py:158-166`).
  *
  * Scale design: the address dimension is broadcast when small (the
  * common case - country/city gazetteers are tiny next to a 100 TB fact
  * table); a huge dimension falls back to a shuffle hash join on the
  * normalized address key. Either way it's one join, not the reference's
  * one-HTTP-round-trip-per-row loop.
  */
trait Geocoder {
  /** Adds `geo_lon`/`geo_lat` (nullable) to `df` keyed on `addressCol`. */
  def geocode(df: DataFrame, addressCol: String): DataFrame
}

/** Join against a lookup table with columns (address, lon, lat).
  * Address matching is case/whitespace-insensitive, like the reference's
  * header handling. */
class LookupTableGeocoder(lookup: DataFrame, broadcastDim: Boolean = true)
    extends Geocoder {
  private def normAddr(c: Column): Column = lower(trim(c))

  override def geocode(df: DataFrame, addressCol: String): DataFrame = {
    val dim = lookup.select(
      normAddr(col("address")).as("__addr_key"),
      col("lon").as("geo_lon"),
      col("lat").as("geo_lat"))
      .dropDuplicates("__addr_key")
    val dimSide = if (broadcastDim) broadcast(dim) else dim
    df.join(dimSide, normAddr(col(addressCol)) === col("__addr_key"),
        "left_outer")
      .drop("__addr_key")
  }
}

object Geocoding {
  /** The reference's result routing (`etl/geocoding.py:158-166`):
    * blank/missing address -> invalid; resolved coords -> found;
    * unresolved -> not_found. */
  def statusColumn(addressCol: Column, lonCol: Column): Column =
    when(addressCol.isNull || trim(addressCol) === "", lit("invalid"))
      .when(lonCol.isNotNull, lit("found"))
      .otherwise(lit("not_found"))

  /** Geocode + route. The result carries every input column plus
    * geo_lon/geo_lat/status; callers can `write.partitionBy("status")`
    * to get the reference's three output files as table partitions. */
  def routed(geocoder: Geocoder, df: DataFrame,
      addressCol: String): DataFrame =
    geocoder.geocode(df, addressCol)
      .withColumn("status", statusColumn(col(addressCol), col("geo_lon")))
}
