package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 (or a
  * north-star extension operator); `oracleSql` holds the DuckDB-equivalent
  * SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry ++ QueriesDedup.registry ++
      QueriesSimilarity.registry ++ QueriesRelational.registry ++
      QueriesStreaming.registry ++ QueriesMultimodal.registry ++
      QueriesCoverage.registry ++ QueriesCorpus.registry ++
      QueriesQuality.registry ++ QueriesAnalytics.registry ++
      QueriesPipeline.registry ++ QueriesGeo.registry

  def oracleSql: Map[String, String] =
    Queries.oracles ++ QueriesDedup.oracles ++
      QueriesSimilarity.oracles ++ QueriesRelational.oracles ++
      QueriesStreaming.oracles ++ QueriesMultimodal.oracles ++
      QueriesCoverage.oracles ++ QueriesCorpus.oracles ++
      QueriesQuality.oracles ++ QueriesAnalytics.oracles ++
      QueriesPipeline.oracles ++ QueriesGeo.oracles
}
