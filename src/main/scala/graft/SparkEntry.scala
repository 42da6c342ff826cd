package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract - batch-oracle surface of the engine.
  *
  * Every entry runs the SAME pure DataFrame=>DataFrame operators the
  * streaming pipeline uses (SURVEY 7.1), over the driver's parquet test
  * tables, with a DuckDB-executable oracle in [[oracleSql]]. Column names
  * and types are aligned on both sides (the driver sorts columns by name
  * and hash-compares values). Non-deterministic columns (current_timestamp)
  * are excluded from oracle outputs (SURVEY 7.5.4); floating aggregates
  * are rounded identically on both sides to absorb summation-order ulps.
  *
  * The registrations themselves live in per-family registry objects under
  * [[graft.queries]] (QueriesReference, QueriesDedup, ...), each pairing
  * its query lambdas with their oracle strings; cross-family SQL fragments
  * live in [[graft.queries.QueryShared]]. This object is the fold point -
  * keys are globally unique (asserted in QueryRegistrySpec), so the map
  * union is order-independent.
  */
object SparkEntry {

  private val families = Seq(
    (QueriesReference.queries, QueriesReference.oracleSql),
    (QueriesDedup.queries, QueriesDedup.oracleSql),
    (QueriesSim.queries, QueriesSim.oracleSql),
    (QueriesText.queries, QueriesText.oracleSql),
    (QueriesCorpus.queries, QueriesCorpus.oracleSql),
    (QueriesMultimodal.queries, QueriesMultimodal.oracleSql),
    (QueriesOlap.queries, QueriesOlap.oracleSql),
    (QueriesStat.queries, QueriesStat.oracleSql),
  )

  /** Flagship query on sf0.001 - the full reference alert chain
    * (JSON parse -> flatten -> 10-branch classify -> enrich). */
  def entry(spark: SparkSession): DataFrame =
    queries("alerts_classify")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.iterator.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    families.iterator.map(_._2).reduce(_ ++ _)
}
