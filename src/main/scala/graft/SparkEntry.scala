package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The full operator inventory lives in [[graft.queries.CoreQueries]]
  * (reference parity, SURVEY §2) and [[graft.queries.ExtensionQueries]]
  * (LLM-pipeline operators, SURVEY §7.1 step 7). */
object SparkEntry {

  /** Flagship query (SURVEY §3.2) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §7.1. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** DuckDB twin for every SQL-expressible query. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
