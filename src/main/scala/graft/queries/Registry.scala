package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: the Spark formulation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  * Every query is written to be deterministic: total-order sort keys,
  * rounded floats, exact decimal sums — SURVEY.md §5.1. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Registry {
  lazy val all: Seq[Q] =
    CoreQueries.all ++ ExtensionQueries.all ++ SqlQueries.all ++
      Round4Queries.all ++ Round5Queries.all ++ Round6Queries.all ++
      Round7Queries.all ++ Round8Queries.all ++ Round9Queries.all ++
      Round10Queries.all ++ Round11Queries.all ++ Round12Queries.all ++
      Round13Queries.all ++ Round14Queries.all ++ Round15Queries.all ++
      Round16Queries.all ++ Round17Queries.all ++ Round18Queries.all ++
      Round19Queries.all ++ Round20Queries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
