package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers — the 100 TB story (SURVEY §4, §7.4).
  *
  * The reference approximates these by hand: year-partitioned CSV files
  * (vacancies_YYYY.csv.gz), 50k-row parquet files (feeder_hadoop.py:20),
  * and Postgres indexes on hot predicates (feeder_postgres.py:98-103).
  * On Spark the equivalents are directory partitioning (partition
  * pruning), bounded file sizes (task parallelism), sortWithinPartitions
  * (parquet min/max row-group skipping — the "index" substitute), and
  * bucketing (shuffle-free joins on the bucket key). */
object Layout {

  /** Write `df` partitioned by a derived year column: the per-year file
    * loop of the reference becomes `.../year=YYYY/` and year predicates
    * prune at plan time. `sortCols` are sorted WITHIN partitions so
    * parquet row-group stats can skip on them (Z-order-lite). */
  def writeYearPartitioned(
      df: DataFrame, tsCol: String, path: String,
      sortCols: Seq[String], maxRecordsPerFile: Int = 50000): Unit =
    df.withColumn("year", year(col(tsCol)))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .partitionBy("year")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(path)

  /** Bucketed table write: co-locates both sides of a future equi-join on
    * `bucketCol` so the join needs no exchange at all (requires a
    * warehouse-managed table — bucketing metadata lives in the catalog). */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Demonstrates that a year predicate prunes a partitioned layout:
    * returns the input files actually selected by the plan. */
  def prunedFiles(spark: SparkSession, path: String, yearValue: Int): Seq[String] = {
    val df = spark.read.parquet(path).filter(col("year") === yearValue)
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
        case _ => Seq.empty
      }
  }
}
