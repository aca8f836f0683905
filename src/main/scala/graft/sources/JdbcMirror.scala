package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC mirror — the reference's Postgres→Parquet feeder
  * (feeder_hadoop.py:79-86) as a partitioned Spark JDBC read/write.
  *
  * The reference reads the whole table over ONE connection
  * (`pd.read_sql`, feeder_hadoop.py:86) — a single-threaded bottleneck
  * the moment the table outgrows one worker. `partitionColumn` +
  * `lowerBound`/`upperBound`/`numPartitions` splits the read into range
  * predicates (`WHERE col >= l AND col < u`) executed concurrently by
  * the executors, so the mirror scales with the cluster while the
  * database sees bounded, index-friendly range scans. Each range query
  * also pushes projected columns and filters down to the database
  * (Catalyst JDBC pushdown), so the mirror moves only needed bytes.
  *
  * At 100 TB the same call works against any JDBC warehouse; bounds
  * come from `SELECT min(col), max(col)` (one scalar round trip, the
  * driver-side cost the reference already pays for its HWM probe). */
object JdbcMirror {

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Mirror a frame into the database (the reverse direction the
    * reference never had: parquet → warehouse serving table). */
  def write(df: DataFrame, url: String, table: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode("overwrite")
      .save()
}
