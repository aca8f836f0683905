package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the harness testdata (TESTDATA.md).
  *
  * Mirrors the reference's columnar analytical store: Parquet + explicit
  * schema + Catalyst column pruning (reference: feeder_hadoop.py:19,87 writes
  * the analytical parquet; the notebook reads column-pruned CSV,
  * 001_….ipynb cell 17 `usecols=`). At 100 TB the same call reads a
  * partitioned table; filters/projections push to the scan automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects at
    * schema inference — probed on Spark 4.1.2 (graft.NanosProbe): a plain
    * read fails with [PARQUET_TYPE_ILLEGAL] Illegal Parquet type: INT64
    * (TIMESTAMP(NANOS,false)); Spark has no nanosecond TimestampType.
    * The one native escape, `spark.sql.legacy.parquet.nanosAsLong=true`
    * (SPARK-40819), infers ts as plain BIGINT — exactly what the explicit
    * schema below declares, minus the mutable session-wide conf flip. So
    * we read the physical INT64 nanos with an explicit schema — SURVEY
    * §1.3: always declare schemas, never infer — and rebuild a session-TZ
    * TimestampType at microsecond precision (`ts div 1000` keeps the math
    * in exact integer space). Revisit if Spark gains TIMESTAMP(NANOS). */
  private val eventsRawSchema =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"

  /** Memoized analyzed frames, keyed by (session, dir, name).
    *
    * `spark.read.parquet` re-lists the directory and re-reads the footer
    * schema on every call; across a ~77-query suite that fixed cost is
    * most of the wall time at small SF. Reusing the analyzed
    * LogicalRelation is exactly what `spark.table` does with a catalog —
    * plans, pushdown and pruning are unaffected. Keyed by session so a
    * stopped session's frames are never served to a new one, and evicted
    * when the session's context ends so long-lived processes that build
    * many sessions don't retain dead plans. */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private val evictionHooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Boolean]

  private def ensureEviction(spark: SparkSession): Unit =
    evictionHooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            evict(spark)
        })
      true
    })

  /** Drop this session's memoized frames (application-end hook). */
  def evict(spark: SparkSession): Unit = {
    memo.keys.filter(_._1 eq spark).foreach(memo.remove)
    evictionHooked.remove(spark)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureEviction(spark)
    memo.getOrElseUpdate((spark, dir, name), load(spark, dir, name))
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      spark.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
