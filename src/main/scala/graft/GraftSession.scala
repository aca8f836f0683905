package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** Opinionated session factory: the configuration this engine assumes at
  * any scale (the harness driver builds its own session; these are the
  * settings we document and use in our own mains/tests).
  *
  *  - AQE on (runtime shuffle-partition coalescing + skew-join splitting),
  *    so `spark.sql.shuffle.partitions` is a ceiling, not a fixed cost;
  *  - auto-broadcast threshold left at default — small dims broadcast;
  *    bounded vocab dims (blocks.txt 61 lines × synonims.txt 430 lines,
  *    SURVEY §7.4) are orders of magnitude below it;
  *  - UTC session timezone pinned (tz-stripped timestamps, SURVEY §7.4);
  *  - graft's native functions registered via extensions.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()
}
