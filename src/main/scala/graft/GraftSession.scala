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
  *  - graft's native functions registered via extensions;
  *  - `spark.sql.unionOutputPartitioning` OFF (r17): Spark 4.1's
  *    zip-merging UnionExec trusts the children's STATIC partitioning
  *    claims, but under AQE a child's runtime partition count can
  *    diverge (skew-split / coalesce / checkpoint materialization) —
  *    at sf10 the postings view's base∪log union died with "Can't zip
  *    RDDs with unequal numbers of partitions: List(32, 64)" (found by
  *    the r17 scaling run; sf≤1 never triggers it). The shuffle the
  *    optimization saves (the window exchange above the union) is one
  *    this engine already documents and bills; a loud scale-dependent
  *    crash is not worth it.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()
}
