package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection (SURVEY §4): prints `explain("formatted")` for
  * representative queries so scan pruning (`ReadSchema`/`PushedFilters`),
  * broadcast joins, and WholeStageCodegen spans can be reviewed per round.
  * Usage: runMain graft.Plans [sfDir] [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_prune", "q_join_broadcast", "q_flagship", "q_merge_scd",
        "q_dedup_minhash", "q_asof_join", "q_corpus_clean")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
