package graft


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
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
