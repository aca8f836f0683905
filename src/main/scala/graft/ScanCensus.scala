package graft


/** Audit harness: for every registered query, count the parquet scans
  * and red-flag operators in its EXECUTED plan — the registry-wide form
  * of the per-query audits that caught q_pipeline_funnel's 14 scans
  * (r10), q_hist_quantile's 4 (r12), and the postings family's
  * per-leg re-derivation (r13). A high scan count is not automatically
  * wrong (some contracts legitimately read several tables), but every
  * outlier should have a reviewed explanation in PLANS.md.
  * Usage: runMain graft.ScanCensus [sfDir] [minScans] */
object ScanCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val minScans = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(p).size
        val cartesian = p.contains("CartesianProduct")
        val single = p.contains("Exchange SinglePartition")
        if (scans >= minScans || cartesian || single) {
          flagged += 1
          println(s"CENSUS $name scans=$scans" +
            (if (cartesian) " CARTESIAN" else "") +
            (if (single) " SINGLE_PARTITION" else ""))
        }
      } catch {
        case e: Throwable => println(s"CENSUS $name ERROR ${e.getMessage}")
      }
    }
    println(s"CENSUS done: $flagged flagged of ${SparkEntry.queries.size} (minScans=$minScans)")
    spark.stop()
  }
}
