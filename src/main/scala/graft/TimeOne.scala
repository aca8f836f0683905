package graft

/** Micro-harness: time one registered query N times in a warm JVM.
  * Usage: runMain graft.TimeOne <query> [sfDir] [reps] [count|noop]
  *
  * Mode `count` (default, historical) drives `.count()` — which lets
  * Catalyst COLUMN-PRUNE every projection the count doesn't need, so a
  * wide-output query (q_merge_scd_wide's 53 value columns) bills only
  * its join/lifecycle skeleton. Mode `noop` drives
  * `write.format("noop")` — full evaluation of every output column
  * with zero IO, the same honest-cost stat the bench uses (r17 VERDICT
  * #6: the sf10 merge decade cells were count()-only; the noop mode
  * closes that billing hole). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val mode = if (args.length > 3) args(3) else "count"
    require(mode == "count" || mode == "noop", s"unknown mode $mode")
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = if (mode == "count") df.count()
      else { df.write.format("noop").mode("overwrite").save(); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $name mode=$mode rep=$i rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
