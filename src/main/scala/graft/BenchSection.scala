package graft


/** Micro-harness: run ONE bench section by name (the full Bench main
  * takes ~25 min at sf0.1; iterating on a single section's shape
  * shouldn't cost that). Usage:
  * runMain graft.BenchSection <section> [sfDir] [reps] */
object BenchSection {
  def main(args: Array[String]): Unit = {
    val section = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.toolMax(logLevel = "ERROR")
    graft.functions.GraftFunctions.register(spark)
    val rows: Seq[(String, Double)] = section match {
      case "layout" => Bench.layoutBench(spark, sfDir, reps)
      case "scale" => Bench.scaleBench(spark, sfDir, reps)
      case "ann" => Bench.annBench(spark, sfDir, reps)
      case "streaming" => Bench.streamingBench(spark, sfDir, reps)
      case "lsm" => Bench.lsmBench(spark, sfDir, reps)
      case "scd_lsm" => Bench.scdLsmBench(spark, sfDir, reps)
      case "capstone" => Bench.capstoneBench(spark, sfDir, reps)
      case "skewjoin" => Bench.skewJoinBench(spark, reps)
      case "paged" => Bench.pagedBench(spark, reps)
      case "rtfilter" => Bench.runtimeFilterBench(spark, sfDir, reps)
      case "joint_admission" => Bench.jointAdmissionBench(spark, sfDir, reps)
      case "admission" => Bench.admissionBench(spark, sfDir, reps)
      case other => sys.error(s"unknown section: $other")
    }
    rows.foreach { case (k, v) => println(f"SECTION $section $k = $v%.3f") }
    spark.stop()
  }
}
