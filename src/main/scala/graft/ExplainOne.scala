package graft

import org.apache.spark.sql.SparkSession

/** Micro-harness: dump one registered query's formatted physical plan
  * (the per-operator audit loop — Exchange count, pushed filters,
  * codegen spans — without writing a throwaway main each time). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"=== $name @ $sfDir ===")
    df.explain("formatted")
    spark.stop()
  }
}
