package graft


/** Micro-harness: dump one registered query's formatted physical plan
  * (the per-operator audit loop — Exchange count, pushed filters,
  * codegen spans — without writing a throwaway main each time). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"=== $name @ $sfDir ===")
    df.explain("formatted")
    spark.stop()
  }
}
