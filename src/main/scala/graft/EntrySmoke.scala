package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tool(defaultCpus = 8, logLevel = "ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY ROWS=" + df.count())
    df.show(12, false)
    spark.stop()
  }
}
