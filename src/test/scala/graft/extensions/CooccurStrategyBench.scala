package graft.extensions

import org.apache.spark.sql.SparkSession

/** Ad-hoc measurement main (Test/runMain graft.extensions.CooccurStrategyBench)
  * backing the q_cooccur pair-strategy decision: times "hof" vs "join"
  * warm at a given SF dir. Not part of the shipped library. */
object CooccurStrategyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.table(spark, sfDir, "documents")
    for (strategy <- Seq("hof", "join", "hof", "join", "hof", "join")) {
      val t0 = System.nanoTime()
      val n = TextAnalysis.cooccurrence(docs, pairStrategy = strategy).count()
      println(f"COOCCUR strategy=$strategy rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
