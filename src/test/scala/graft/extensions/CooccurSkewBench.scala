package graft.extensions

import org.apache.spark.sql.SparkSession

/** Ad-hoc skew probe (Test/runMain graft.extensions.CooccurSkewBench):
  * hof vs join when one document has a huge distinct-token set. */
object CooccurSkewBench {
  def main(args: Array[String]): Unit = {
    val bigTokens = if (args.length > 0) args(0).toInt else 3000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()
    // 500 short docs + one doc with `bigTokens` distinct tokens
    val short = (1L to 500L).map(i => (i, s"a$i b$i c d e f g h"))
    val big = Seq((0L, (1 to bigTokens).map(j => s"t$j").mkString(" ")))
    val docs = (short ++ big).toDF("doc_id", "text").repartition(32)
    for (strategy <- Seq("hof", "join", "hof", "join")) {
      val t0 = System.nanoTime()
      val n = TextAnalysis.cooccurrence(docs, pairStrategy = strategy).count()
      println(f"SKEW big=$bigTokens strategy=$strategy rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
