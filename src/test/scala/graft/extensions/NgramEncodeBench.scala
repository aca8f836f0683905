package graft.extensions

import org.apache.spark.sql.SparkSession

/** Ad-hoc measurement main (Test/runMain graft.extensions.NgramEncodeBench):
  * string vs dictionary-encoded shingle join, warm, at a given SF dir. */
object NgramEncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.dedup.shareFrames", "false") // time the full path
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (encode <- Seq(false, true, false, true, false, true)) {
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccard(docs, 0.3, encodeShingles = encode).count()
      println(f"NGRAM encode=$encode rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
