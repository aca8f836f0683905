package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc measurement main (Test/runMain graft.extensions.NgramPruneCrossoverBench):
  * locates the corpus size where the df=1 prune lever flips from
  * overhead to win. The corpus scales by NAMESPACE-SHIFTED replication:
  * replica i prefixes every token with "r{i}_", so each replica's
  * shingles live in a disjoint vocabulary — the df DISTRIBUTION
  * (including the singleton fraction the prune targets) is preserved
  * exactly at every scale, unlike id-offset replication, which
  * multiplies every df by k and leaves the prune nothing to drop.
  * Backs the PLANS.md crossover claim. */
object NgramPruneCrossoverBench {
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
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val n = base.count()
    // tail = per-doc unique filler tokens appended to the text. The
    // synthetic corpus has a tiny vocabulary (0.08% of sf0.1 shingle
    // ROWS are singletons — measured via DuckDB), so the df=1 prune has
    // nothing to drop no matter the size; natural web text is the
    // opposite (Zipf: singletons are a large fraction of shingle rows).
    // The tail dials that fraction in, making the crossover visible.
    for (k <- Seq(1, 4, 10); tail <- Seq(0, 60)) {
      val docs = (0 until k).map(i => base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r${i}_$$1").as("text")))
        .reduce(_ union _)
        .select(col("doc_id"),
          (if (tail == 0) col("text")
           else concat(col("text"), lit(" "),
             concat_ws(" ", transform(sequence(lit(1), lit(tail)),
               j => concat(lit("u"), col("doc_id"), lit("_"), j))))).as("text"))
      docs.localCheckpoint(true) // isolate the lever from the union scan
      for (prune <- Seq(false, true, false, true)) {
        val t0 = System.nanoTime()
        val rows = Dedup.ngramJaccard(docs, 0.3, dropUniqueShingles = prune).count()
        println(f"NGRAMPRUNE docs=${n * k} tail=$tail prune=$prune rows=$rows " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
