package graft

import org.apache.spark.sql.functions._

/** Dev measurement for the band-saturation lever: times
  * [[graft.extensions.Dedup.hammingBandPairs]] over a corpus' SimHash
  * frame with and without a `bucketCols` pre-bucket key, from the SAME
  * checkpointed hash frame so only the banding self-join is billed.
  * Run against testdata_sf1 (MakeSf1), where the n²/2¹⁶ candidate
  * kernel is measurable; at sf0.1 both variants sit at the task floor.
  *
  * Usage: runMain graft.TimeHammingLever [sfDir] [reps] */
object TimeHammingLever {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "testdata_sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.tool(defaultCpus = 16, logLevel = "ERROR")
    val docs = Tables.table(spark, sfDir, "documents")
    val hashes = graft.extensions.Dedup
      .simHash(docs, share = false)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint()
    for ((label, buckets) <- Seq(
        "unbucketed" -> Nil, "bucketed_lang" -> Seq("lang"))) {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.extensions.Dedup
          .hammingBandPairs(hashes, "doc_id", "simhash",
            bucketCols = buckets)
          .count()
        println(f"LEVER $label rep=$i pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
