package graft.extensions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Packing.epochShuffle]] — the properties a data-loader's seeded
  * shuffle contract needs: the output is a PERMUTATION (every doc gets
  * exactly one rank, ranks are exactly 0..n−1), the same seed
  * reproduces it bit-for-bit (the whole point vs a random shuffle),
  * different seeds genuinely decorrelate, and the plan keeps the
  * [[Packing.globalRowNumber]] scale shape — no single-partition
  * window sneaks in. */
class EpochShuffleSpec extends SparkSpec {

  private val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("a permutation: ranks are exactly 0..n-1, one per doc") {
    val shuffled = Packing.epochShuffle(docs, seed = 7L)
    val n = docs.count()
    assert(shuffled.count() == n)
    assert(shuffled.select("doc_id").distinct().count() == n)
    val (minRn, maxRn, distinctRn) = {
      val r = shuffled.agg(min("epoch_rn"), max("epoch_rn"),
        countDistinct("epoch_rn")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(minRn == 0L && maxRn == n - 1 && distinctRn == n)
  }

  test("same seed reproduces; different seeds decorrelate") {
    def ranks(seed: Long): Seq[(Long, Long)] =
      Packing.epochShuffle(docs, seed).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val e7a = ranks(7L)
    val e7b = ranks(7L)
    val e8 = ranks(8L)
    assert(e7a == e7b) // epoch replay is exact
    // decorrelation: seeds agree on almost no positions (md5 makes a
    // fixed point probability 1/n per doc; identical orderings are
    // astronomically out)
    val agree = e7a.zip(e8).count { case ((_, a), (_, b)) => a == b }
    assert(agree < e7a.size / 10,
      s"$agree of ${e7a.size} positions unchanged between seeds")
    // and the shuffle is not the identity: rank order ≠ doc_id order
    assert(e7a.map(_._2) != e7a.map(_._2).sorted)
  }

  test("plan: no single-partition exchange, no unpartitioned window") {
    val p = Packing.epochShuffle(docs, seed = 7L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("windowspecdefinition()"), p)
    assert(p.contains("Scan ExistingRDD"), p) // the frozen ranged frame
  }
}
