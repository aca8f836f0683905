package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The mergeable quantile state's three contracts: (1) merge ∘ build ≡
  * build ∘ union EXACTLY at any split (plain union+sum — unlike CMS/
  * KMV there is no "w.h.p." anywhere); (2) every estimate is within
  * one bin width of the exact order statistic when the value lies in
  * [lo, hi); (3) out-of-range values clamp into the edge bins instead
  * of vanishing (totality — the EmptyCorpus discipline applied to the
  * domain). */
class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val (lo, hi, bins) = (0L, 200L, 32)
  private val binWidth = (hi - lo) / bins

  private def state(df: DataFrame) =
    Sketches.histState(df, "v", lo, hi, bins)

  private def canon(df: DataFrame): Seq[(Int, Long)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq

  test("merge of per-split states equals the flat build, exactly, at any split") {
    val vals = spark.range(0, 5000)
      .select((pmod(col("id") * 37 + 11, lit(220)) - 10).as("v"))
      .localCheckpoint()
    val flat = state(vals)
    for (parts <- Seq(2, 3, 7)) {
      val merged = (0 until parts)
        .map(i => state(vals.filter(pmod(col("v") + 10, lit(parts)) === i)))
        .reduce(Sketches.mergeHist)
      assert(canon(merged) == canon(flat), s"split into $parts diverged")
    }
  }

  test("estimates land within one bin width of the exact order statistic") {
    val n = 4000
    val vals = spark.range(0, n)
      .select(pmod(col("id") * 97 + 3, lit(200)).as("v")).localCheckpoint()
    val qs = Seq(100, 250, 500, 750, 900, 990)
    val est = Sketches.histQuantile(state(vals), qs, lo, hi, bins)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sorted = vals.orderBy("v").collect().map(_.getLong(0))
    qs.foreach { q =>
      // the estimator's own rank definition: ⌈q·N/1000⌉ (1-based)
      val exact = sorted((q.toLong * n + 999).toInt / 1000 - 1)
      assert(est(q) >= exact && est(q) - exact <= binWidth,
        s"q=$q: est ${est(q)} vs exact $exact (bin width $binWidth)")
    }
  }

  test("out-of-range values clamp into the edge bins; quantiles stay total") {
    val vals = Seq(-50L, -1L, 0L, 5L, 199L, 200L, 9999L).toDF("v")
    val s = canon(state(vals)).toMap
    assert(s(0) == 4L, "two low outliers + the in-range 0 and 5 land in bin 0")
    assert(s(bins - 1) == 3L, "199 plus two high outliers land in the top bin")
    // the median of a mostly-outlier set still reports (edge-bin answer)
    val med = Sketches.histQuantile(state(vals), Seq(500), lo, hi, bins)
      .head().getLong(1)
    assert(med >= lo && med <= hi)
  }
}
