package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB variants of exact aggregates: HLL distinct and percentile
  * sketches. Not oracle-comparable bit-for-bit (sketches are
  * implementation-specific), so verified by tolerance against the exact
  * forms that ARE oracle-verified (q_count_distinct, q_percentile). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 20000).map(i => (i % 3777).toLong).toDF("k")

  test("approx_count_distinct within configured rsd of exact") {
    val exact = df.select(count_distinct($"k")).as[Long].head()
    val approx = df.select(approx_count_distinct($"k", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.06, s"$approx vs $exact")
  }

  test("approx_percentile lands within tight rank error of exact") {
    val vals = (1 to 10001).map(_.toDouble).toDF("v")
    val approx = vals.select(expr("approx_percentile(v, 0.5, 1000)")).as[Double].head()
    assert(math.abs(approx - 5001.0) <= 15.0, approx.toString)
  }
}
