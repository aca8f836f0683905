package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the HLL member of the bounded-summary family: the
  * state is ≤ m rows per source, merge is union+MAX (exact, idempotent
  * — replays are no-ops, the property the CMS leg lacks), merge ∘
  * build ≡ build ∘ union bitwise, small ranges take the linear-
  * counting branch exactly, and the estimate lands within the
  * published HLL error envelope on a large distinct set. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  // ~2.2k distinct 3-gram shingles in one source: i j k tokens stride
  private def bigCorpus: DataFrame = docsOf(
    (0L until 75L).map(i =>
      (i, (0 until 32).map(j => s"t${i * 31 + j}").mkString(" "), "big")))

  private def smallCorpus: DataFrame = docsOf(Seq(
    (0L, "a b c d e", "small"))) // 3 distinct shingles « 2.5m

  test("state is bounded by m per source and merge is union+max, replay a no-op") {
    val a = bigCorpus.filter(col("doc_id") < 40)
    val b = bigCorpus.filter(col("doc_id") >= 40)
    val sa = Sketches.hllState(a)
    val sb = Sketches.hllState(b)
    assert(sa.count() <= 64 && sb.count() <= 64)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._2, t._3))
      .toSeq
    val merged = canon(Sketches.mergeHll(sa, sb))
    // merge ∘ build ≡ build ∘ union, bitwise (all-integer state)
    assert(merged == canon(Sketches.hllState(bigCorpus)))
    // idempotent: re-merging a replayed slice changes nothing
    assert(canon(Sketches.mergeHll(Sketches.mergeHll(sa, sb), sb)) == merged)
    // and the estimates agree too
    val eM = Sketches.hllEstimate(Sketches.mergeHll(sa, sb)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val e1 = Sketches.hllEstimate(Sketches.hllState(bigCorpus)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(eM == e1)
  }

  test("small range takes the linear-counting branch exactly") {
    // 3 distinct shingles, 3 occupied buckets at most -> zeros ≥ 61 and
    // raw « 160: estimate must be m·ln(m/zeros) for the observed zeros
    val row = Sketches.hllDistinct(smallCorpus).collect().head
    assert(row.getLong(1) == 3L, "exact side")
    val occupied = Sketches.hllState(smallCorpus).count()
    val expected = BigDecimal(64.0 * math.log(64.0 / (64L - occupied)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(2) == expected,
      s"linear counting: got ${row.getDouble(2)}, expected $expected")
  }

  test("estimate within the HLL error envelope on ~2.3k distincts") {
    val row = Sketches.hllDistinct(bigCorpus).collect().head
    val exact = row.getLong(1).toDouble
    val est = row.getDouble(2)
    // published std error 1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.39,
      s"est $est vs exact $exact")
    assert(exact > 2000, "the raw branch is engaged, not linear counting")
  }
}
