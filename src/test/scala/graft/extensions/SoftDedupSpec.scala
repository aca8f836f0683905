package graft.extensions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins soft dedup's defining invariant: MASS CONSERVATION. Each
  * near-dup component contributes exactly 1.0 total weight (its members
  * split 1/|comp| evenly), so Σ weights over the corpus ≡ the component
  * count EXACTLY — checked in decimal arithmetic so the equality is
  * bitwise, not approximate. A weighting that drifted (wrong join,
  * double-counted member, un-rounded division) breaks conservation
  * before it breaks any aggregate downstream. */
class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val docs = graft.Tables.table(spark, dir, "documents")

  test("weights conserve mass: sum over corpus == component count (decimal-exact up to per-comp rounding)") {
    val w = Dedup.softDedupWeights(docs).localCheckpoint()
    val nComps = w.select("comp").distinct().count()
    val total = w.agg(
      sum(col("weight").cast("decimal(28,6)")).as("s")).head()
      .getDecimal(0)
    // each component of size k contributes k * round(1/k, 6): exactly 1
    // when k divides cleanly, within k*5e-7 otherwise — bound the drift
    // by the worst-case rounding, never by a loose epsilon
    val maxDrift = w.agg(sum(
      abs(lit(1.0) / col("cluster_size") -
        round(lit(1.0) / col("cluster_size"), 6))).as("d")).head().getDouble(0)
    val diff = math.abs(total.doubleValue() - nComps.toDouble)
    assert(diff <= maxDrift + 1e-9,
      s"mass not conserved: sum=$total over $nComps components " +
        s"(diff $diff > rounding bound $maxDrift)")
    // and every doc appears exactly once with a positive weight
    assert(w.count() == docs.count())
    assert(w.filter(col("weight") <= 0 || col("weight") > 1).count() == 0)
  }

  test("per-source mass never exceeds raw count; singleton-only source would keep ratio 1") {
    val mass = Dedup.softDedupMass(docs)
      .as[(String, Long, Double, Double)].collect()
    assert(mass.nonEmpty)
    mass.foreach { case (src, n, eff, ratio) =>
      assert(eff <= n + 1e-6, s"$src: effective mass $eff exceeds raw $n")
      assert(ratio > 0 && ratio <= 1.0 + 1e-6, s"$src ratio $ratio")
    }
    // the corpus HAS duplicate clusters (the fixture plants them), so
    // at least one source must show a ratio strictly below 1
    assert(mass.exists(_._4 < 1.0),
      s"no source shows dedup adjustment — fixture lost its duplicates? " +
        mass.mkString(", "))
  }
}
