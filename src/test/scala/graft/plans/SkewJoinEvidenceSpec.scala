package graft.plans

import graft.{Bench, SparkSpec}

/** Pins the [[graft.Bench.skewJoinBench]] evidence contract: with AQE
  * skew-join ON the hot partition is structurally split (the final
  * adaptive plan carries PartialReducerPartitionSpec slices); with it
  * OFF the same join leaves the hot partition whole. The bench section
  * then prices the same shape per round at 2M rows. */
class SkewJoinEvidenceSpec extends SparkSpec {

  test("AQE skew-join splits the hot partition when on, leaves it whole when off") {
    val rows = Bench.skewJoinBench(spark, reps = 1, n = 300000L).toMap
    assert(rows("hot_rows") == 150000.0, rows.toString)
    assert(rows("skew_on_splits") > 0, rows.toString)
    assert(rows("skew_off_splits") == 0.0, rows.toString)
  }
}
