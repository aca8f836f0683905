package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The binned range join exists for exactly one reason: a plain
  * point-in-interval theta join plans as BroadcastNestedLoopJoin
  * (O(|facts|×|intervals|)); binning turns it into a HASH join on the
  * bin key. This spec pins that plan shape, proves equivalence to the
  * naive theta join on adversarial boundary data (interval edges exactly
  * on bin edges, fractional widths where fp rounding bites), and sweeps
  * randomized cases against the naive join as ground truth. */
class BinnedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(facts: DataFrame, intervals: DataFrame): Set[(Long, String)] =
    facts.join(intervals,
        facts("v") >= intervals("lo") && facts("v") < intervals("hi"))
      .select(col("id"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def binned(facts: DataFrame, intervals: DataFrame, w: Double): Set[(Long, String)] =
    RangeJoin.pointInInterval(facts, "v", intervals, w)
      .select(col("id"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("plans a hash join on the bin key, never BroadcastNestedLoopJoin") {
    val facts = (1L to 100L).map(i => (i, i * 0.7)).toDF("id", "v")
    val intervals = Seq((0.0, 20.0, "a"), (20.0, 50.0, "b"), (50.0, 80.0, "c"))
      .toDF("lo", "hi", "tag")
    val plan = RangeJoin.pointInInterval(facts, "v", intervals, 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("bin"), plan)
    // the contrast that motivates the module: the same predicate as a
    // plain theta join IS a nested-loop plan
    val theta = facts.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(theta.contains("BroadcastNestedLoopJoin"), theta)
  }

  test("interval ending exactly on a bin edge: hi stays exclusive") {
    // hi = 10.0 sits exactly on a bin edge at every one of these widths;
    // v = 10.0 must never match, v just below must always match
    val facts = Seq((1L, 9.999999), (2L, 10.0), (3L, 0.0), (4L, -0.000001))
      .toDF("id", "v")
    val intervals = Seq((0.0, 10.0, "iv")).toDF("lo", "hi", "tag")
    for (w <- Seq(0.1, 0.25, 1.0, 2.5, 5.0, 10.0, 20.0)) {
      val got = binned(facts, intervals, w)
      assert(got == Set((1L, "iv"), (3L, "iv")), s"w=$w got=$got")
    }
  }

  test("fractional widths with fp-inexact quotients drop nothing") {
    // 0.3/0.1 = 2.9999999999999996 in doubles: floor(hi/w) lands in bin 2,
    // same bin as v = 0.29 — the case where a pmod(hi,w)==0 'boundary
    // decrement' heuristic either misfires or silently drops matches.
    val facts = Seq((1L, 0.29), (2L, 0.3), (3L, 0.1), (4L, 0.0999999))
      .toDF("id", "v")
    val intervals = Seq((0.1, 0.3, "iv")).toDF("lo", "hi", "tag")
    for (w <- Seq(0.1, 0.05, 0.2, 0.3)) {
      val got = binned(facts, intervals, w)
      assert(got == Set((1L, "iv"), (3L, "iv")), s"w=$w got=$got")
    }
  }

  test("negative values and negative interval bounds bin correctly") {
    val facts = Seq((1L, -5.0), (2L, -0.5), (3L, 0.0), (4L, -10.0)).toDF("id", "v")
    val intervals = Seq((-10.0, -1.0, "neg"), (-1.0, 1.0, "mid")).toDF("lo", "hi", "tag")
    for (w <- Seq(0.7, 1.0, 3.0)) {
      val got = binned(facts, intervals, w)
      assert(got == naive(facts, intervals), s"w=$w got=$got")
    }
  }

  test("randomized sweep matches the naive theta join exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      // quantized values/bounds so edge collisions actually occur
      val facts = (1L to 60L)
        .map(i => (i, math.round(rnd.nextDouble() * 400 - 200) / 10.0))
        .toDF("id", "v")
      val intervals = (1 to 12).map { k =>
        val lo = math.round(rnd.nextDouble() * 400 - 200) / 10.0
        (lo, lo + math.round(rnd.nextDouble() * 100 + 1) / 10.0, s"iv$k")
      }.toDF("lo", "hi", "tag")
      val w = Seq(0.1, 0.3, 1.0, 2.5, 7.0)(trial % 5)
      assert(binned(facts, intervals, w) == naive(facts, intervals),
        s"trial=$trial w=$w")
    }
  }

  test("each fact lands in exactly one bin: no duplicate matches") {
    val facts = Seq((1L, 5.0)).toDF("id", "v")
    // overlapping intervals both match — one output row EACH, no more
    val intervals = Seq((0.0, 10.0, "a"), (4.0, 6.0, "b")).toDF("lo", "hi", "tag")
    val rows = RangeJoin.pointInInterval(facts, "v", intervals, 1.0).collect()
    assert(rows.length == 2, rows.mkString(","))
  }

  test("brackets renames lo/hi columns through to the same result") {
    val facts = Seq((1L, 3.0), (2L, 30.0)).toDF("id", "v")
    val iv = Seq((0.0, 10.0, "x")).toDF("from_v", "to_v", "tag")
    val got = RangeJoin.brackets(facts, "v", iv, "from_v", "to_v", 2.0)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "x")))
  }
}
