package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD merge scenarios from FIXTURES.md §A.2 / feeder_postgres.py:111-194:
  * new / unchanged / changed / disappeared / reappearing / idempotent /
  * late-snapshot abort. */
class ScdMergeSpec extends SparkSpec {
  import spark.implicits._

  private val key = "id"
  private val tracked = Seq("name", "salary")

  private def snap(rows: (Long, String, java.lang.Long)*): DataFrame =
    rows.toDF(key, "name", "salary")

  private def stateMap(df: DataFrame): Map[Long, (String, String, String)] =
    df.select(col("id"),
        date_format(col("added_at"), "yyyy-MM-dd"),
        date_format(col("updated_at"), "yyyy-MM-dd"),
        date_format(col("removed_at"), "yyyy-MM-dd"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap

  test("first snapshot: every key added with added_at=updated_at=date") {
    val s1 = ScdMerge.applySnapshot(
      ScdMerge.emptyState(snap()), snap((1, "a", 10L), (2, "b", 20L)),
      "2021-01-01", key, tracked)
    assert(stateMap(s1) == Map(
      1L -> (("2021-01-01", "2021-01-01", null)),
      2L -> (("2021-01-01", "2021-01-01", null))))
  }

  test("unchanged key keeps updated_at; changed key bumps it; values refresh") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L), (2, "b", 20L)), "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1,
      snap((1, "a", 10L), (2, "b", 25L)), "2021-01-08", key, tracked)
    val m = stateMap(s2)
    assert(m(1L) == (("2021-01-01", "2021-01-01", null)))
    assert(m(2L) == (("2021-01-01", "2021-01-08", null)))
    val salary2 = s2.filter($"id" === 2).select("salary").as[Long].head()
    assert(salary2 == 25L)
  }

  test("null-vs-value column change is detected (null-safe compare)") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", null)), "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1,
      snap((1, "a", 10L)), "2021-01-08", key, tracked)
    assert(stateMap(s2)(1L)._2 == "2021-01-08")
  }

  test("disappeared key gets tombstone; updated_at untouched") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L), (2, "b", 20L)), "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1,
      snap((1, "a", 10L)), "2021-01-08", key, tracked)
    assert(stateMap(s2)(2L) == (("2021-01-01", "2021-01-01", "2021-01-08")))
  }

  test("key added the same day it disappears is NOT tombstoned (added_at < date rule)") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L)), "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1, snap((2, "b", 20L)), "2021-01-01", key, tracked)
    // id 1 added at 2021-01-01, snapshot date = 2021-01-01 → added_at < date is false
    assert(stateMap(s2)(1L)._3 == null)
  }

  test("reappearing key refreshes values but keeps removed_at (reference quirk)") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L)), "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1, snap(), "2021-01-08", key, tracked)
    assert(stateMap(s2)(1L)._3 == "2021-01-08")
    val s3 = ScdMerge.applySnapshot(s2, snap((1, "a2", 11L)), "2021-01-15", key, tracked)
    val m = stateMap(s3)
    assert(m(1L) == (("2021-01-01", "2021-01-15", "2021-01-08")))
    assert(s3.filter($"id" === 1).select("name").as[String].head() == "a2")
  }

  test("already-removed key is not re-tombstoned on later absent snapshots") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L)), "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1, snap(), "2021-01-08", key, tracked)
    val s3 = ScdMerge.applySnapshot(s2, snap(), "2021-01-15", key, tracked)
    assert(stateMap(s3)(1L)._3 == "2021-01-08")
  }

  test("idempotence: feeding the same snapshot twice is a no-op") {
    val sn = snap((1, "a", 10L), (2, "b", 20L))
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(sn), sn, "2021-01-01", key, tracked)
    val s2 = ScdMerge.applySnapshot(s1, sn, "2021-01-01", key, tracked)
    assert(stateMap(s1) == stateMap(s2))
  }

  test("duplicate keys in one snapshot are deduped before merging") {
    val sn = snap((1, "a", 10L), (1, "a", 10L))
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(sn), sn, "2021-01-01", key, tracked)
    assert(s1.count() == 1)
  }

  test("late snapshot triggers the newer-record-detected abort") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L)), "2021-02-01", key, tracked)
    intercept[IllegalStateException] {
      ScdMerge.assertNotLate(s1, snap((1, "a", 10L)), "2021-01-01", key)
    }
    // in-order snapshot passes the guard
    ScdMerge.assertNotLate(s1, snap((1, "a", 10L)), "2021-02-08", key)
  }

  test("archived rows are treated as deleted (dropArchived)") {
    val sn = Seq((1L, "a", true), (2L, "b", false)).toDF("id", "name", "archived")
    assert(ScdMerge.dropArchived(sn).select("id").as[Long].collect().toSet == Set(2L))
  }

  test("classify matches per-key transitions") {
    val s1 = ScdMerge.applySnapshot(ScdMerge.emptyState(snap()),
      snap((1, "a", 10L), (2, "b", 20L), (3, "c", 30L)), "2021-01-01", key, tracked)
    val c = ScdMerge.classify(s1,
        snap((1, "a", 10L), (2, "b", 99L), (4, "d", 40L)), "2021-01-08", key, tracked)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c == Map(1L -> "unchanged", 2L -> "updated", 3L -> "removed", 4L -> "added"))
  }

  test("merge invariants over a random snapshot sequence") {
    val rnd = new scala.util.Random(42)
    val dates = (1 to 5).map(i => f"2021-01-$i%02d")
    val universe = (1L to 30L)
    var state = ScdMerge.emptyState(snap())
    var seen = Map.empty[Long, String] // id -> first date seen
    dates.foreach { d =>
      val rows = universe.filter(_ => rnd.nextBoolean())
        .map(id => (id, s"n$id", java.lang.Long.valueOf(rnd.nextInt(3).toLong)))
      state = ScdMerge.applySnapshot(state, snap(rows.toSeq: _*), d, key, tracked)
      rows.foreach { case (id, _, _) => if (!seen.contains(id)) seen += id -> d }
      val m = stateMap(state)
      // added_at = first date the key was ever seen
      assert(m.forall { case (id, (added, _, _)) => added == seen(id) })
      // updated_at >= added_at, monotone within run
      assert(m.forall { case (_, (added, updated, _)) => updated >= added })
    }
  }
}
