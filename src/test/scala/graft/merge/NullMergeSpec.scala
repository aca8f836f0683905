package graft.merge

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Round17Queries

/** Pins that q_merge_scd_null's fixture actually EXERCISES every NULL
  * transition class (r16 VERDICT #2's "done" condition) — counted from
  * the DATA, not re-derived from the construction formula, so a fixture
  * edit that silently drops a class fails here even while the oracle
  * row stays green. Also pins the one behavior the classes exist to
  * test: a naive `=!=` change chain (NULL-blind) disagrees with the
  * shipped `<=>` chain on exactly the NULL-involved rows. */
class NullMergeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val nullable = Seq(0, 3, 6, 9)

  private lazy val joined = {
    val a = Round17Queries.nullSnapA(spark, dir)
    val b = Round17Queries.nullSnapB(spark, dir)
    val an = a.select(col("id") +:
      (nullable.map(i => col(f"n$i%02d").as(s"a$i")) :+ col("n01").as("a1")): _*)
    val bn = b.select(col("id") +:
      (nullable.map(i => col(f"n$i%02d").as(s"b$i")) :+ col("n01").as("b1")): _*)
    an.join(bn, "id").localCheckpoint()
  }

  test("every NULL transition class occurs in the overlap, plus value-change and no-change rows") {
    def countWhere(c: org.apache.spark.sql.Column): Long =
      joined.filter(c).count()
    val nullToValue = nullable.map(i =>
      col(s"a$i").isNull && col(s"b$i").isNotNull).reduce(_ || _)
    val valueToNull = nullable.map(i =>
      col(s"a$i").isNotNull && col(s"b$i").isNull).reduce(_ || _)
    val nullToNull = nullable.map(i =>
      col(s"a$i").isNull && col(s"b$i").isNull).reduce(_ || _)
    val valueChanged = col("a1") =!= col("b1")
    val anyChange = nullable.map(i => !(col(s"a$i") <=> col(s"b$i")))
      .reduce(_ || _) || !(col("a1") <=> col("b1"))
    assert(countWhere(nullToValue) > 0, "no NULL→value transition in fixture")
    assert(countWhere(valueToNull) > 0, "no value→NULL transition in fixture")
    assert(countWhere(nullToNull) > 0, "no NULL→NULL transition in fixture")
    assert(countWhere(valueChanged) > 0, "no value→value-changed row in fixture")
    assert(countWhere(!anyChange) > 0, "no unchanged row in fixture")
    // the NULL→NULL class must include rows with NO other change —
    // otherwise a chain that wrongly fires on NULL→NULL could hide
    // behind a co-occurring real change
    assert(countWhere(nullToNull && !anyChange) > 0,
      "every NULL→NULL row co-occurs with a real change — class untested")
  }

  test("a NULL-blind =!= chain disagrees with the shipped <=> chain on NULL rows") {
    // the reference's stringwise diff treats NULL→value as a change and
    // NULL→NULL as no change; `a =!= b` evaluates to NULL on both (a
    // filter never fires), which is exactly the bug class this fixture
    // exists to catch
    val naive = (nullable.map(i => col(s"a$i") =!= col(s"b$i")) :+
      (col("a1") =!= col("b1"))).reduce(_ || _)
    val nullSafe = (nullable.map(i => !(col(s"a$i") <=> col(s"b$i"))) :+
      !(col("a1") <=> col("b1"))).reduce(_ || _)
    val missed = joined.filter(nullSafe && !coalesce(naive, lit(false))).count()
    assert(missed > 0,
      "naive chain never misses a change here — NULL classes not load-bearing")
  }
}
