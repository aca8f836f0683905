package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val probe = Seq(
    (100L, 1L, ts("2021-01-10 00:00:00")),
    (101L, 1L, ts("2021-01-20 00:00:00")),
    (102L, 2L, ts("2021-01-05 00:00:00")),  // before any build row
    (103L, 3L, ts("2021-01-10 00:00:00")))  // key with no build rows
    .toDF("event_id", "user_id", "ts")

  private lazy val build = Seq(
    (1L, ts("2021-01-01 00:00:00"), "v1"),
    (1L, ts("2021-01-15 00:00:00"), "v2"),
    (2L, ts("2021-01-10 00:00:00"), "v3"))
    .toDF("user_id", "ts", "tag")

  test("matches latest build row at-or-before each probe row") {
    val out = AsOfJoin.leftAsOf(probe, build, Seq("user_id"), "ts", "ts",
        Map("tag" -> "asof_tag"))
      .select("event_id", "asof_tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(100L -> "v1", 101L -> "v2", 102L -> null, 103L -> null))
  }

  test("equal timestamps match (<= semantics: build sorts before probe)") {
    val p = Seq((1L, 7L, ts("2021-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val b = Seq((7L, ts("2021-01-01 00:00:00"), "same")).toDF("user_id", "ts", "tag")
    val out = AsOfJoin.leftAsOf(p, b, Seq("user_id"), "ts", "ts", Map("tag" -> "t"))
      .select("t").as[String].head()
    assert(out == "same")
  }

  test("probe columns pass through untouched") {
    val out = AsOfJoin.leftAsOf(probe, build, Seq("user_id"), "ts", "ts",
      Map("tag" -> "t"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "t"))
    assert(out.count() == 4)
  }
}
