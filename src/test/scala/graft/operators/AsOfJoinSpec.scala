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

  test("NULL in the latest build row is carried as NULL, not back-filled") {
    // the atomic-struct-carry property: build rows (t1: tag=a, note=n1),
    // (t2: tag=b, note=NULL) — a probe after t2 must see (b, NULL),
    // never the mixed (b, n1)
    val b = Seq(
      (1L, ts("2021-01-01 00:00:00"), "a", "n1"),
      (1L, ts("2021-01-10 00:00:00"), "b", null))
      .toDF("user_id", "ts", "tag", "note")
    val p = Seq((200L, 1L, ts("2021-01-15 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.leftAsOf(p, b, Seq("user_id"), "ts", "ts",
        Map("tag" -> "tag", "note" -> "note")).head()
    assert(out.getAs[String]("tag") == "b")
    assert(out.isNullAt(out.fieldIndex("note")))
  }

  test("randomized parity with a brute-force reference (nulls included)") {
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { trial =>
      val buildRows = (1 to 30).map { _ =>
        (rnd.nextInt(4).toLong + 1,
          ts(f"2021-01-${rnd.nextInt(28) + 1}%02d 00:00:00"),
          if (rnd.nextInt(3) == 0) null else s"v${rnd.nextInt(5)}",
          if (rnd.nextInt(3) == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong))
      }.distinct
      val probeRows = (1 to 20).map { i =>
        (i.toLong, rnd.nextInt(5).toLong + 1,
          ts(f"2021-01-${rnd.nextInt(28) + 1}%02d 12:00:00"))
      }
      val b = buildRows.toDF("user_id", "ts", "tag", "score")
      val p = probeRows.toDF("event_id", "user_id", "ts")
      val out = AsOfJoin.leftAsOf(p, b, Seq("user_id"), "ts", "ts",
          Map("tag" -> "tag", "score" -> "score"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.getAs[String]("tag")), Option(r.getAs[java.lang.Long]("score")))).toMap
      // brute force: per probe, the whole max-(ts, insertion-stable) row
      probeRows.foreach { case (eid, uid, pts) =>
        val cands = buildRows.filter(br => br._1 == uid && !br._2.after(pts))
        val expected = if (cands.isEmpty) (None, None) else {
          val latest = cands.maxBy(_._2.getTime)
          // ties on ts: any of the tied rows is a valid carry, but tag
          // and score must come from the SAME row
          val tied = cands.filter(_._2 == latest._2)
          val actual = out(eid)
          assert(tied.exists(t => (Option(t._3), Option(t._4)) == actual),
            s"trial $trial probe $eid: $actual not among tied rows $tied")
          (Option(latest._3), Option(latest._4))
        }
        if (cands.isEmpty)
          assert(out(eid) == ((None, None)), s"trial $trial probe $eid")
      }
    }
  }

  test("forwardAsOf: matches earliest build row at-or-after each probe row") {
    val out = AsOfJoin.forwardAsOf(probe, build, Seq("user_id"), "ts", "ts",
        Map("tag" -> "next_tag"))
      .select("event_id", "next_tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 100 (1@01-10) -> v2 (01-15); 101 (1@01-20) -> none after; 102
    // (2@01-05) -> v3 (01-10); 103 (key 3) -> none
    assert(out == Map(100L -> "v2", 101L -> null, 102L -> "v3", 103L -> null))
  }

  test("forwardAsOf: equal timestamps match (>= is inclusive)") {
    val p = Seq((1L, 7L, ts("2021-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val b = Seq((7L, ts("2021-01-01 00:00:00"), "same")).toDF("user_id", "ts", "tag")
    val out = AsOfJoin.forwardAsOf(p, b, Seq("user_id"), "ts", "ts", Map("tag" -> "t"))
      .select("t").as[String].head()
    assert(out == "same")
  }

  test("forwardAsOf: randomized parity with a brute-force reference") {
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { trial =>
      val buildRows = (1 to 30).map { _ =>
        (rnd.nextInt(4).toLong + 1,
          ts(f"2021-01-${rnd.nextInt(28) + 1}%02d 00:00:00"),
          if (rnd.nextInt(3) == 0) null else s"v${rnd.nextInt(5)}")
      }.distinct
      val probeRows = (1 to 20).map { i =>
        (i.toLong, rnd.nextInt(5).toLong + 1,
          ts(f"2021-01-${rnd.nextInt(28) + 1}%02d 12:00:00"))
      }
      val b = buildRows.toDF("user_id", "ts", "tag")
      val p = probeRows.toDF("event_id", "user_id", "ts")
      val out = AsOfJoin.forwardAsOf(p, b, Seq("user_id"), "ts", "ts",
          Map("tag" -> "tag"))
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tag"))).toMap
      probeRows.foreach { case (eid, uid, pts) =>
        val cands = buildRows.filter(br => br._1 == uid && !br._2.before(pts))
        if (cands.isEmpty) assert(out(eid).isEmpty, s"trial $trial probe $eid")
        else {
          val earliest = cands.minBy(_._2.getTime)
          val tied = cands.filter(_._2 == earliest._2)
          assert(tied.exists(t => Option(t._3) == out(eid)),
            s"trial $trial probe $eid: ${out(eid)} not among tied rows $tied")
        }
      }
    }
  }

  test("probe columns pass through untouched") {
    val out = AsOfJoin.leftAsOf(probe, build, Seq("user_id"), "ts", "ts",
      Map("tag" -> "t"))
    assert(out.columns.toSeq == Seq("event_id", "user_id", "ts", "t"))
    assert(out.count() == 4)
  }
}
