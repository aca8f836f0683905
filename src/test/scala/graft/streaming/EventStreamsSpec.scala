package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-level so Spark can derive an Encoder without an outer scope. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dedupWithinWatermark drops redelivered ids, keeps distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventStreams.dedupWithinWatermark(input.toDF())
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1L, ts("2021-01-01 10:00:00"), 7L, "view"),
        Ev(1L, ts("2021-01-01 10:00:05"), 7L, "view"), // redelivery
        Ev(2L, ts("2021-01-01 10:01:00"), 7L, "view"))
      q.processAllAvailable()
      // second micro-batch redelivers id 1 again within the horizon
      input.addData(Ev(1L, ts("2021-01-01 10:02:00"), 7L, "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("viewToPurchase joins each purchase to in-window views only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val out = EventStreams.viewToPurchase(
      views.toDF(), purchases.toDF(), lookback = "1 hour")
    val q = out.writeStream.format("memory").queryName("v2p")
      .outputMode("append").start()
    try {
      views.addData(
        Ev(10L, ts("2021-01-01 09:30:00"), 7L, "view"), // in window
        Ev(11L, ts("2021-01-01 08:00:00"), 7L, "view"), // too old
        Ev(12L, ts("2021-01-01 09:45:00"), 8L, "view")) // other user
      purchases.addData(Ev(100L, ts("2021-01-01 10:00:00"), 7L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("v2p")
        .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((100L, 10L)))
    } finally q.stop()
  }

  test("batch twin: the same interval join runs in batch mode for backfill") {
    // the operator is mode-agnostic — run it over static frames and
    // cross-check with an independent SQL formulation
    val evs = Seq(
      Ev(10L, ts("2021-01-01 09:30:00"), 7L, "view"),
      Ev(11L, ts("2021-01-01 08:00:00"), 7L, "view"),
      Ev(100L, ts("2021-01-01 10:00:00"), 7L, "purchase")).toDF()
    val out = EventStreams.viewToPurchase(
      evs.filter($"event_type" === "view"),
      evs.filter($"event_type" === "purchase"))
      .select("purchase_id", "view_id")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 10L)))
  }
}
