package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-level so Spark can derive an Encoder without an outer scope. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

/** [[Ev]] plus the value column the sessionize aggregate sums. */
case class EvV(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

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

  test("sessionize: gap merges within, splits across; closed sessions emit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvV]
    val out = EventStreams.sessionize(input.toDF())
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      input.addData(
        EvV(1L, ts("2021-01-01 10:00:00"), 1L, "view", 1.0),
        EvV(2L, ts("2021-01-01 10:10:00"), 1L, "view", 2.0), // same session
        EvV(3L, ts("2021-01-01 11:30:00"), 1L, "view", 4.0), // gap > 30m: new
        EvV(4L, ts("2021-01-01 10:05:00"), 2L, "view", 8.0))
      q.processAllAvailable()
      // advance the watermark far past every session close
      input.addData(EvV(99L, ts("2021-01-01 13:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select(col("user_id"),
          date_format(col("session_start"), "HH:mm").as("s"),
          date_format(col("session_end"), "HH:mm").as("e"),
          col("n_events"), col("session_value"))
        .as[(Long, String, String, Long, Double)].collect().toSet
      // session end = last event + gap (session_window semantics)
      assert(rows == Set(
        (1L, "10:00", "10:40", 2L, 3.0),
        (1L, "11:30", "12:00", 1L, 4.0),
        (2L, "10:05", "10:35", 1L, 8.0)))
    } finally q.stop()
  }

  test("sessionize batch twin: same operator over a static frame agrees") {
    val evs = Seq(
      EvV(1L, ts("2021-01-01 10:00:00"), 1L, "view", 1.0),
      EvV(2L, ts("2021-01-01 10:10:00"), 1L, "view", 2.0),
      EvV(3L, ts("2021-01-01 11:30:00"), 1L, "view", 4.0),
      EvV(4L, ts("2021-01-01 10:05:00"), 2L, "view", 8.0)).toDF()
    val rows = EventStreams.sessionize(evs)
      .select(col("user_id"),
        date_format(col("session_start"), "HH:mm").as("s"),
        date_format(col("session_end"), "HH:mm").as("e"),
        col("n_events"), col("session_value"))
      .as[(Long, String, String, Long, Double)].collect().toSet
    // identical sessions to the streaming run (no open-session holdback
    // in batch: everything is final)
    assert(rows == Set(
      (1L, "10:00", "10:40", 2L, 3.0),
      (1L, "11:30", "12:00", 1L, 4.0),
      (2L, "10:05", "10:35", 1L, 8.0)))
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
