package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Always-on event-stream operators over the `events` shape
  * (event_id, ts, user_id, event_type, value) — the streaming
  * counterparts of the batch sessionize/as-of operators. The reference's
  * weekly cadence never needed these, but any events table feeding the
  * same analytics does the moment it goes continuous.
  *
  * State-boundedness at 100 TB/day rates:
  *  - [[dedupWithinWatermark]] keeps one key per event inside the
  *    watermark horizon only — state is O(events per horizon), dropped
  *    as the watermark advances (vs dropDuplicates' unbounded state).
  *  - [[viewToPurchase]] keeps both sides' state bounded by the join
  *    interval + watermark; Spark evicts rows whose match window closed.
  */
object EventStreams {

  /** At-least-once delivery → effectively-once processing: drops redelivered
    * event_ids arriving within `horizon` of the original. The id column
    * plus the event-time column BOTH key the dedup, so state for an id is
    * freed once its watermark passes — the only dedup formulation whose
    * state does not grow with the stream's lifetime. */
  def dedupWithinWatermark(
      events: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the same
    * user's views in the preceding `lookback` — the streaming as-of
    * analogue (batch: [[graft.operators.AsOfJoin]]). Both sides carry
    * watermarks so Spark can evict view state whose join interval can no
    * longer match any future purchase. */
  def viewToPurchase(
      views: DataFrame,
      purchases: DataFrame,
      lookback: String = "1 hour",
      horizon: String = "10 minutes"): DataFrame = {
    val v = views.select(
        col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", horizon)
    val p = purchases.select(
        col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", horizon)
    val cond: Column = col("v_user") === col("p_user") &&
      col("v_ts") <= col("p_ts") &&
      col("v_ts") >= col("p_ts") - expr(s"INTERVAL $lookback")
    p.join(v, cond, "inner")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Streaming sessionization: the continuous counterpart of the batch
    * q_sessionize (gap > `gap` starts a new session per user), built on
    * `session_window` — Spark merges overlapping [ts, ts+gap) windows in
    * the state store and emits a session once the watermark passes its
    * close. State per user is bounded by open sessions inside the
    * watermark horizon, evicted on emit — the formulation that survives
    * an unbounded stream. Works identically in a batch groupBy (same
    * function, no state) — EventStreamsSpec pins stream/batch parity. */
  def sessionize(
      events: DataFrame,
      gap: String = "30 minutes",
      horizon: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
}
