package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.extensions.TextAnalysis

/** Streaming distribution-drift monitor — the always-on counterpart of
  * [[TextAnalysis.sourceDrift]], watching a live document feed the way
  * the reference's exporter loop watches row counts
  * (metrics_exporter.py:99-151), but at the content level: each
  * micro-batch's per-source token distribution is scored against the
  * HISTORICAL corpus profile, so a feed whose content shifts (spam
  * burst, language flip, scraper breakage) raises its Jensen-Shannon
  * number within one batch of the shift.
  *
  * Shape: the (token, corpus_cnt) profile ([[TextAnalysis.vocabProfile]])
  * is computed once from the accumulated corpus and broadcast into every
  * micro-batch join; the batch side is one explode + one bounded
  * aggregation over |sources in batch| × topN rows. Per-batch cost is
  * proportional to the batch, never the corpus, and there are no
  * streaming-state operators — the divergence is computed inside
  * foreachBatch, which also makes the handoff idempotent under
  * micro-batch replay (same id ⇒ same scores).
  *
  * Parity contract: for any micro-batch B, the emitted frame equals
  * `TextAnalysis.driftVsProfile(B, profile)` — pinned in
  * DriftMonitorSpec (MemoryStream).
  */
object DriftMonitor {

  /** foreachBatch sink: per micro-batch, each source's JS divergence vs
    * the static profile, handed to `onBatch` with the micro-batch id.
    * Call `.start()` on the result. */
  def sink(
      newDocs: DataFrame,
      profile: DataFrame,
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(TextAnalysis.driftVsProfile(batch, profile), batchId)
      }

  /** Alarm filter over a drift frame: sources whose divergence crossed
    * `threshold` (JS is bounded by ln 2 ≈ 0.693; production thresholds
    * sit well below it). */
  def alerts(drift: DataFrame, threshold: Double): DataFrame =
    drift.filter(col("js_div") > threshold)
}
