package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.extensions.Postings

/** Always-current inverted index — the streaming twin of
  * [[graft.extensions.Postings]], in the LSM shape real index services
  * use: every micro-batch computes its [[Postings.appendDelta]] upsert
  * rows against the CURRENT view and APPENDS them (stamped with the
  * batch id) to a delta log; readers resolve latest-row-per-term over
  * base ∪ log; compaction periodically folds the log back into the
  * base (the [[graft.plans.Layout.compactBucketed]] job) to restore
  * flat-read probe cost. Writes never rewrite the index — the log
  * append is the only write, sized by the batch's term set.
  *
  * Exactly-once under replay: the delta is computed against the view
  * RESTRICTED to batch_id < current (so a redelivered batch sees the
  * same pre-batch state it saw the first time and produces identical
  * rows), and the caller persists each delta keyed by its batchId
  * (overwrite-by-id, the [[StreamingSketch]] discipline) so the
  * re-append replaces rather than duplicates.
  *
  * Parity contract (StreamingPostingsSpec): after any stream of
  * batches, `view(base, log)` ≡ `Postings.build` over the concatenated
  * corpus — bit-identical rows, cap transitions included. */
object StreamingPostings {

  /** Resolve the current index: latest row per term across the base
    * (batch −1) and the delta log (each row stamped `batch_id`). One
    * term-keyed shuffle over base+log; the log's size between
    * compactions — not the corpus — is the read amplification. */
  def view(base: DataFrame, log: DataFrame): DataFrame = {
    val all = base.withColumn("batch_id", lit(-1L))
      .unionByName(log)
    val w = Window.partitionBy("term").orderBy(desc("batch_id"))
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "batch_id")
  }

  /** COMPACTION — the promised LSM lever: fold the delta log into a
    * new base (batch −1), restoring flat-read probe cost. The new base
    * is the resolved view itself, so the defining identity
    * `view(compact(b, l), emptyLog) ≡ view(b, l)` is exact
    * (spec-pinned bitwise), and compaction is TRANSPARENT mid-stream:
    * a delta computed against the compacted base equals one computed
    * against the uncompacted view, so the log can be truncated and the
    * stream continued with no rewind (q_postings_compact drives the
    * full compact-mid-stream chain against the flat-rebuild oracle).
    *
    * Cost: one term-keyed shuffle over base ∪ log — ∝ index size, the
    * periodic background job, after which the per-probe read
    * amplification drops from (1 + log segments) back to 1 until the
    * log grows again (priced in the scale bench: postings_view_probe
    * before vs postings_compacted_probe after, against log length).
    * The physical write-back of the new base is
    * [[graft.plans.Layout.compactBucketed]] — the same atomic-swap
    * bucketed rewrite every on-disk index in this repo uses. */
  def compact(base: DataFrame, log: DataFrame): DataFrame = view(base, log)

  /** The post-compaction log: zero rows, same schema — what the sink
    * keeps appending to after [[compact]] truncates. */
  def emptyLog(base: DataFrame): DataFrame =
    base.withColumn("batch_id", lit(-1L)).limit(0)

  /** foreachBatch sink maintaining the delta log: each batch's upsert
    * rows (vs the pre-batch view) are handed to `onBatch` stamped with
    * the batch id; the caller persists them keyed by that id. `log` is
    * by-name so each batch re-reads the caller-persisted current log —
    * the stream-static shape every streaming index in this repo uses. */
  def sink(
      base: DataFrame,
      log: => DataFrame,
      arriving: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      n: Int = 3, maxDf: Int = 6): DataStreamWriter[Row] =
    arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val cur = view(base, log.filter(col("batch_id") < batchId))
        val delta = Postings
          .appendDelta(cur, batch.localCheckpoint(), n, maxDf)
          .withColumn("batch_id", lit(batchId))
        onBatch(delta, batchId)
      }

  /** [[sink]] with the compaction POLICY inside the sink (r12 VERDICT
    * #2): after each batch's delta is appended, the log's segment and
    * row counts are checked against `policy`, and on trigger the sink
    * folds every EARLIER batch (`batch_id < current`) into a new base
    * and hands it to `onCompact(newBase, keepFromBatchId)` — the caller
    * replaces the base and truncates the log to
    * `batch_id >= keepFromBatchId`.
    *
    * Folding strictly-earlier batches only (never the one just
    * appended) is what keeps exactly-once across the trigger boundary:
    * a redelivered batch b recomputes its delta against
    * `view(base', log < b)`, and by the compaction identity that view
    * is unchanged whether the < b batches live in the log or were
    * folded into base' — so the replayed delta is bit-identical and the
    * overwrite-by-id persist stays a no-op (spec-pinned in
    * StreamingCompactionSpec, alongside auto-compacted ≡ never-compacted
    * ≡ flat batch rebuild).
    *
    * `base` is by-name so post-compaction batches see the
    * caller-persisted NEW base, exactly as `log` already re-reads the
    * caller-persisted log. Policy evaluation costs one count over the
    * log (∝ log, the thing being bounded) plus one over the base only
    * when the ratio lever is enabled. */
  def sinkCompacting(
      base: => DataFrame,
      log: => DataFrame,
      arriving: DataFrame,
      onDelta: (DataFrame, Long) => Unit,
      onCompact: (DataFrame, Long) => Unit,
      policy: CompactionPolicy = CompactionPolicy(),
      n: Int = 3, maxDf: Int = 6): DataStreamWriter[Row] =
    arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val curBase = base
        val delta = Postings
          .appendDelta(view(curBase, log.filter(col("batch_id") < batchId)),
            batch.localCheckpoint(), n, maxDf)
          .withColumn("batch_id", lit(batchId))
        onDelta(delta, batchId)
        val postLog = log // re-read: now includes this batch's delta
        val (segs, rows) = {
          val r = postLog.agg(
            countDistinct(col("batch_id")), count(lit(1))).head()
          (r.getLong(0), r.getLong(1))
        }
        val baseRows =
          if (policy.maxLogToBaseRatio > 0) curBase.count() else 0L
        if (policy.shouldCompact(segs, rows, baseRows)) {
          val newBase =
            compact(curBase, postLog.filter(col("batch_id") < batchId))
          onCompact(newBase, batchId)
        }
      }
}
