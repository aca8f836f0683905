package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.merge.ScdMerge

/** Batch-incremental ingest driver — the reference's poller loop
  * (feeder_postgres.py:212-259 `run_once`/`loop`) as a library function.
  * [[graft.streaming.SnapshotStream]] is the always-on formulation; this
  * one is the scheduled-batch formulation the reference actually runs.
  *
  * Semantics replicated:
  *  - discover snapshot dirs matching `YYYY-MM-DD` (:213,226)
  *  - skip dirs at or below the state's high-water mark (:224,230-231)
  *  - process the rest in ascending date order (:226)
  *  - per snapshot: normalize → drop archived → late-guard → SCD merge
  *  - future-dated dirs are skipped (periodic_run.py:31-33)
  *
  * Only directory NAMES touch the driver (bounded by calendar days);
  * all row data stays distributed.
  */
object IngestJob {

  private val DatedDir = "^\\d{4}-\\d{2}-\\d{2}$".r

  /** List dated snapshot dirs under `root`, sorted ascending. */
  def discoverSnapshotDirs(root: String): Seq[String] = {
    val f = new java.io.File(root)
    Option(f.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(_.getName)
      .filter(DatedDir.matches(_))
      .sorted
      .toSeq
  }

  /** The state's high-water mark: greatest lifecycle date, 1970-01-01 for
    * an empty state (feeder_postgres.py:200-209 get_db_max_date).
    *
    * Reference quirk kept for parity: a snapshot that changes NOTHING
    * leaves every lifecycle date untouched, so the HWM does not advance
    * and the same dir is re-fed on the next poll. The merge is idempotent
    * (ScdMergeSpec), so this is wasteful but harmless — exactly the
    * reference's behavior. */
  def highWaterMark(state: DataFrame): String = {
    val row = state
      .agg(greatest(max("added_at"), max("updated_at"), max("removed_at")).as("hwm"))
      .head()
    if (row.isNullAt(0)) "1970-01-01" else row.getDate(0).toString
  }

  /** One poll cycle: applies every new snapshot in order, returns the new
    * state and the list of processed dates. */
  def runOnce(
      spark: SparkSession,
      root: String,
      state: DataFrame,
      keyCol: String,
      trackedCols: Seq[String],
      today: String,
      readSnapshot: String => DataFrame): (DataFrame, Seq[String]) = {
    val hwm = highWaterMark(state)
    val dates = discoverSnapshotDirs(root)
      .filter(_ > hwm)     // incremental skip (feeder_postgres.py:230-231)
      .filter(_ <= today)  // future-dated guard (periodic_run.py:31-33)
    val finalState = dates.foldLeft(state) { (st, date) =>
      val snap = ScdMerge.dropArchived(Normalize.normalizeSnapshot(
        readSnapshot(s"$root/$date")))
      ScdMerge.assertNotLate(st, snap, date, keyCol)
      // Materialize each merge generation and cut its lineage: without
      // this, assertNotLate's count() and the next applySnapshot both
      // re-execute the entire unmaterialized chain of prior full-outer
      // joins — O(n²) recompute and unbounded plan depth once more than
      // a handful of snapshots are pending. (SnapshotStream.mergeSink's
      // saveState achieves the same by write-and-reload.)
      ScdMerge.applySnapshot(st, snap, date, keyCol, trackedCols)
        .localCheckpoint()
    }
    (finalState, dates)
  }
}
