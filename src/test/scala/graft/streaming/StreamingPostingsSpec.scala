package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Postings

/** MemoryStream proof of the LSM index-maintenance story: after any
  * stream of batches, [[StreamingPostings.view]] over base ∪ delta-log
  * is BIT-IDENTICAL to a [[Postings.build]] rebuild on the
  * concatenated corpus — merges, brand-new terms, and cap transitions
  * included — and replaying a batch under its own id (the
  * exactly-once overwrite discipline) changes nothing. */
class StreamingPostingsSpec extends SparkSpec {
  import spark.implicits._

  // maxDf = 2 so the stream itself drives a term over the cap:
  // "a b c" reaches df 3 in batch 2 and must flip to NULL postings
  private val maxDf = 2
  private val batches = Seq(
    Seq((1L, "a b c"), (2L, "a b c"), (10L, "p q r")),
    Seq((3L, "a b c"), (11L, "p q r"), (12L, "x y z")))

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def canon(df: DataFrame) = df.collect()
    .map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) null else r.getString(4)))
    .sortBy(_._1).toSeq

  test("streamed delta-log view equals the batch rebuild; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val arriving = mem.toDF().toDF("doc_id", "text")

    val base = Postings.build(docs(Seq.empty), maxDf = maxDf)
      .localCheckpoint()
    val emptyLog = base.withColumn("batch_id", lit(0L)).limit(0)
      .localCheckpoint()
    var log = emptyLog
    var deltas = Map.empty[Long, DataFrame] // persisted keyed by batchId

    val q = StreamingPostings.sink(base, log, arriving,
        onBatch = (delta, id) => {
          // overwrite-by-id persist: replace this id's rows, keep others
          deltas = deltas + (id -> delta.localCheckpoint())
          log = deltas.values.reduce(_ unionByName _).localCheckpoint()
        },
        maxDf = maxDf)
      .start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = StreamingPostings.view(base, log)
    val rebuilt = Postings.build(docs(batches.flatten), maxDf = maxDf)
    assert(canon(streamed) == canon(rebuilt))
    // the stream actually exercised a cap transition: "a b c" was
    // under-cap after batch 1 (df 2) and capped after batch 2 (df 3)
    val b1 = deltas(0L).filter(col("term") === "a b c").head()
    val b2 = deltas(1L).filter(col("term") === "a b c").head()
    assert(b1.getLong(1) == 2L && !b1.isNullAt(4))
    assert(b2.getLong(1) == 3L && b2.isNullAt(4))

    // replay batch 1 against the same pre-batch state (view with
    // batch_id < 1): identical delta rows ⇒ overwrite-by-id is a no-op
    val replayed = Postings.appendDelta(
      StreamingPostings.view(base, log.filter(col("batch_id") < 1L)),
      docs(batches(1)), maxDf = maxDf)
    assert(canon(replayed) ==
      canon(deltas(1L).drop("batch_id")))
    // and the view still resolves after the (idempotent) re-append
    val logReplayed = log.unionByName(
      replayed.withColumn("batch_id", lit(1L)))
    // latest-per-term over duplicate identical rows is unchanged
    assert(canon(StreamingPostings.view(base, logReplayed)) == canon(rebuilt))
  }

  test("compact folds the log into the base: view-identity, idempotence, mid-stream transparency") {
    val base = Postings.build(docs(batches(0)), maxDf = maxDf)
      .localCheckpoint()
    val log = Postings.appendDelta(base, docs(batches(1)), maxDf = maxDf)
      .withColumn("batch_id", lit(0L)).localCheckpoint()

    // the defining identity: view(compact(b,l), empty) ≡ view(b,l)
    val compacted = StreamingPostings.compact(base, log).localCheckpoint()
    val empty = StreamingPostings.emptyLog(compacted)
    assert(canon(StreamingPostings.view(compacted, empty)) ==
      canon(StreamingPostings.view(base, log)))
    // idempotence: compacting an already-compacted index is a no-op
    assert(canon(StreamingPostings.compact(compacted, empty)) ==
      canon(compacted))

    // mid-stream transparency: a NEW batch's delta is identical
    // whether computed against the compacted base or the live view —
    // the license to compact under a running stream with no rewind
    val b2 = Seq((20L, "a b c"), (21L, "m n o"))
    val viaView = Postings.appendDelta(
      StreamingPostings.view(base, log), docs(b2), maxDf = maxDf)
    val viaCompacted = Postings.appendDelta(compacted, docs(b2), maxDf = maxDf)
    assert(canon(viaCompacted) == canon(viaView))
    // and both continuations resolve to the flat rebuild on everything
    val log1 = viaCompacted.withColumn("batch_id", lit(1L))
    assert(canon(StreamingPostings.view(compacted, log1)) ==
      canon(Postings.build(docs(batches.flatten ++ b2), maxDf = maxDf)))
  }
}
