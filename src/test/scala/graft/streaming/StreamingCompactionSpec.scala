package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.extensions.{Packing, Postings}

/** The r12 gap between "compaction exists" and "compaction RUNS":
  * [[StreamingPostings.sinkCompacting]] / [[StreamingDeletes
  * .sinkCompacting]] enforce a [[CompactionPolicy]] inside the sink, and
  * this spec pins transparency ACROSS the automatic trigger — a stream
  * with auto-compaction ≡ the same stream without ≡ the one-shot batch
  * build — plus the boundary replay property each sink's fold rule
  * (strictly-earlier batches for postings, everything for deletes) was
  * chosen to preserve. */
class StreamingCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val maxDf = 2
  private val batches = Seq(
    Seq((1L, "a b c"), (2L, "a b c"), (10L, "p q r")),
    Seq((3L, "a b c"), (11L, "p q r"), (12L, "x y z")),
    Seq((4L, "m n o"), (13L, "x y z")),
    Seq((5L, "m n o"), (14L, "p q r"), (15L, "j k l")))

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def canon(df: DataFrame) = df.collect()
    .map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) null else r.getString(4)))
    .sortBy(_._1).toSeq

  test("policy unit: either lever triggers; disabled levers never do") {
    val p = CompactionPolicy(maxLogBatches = 3, maxLogToBaseRatio = 0.5)
    assert(!p.shouldCompact(logBatches = 2, logRows = 10, baseRows = 100))
    assert(p.shouldCompact(logBatches = 3, logRows = 10, baseRows = 100))
    assert(p.shouldCompact(logBatches = 1, logRows = 50, baseRows = 100))
    val batchesOnly = CompactionPolicy(maxLogBatches = 3, maxLogToBaseRatio = 0)
    assert(!batchesOnly.shouldCompact(1, 1000000, 1))
    val ratioOnly = CompactionPolicy(maxLogBatches = 0, maxLogToBaseRatio = 0.5)
    assert(!ratioOnly.shouldCompact(1000, 10, 100))
    // empty base never ratio-triggers (nothing to amortize against)
    assert(!CompactionPolicy(0, 0.5).shouldCompact(9, 9, 0))
  }

  test("postings: auto-compacted stream ≡ plain stream ≡ flat rebuild; log stays bounded; boundary replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext

    val empty = Postings.build(docs(Seq.empty), maxDf = maxDf)
    def emptyLogDf = empty.withColumn("batch_id", lit(0L)).limit(0)

    // -- auto-compacting run: maxLogBatches = 2 fires on every batch
    //    after the first (append makes 2 segments, fold leaves 1)
    var base = empty.localCheckpoint()
    var deltas = Map.empty[Long, DataFrame]
    def logDf: DataFrame =
      if (deltas.isEmpty) emptyLogDf
      else deltas.values.reduce(_ unionByName _)
    var compactions = Vector.empty[Long]
    var maxSegsSeen = 0

    val mem = MemoryStream[(Long, String)]
    val q = StreamingPostings.sinkCompacting(
        base = base, log = logDf,
        arriving = mem.toDF().toDF("doc_id", "text"),
        onDelta = (delta, id) => {
          deltas = deltas + (id -> delta.localCheckpoint())
          maxSegsSeen = math.max(maxSegsSeen, deltas.size)
        },
        onCompact = (newBase, keepFrom) => {
          base = newBase.localCheckpoint() // checkpoint BEFORE truncating
          deltas = deltas.filter { case (id, _) => id >= keepFrom }
          compactions :+= keepFrom
        },
        policy = CompactionPolicy(maxLogBatches = 2, maxLogToBaseRatio = 0),
        maxDf = maxDf)
      .start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()

    // the policy actually ran: batches 1, 2, 3 each tipped the log to
    // 2 segments and folded the strictly-earlier one
    assert(compactions == Vector(1L, 2L, 3L))
    assert(maxSegsSeen <= 2) // the bound the policy exists to enforce
    assert(deltas.keySet == Set(3L)) // only the newest batch survives

    // -- plain (never-compacted) run over the same batches
    val plainBase = empty.localCheckpoint()
    var plainDeltas = Map.empty[Long, DataFrame]
    def plainLog: DataFrame =
      if (plainDeltas.isEmpty) emptyLogDf
      else plainDeltas.values.reduce(_ unionByName _)
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingPostings.sink(plainBase, plainLog,
        mem2.toDF().toDF("doc_id", "text"),
        onBatch = (d, id) => plainDeltas += (id -> d.localCheckpoint()),
        maxDf = maxDf)
      .start()
    try batches.foreach { b => mem2.addData(b); q2.processAllAvailable() }
    finally q2.stop()

    val auto = StreamingPostings.view(base, logDf)
    val plain = StreamingPostings.view(plainBase, plainLog)
    val rebuilt = Postings.build(docs(batches.flatten), maxDf = maxDf)
    assert(canon(auto) == canon(plain))
    assert(canon(auto) == canon(rebuilt))

    // boundary replay: the last batch (id 3) redelivered AFTER the
    // trigger recomputes its delta against view(base', log < 3) — the
    // < 3 batches now live inside base', and the delta must still be
    // bit-identical so overwrite-by-id stays a no-op
    val replayed = Postings.appendDelta(
      StreamingPostings.view(base, logDf.filter(col("batch_id") < 3L)),
      docs(batches(3)), maxDf = maxDf)
    assert(canon(replayed) == canon(deltas(3L).drop("batch_id")))
  }

  test("deletes: ratio lever auto-compacts; view ≡ batch applyDeletes; log truncates; cross-boundary replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val docsT = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val budget = 64
    val base0 = Packing.packChunks(docsT, budget).localCheckpoint()

    val delBatch1 = base0.filter(col("doc_id") % 37 === 0)
      .select("doc_id").as[Long].collect().toSeq
    val delBatch2 = base0.filter(col("doc_id") % 41 === 0)
      .select("doc_id").as[Long].collect().toSeq

    var base = base0
    var log: DataFrame = spark.emptyDataset[(Long, Long)]
      .toDF("doc_id", "batch_id").localCheckpoint()
    def emptyLog = log.limit(0).localCheckpoint()
    var compactions = 0

    // the RATIO lever, genuinely: batch-count disabled (0), trigger
    // when tombstones reach 1% of manifest rows — each % 37 / % 41
    // batch tombstones ~2.4-2.7% of the manifest, so every batch tips
    // the ratio and folds the whole log
    val input = MemoryStream[Long]
    val q = StreamingDeletes.sinkCompacting(
        base = base, log = log,
        arrivingDeletes = input.toDF().toDF("doc_id"),
        budget = budget,
        onTombstones = (stamped, _) =>
          log = log.unionByName(stamped).localCheckpoint(),
        onCompact = (newBase, _) => {
          base = newBase.localCheckpoint()
          log = emptyLog
          compactions += 1
        },
        policy = CompactionPolicy(maxLogBatches = 0, maxLogToBaseRatio = 0.01))
      .start()
    try {
      input.addData(delBatch1); q.processAllAvailable()
      input.addData(delBatch2); q.processAllAvailable()
    } finally q.stop()

    assert(compactions == 2)
    assert(log.count() == 0) // fully folded — readers pay zero log

    val allDeletes = (delBatch1 ++ delBatch2).toDF("doc_id")
    def rows(df: DataFrame) = df.collect().map(_.toString).toSet
    assert(rows(base) == rows(Packing.applyDeletes(base0, allDeletes, budget)))
    assert(base.join(allDeletes, "doc_id").count() == 0)

    // cross-boundary replay: batch 1's tombstones re-arrive after both
    // folds — every doc is already gone, so the view is unchanged
    val replayLog = delBatch1.toDF("doc_id").withColumn("batch_id", lit(9L))
    assert(rows(StreamingDeletes.view(base, replayLog, budget)) == rows(base))
  }
}
