package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.extensions.Packing

/** MemoryStream proof of the streaming right-to-be-forgotten story:
  * after any stream of delete batches appended to the tombstone log,
  * [[StreamingDeletes.view]] equals the one-shot batch
  * [[Packing.applyDeletes]] of the unioned delete set, which is itself
  * spec-pinned ≡ packing the filtered corpus — and replayed
  * (duplicate) tombstones change nothing. */
class StreamingDeletesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("tombstone-log view ≡ batch applyDeletes after two delete batches; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val budget = 64
    val base = Packing.packChunks(docs, budget).localCheckpoint()

    val delBatch1 = base.filter(col("doc_id") % 37 === 0)
      .select("doc_id").as[Long].collect().toSeq
    val delBatch2 = base.filter(col("doc_id") % 41 === 0)
      .select("doc_id").as[Long].collect().toSeq

    var log: DataFrame = spark.emptyDataset[(Long, Long)]
      .toDF("doc_id", "batch_id")
    val input = MemoryStream[Long]
    val q = StreamingDeletes.sink(
      input.toDF().toDF("doc_id"),
      (stamped, _) => log = log.unionByName(stamped).localCheckpoint())
      .start()
    try {
      input.addData(delBatch1); q.processAllAvailable()
      // mid-stream check: view reflects exactly the first batch
      assert(rows(StreamingDeletes.view(base, log, budget)) ==
        rows(Packing.applyDeletes(base, delBatch1.toDF("doc_id"), budget)))
      input.addData(delBatch2); q.processAllAvailable()
    } finally q.stop()

    val allDeletes = (delBatch1 ++ delBatch2).toDF("doc_id")
    val streamed = StreamingDeletes.view(base, log, budget)
    assert(rows(streamed) == rows(Packing.applyDeletes(base, allDeletes, budget)))

    // replay: append batch 1's tombstones AGAIN — set semantics make
    // the duplicate delivery invisible in the resolved manifest
    val replayed = log.unionByName(
      delBatch1.toDF("doc_id").withColumn("batch_id", lit(99L)))
    assert(rows(StreamingDeletes.view(base, replayed, budget)) == rows(streamed))

    // and the tombstoned docs are actually gone
    assert(streamed.join(allDeletes, "doc_id").count() == 0)
  }

  test("tombstone compaction is transparent: fold batch 1, continue with batch 2") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val budget = 64
    val base = Packing.packChunks(docs, budget).localCheckpoint()
    val delA = base.filter(col("doc_id") % 37 === 0).select("doc_id")
    val delB = base.filter(col("doc_id") % 41 === 0).select("doc_id")

    // fold A into the base (the background compaction job), truncate
    // the log, continue the stream with B alone
    val compacted = StreamingDeletes.compact(base, delA, budget)
      .localCheckpoint()
    val afterBoth = StreamingDeletes.view(compacted, delB, budget)
    // ≡ the uncompacted path with the full log
    assert(rows(afterBoth) ==
      rows(StreamingDeletes.view(base, delA.unionByName(delB), budget)))

    // idempotence: compacting with no tombstones is the identity
    val none = Seq.empty[Long].toDF("doc_id")
    assert(rows(StreamingDeletes.compact(compacted, none, budget)) ==
      rows(compacted))

    // a tombstone REPLAYED across the compaction boundary (doc already
    // folded away) is a no-op — the property that lets the log
    // truncate without any replay coordination
    assert(rows(StreamingDeletes.view(compacted, delA.unionByName(delB), budget))
      == rows(afterBoth))
  }
}
