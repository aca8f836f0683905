package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}
import graft.extensions.LineDedup

/** The Bloom regime of the admission-time line gate
  * ([[StreamingLineGate.freezeBoilerplateBloom]] /
  * [[StreamingLineGate.admitBatchBloom]] / [[StreamingLineGate.sinkBloom]])
  * — the streaming twin of [[LineDedup.dedupLinesBloom]]: with the
  * bitset frozen from the corpus census at exactness sizing, replaying
  * that corpus in micro-batches reproduces the static exact path
  * EXACTLY; an undersized freeze only ever drops MORE than the exact
  * gate (the FP direction is the batch contract verbatim, held per
  * batch); an empty reference census admits everything; and the
  * per-batch plan is the scan-side probe, never an anti-join. */
class StreamingLineGateBloomSpec extends SparkSpec {
  import spark.implicits._

  test("replayed corpus under the frozen bitset equals static dedupLines; report folds exactly") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val frozen = StreamingLineGate.freezeBoilerplateBloom(docs)
    assert(frozen.nonEmpty, "the corpus census must have dup lines")
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = Seq(
      rows.filter(_._1 % 3 == 0).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq,
      rows.filter(_._1 % 3 == 2).toSeq)

    var report = StreamingLineGate.emptyReport(spark).localCheckpoint()
    val scrubbedBatches = mutable.ArrayBuffer.empty[DataFrame]
    val input = MemoryStream[(Long, String)]
    val q = StreamingLineGate.sinkBloom(
      report, frozen,
      input.toDF().toDF("doc_id", "text"),
      onBatch = (scrubbed, merged, _) => {
        report = merged.localCheckpoint()
        scrubbedBatches.synchronized { scrubbedBatches += scrubbed }
      })
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = scrubbedBatches.reduce(_ unionByName _)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val static = LineDedup.dedupLines(docs)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == static,
      "sized-for-exactness probe is the exact batch operator verbatim")

    val (nDocs, total, dropped) = report
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    val staticMass = LineDedup.dedupLines(docs)
      .selectExpr("count(1)", "sum(n_lines)", "sum(n_lines - n_kept)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert((nDocs, total, dropped) == staticMass)
    assert(dropped > 0 && dropped < total)
  }

  test("FP contract held at admission: an undersized freeze only drops MORE than the exact gate, never resurrects") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // capacity 1 at fpp 0.5 (the LineDedupBloomSpec forcing sizes):
    // false positives all but guaranteed across the corpus slice
    val undersized = StreamingLineGate.freezeBoilerplateBloom(
      docs, expectedDupLines = 1L, fpp = 0.5)
    val exactSet = StreamingLineGate.freezeBoilerplate(docs).localCheckpoint()
    val exact = StreamingLineGate.admitBatch(docs, exactSet)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val bloom = StreamingLineGate.admitBatchBloom(docs, undersized)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(bloom.keySet == exact.keySet, "per-doc rows never vanish")
    var extraDrops = 0L
    bloom.foreach { case (id, (nl, nk, text)) =>
      val (enl, enk, etext) = exact(id)
      assert(nl == enl, s"doc $id: n_lines is census-independent")
      assert(nk <= enk, s"doc $id: FPs may only drop more lines")
      extraDrops += enk - nk
      val kept = text.split(" ").filter(_.nonEmpty)
      val sup = etext.split(" ").filter(_.nonEmpty).iterator
      assert(kept.forall(t => sup.contains(t)),
        s"doc $id: bloom kept text must be a subsequence of exact kept text")
    }
    assert(extraDrops > 0,
      "the undersized filter must actually fire (else the test is vacuous)")
  }

  test("empty reference census: freeze is None, admission keeps every line") {
    val uniqueRef = Seq(
      (1L, "a b c d e f"), (2L, "g h i j k l")).toDF("doc_id", "text")
    assert(StreamingLineGate.freezeBoilerplateBloom(uniqueRef).isEmpty)
    val live = Seq((7L, "m n o p q r"), (8L, "")).toDF("doc_id", "text")
    val out = StreamingLineGate.admitBatchBloom(live, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq.sortBy(_._1)
    assert(out == Seq(
      (7L, 1L, 1L, "m n o p q r"),
      (8L, 0L, 0L, "")))
  }

  test("per-batch plan shape: scan-side probe, no anti-join for the frozen set") {
    val ref = Seq(
      (1L, "shared line a b c tail one x y"),
      (2L, "shared line a b c tail two z w")).toDF("doc_id", "text")
    val frozen = StreamingLineGate.freezeBoilerplateBloom(ref, lineLen = 3)
    assert(frozen.nonEmpty)
    val batch = Seq((9L, "shared line a fresh tail q r s")).toDF("doc_id", "text")
    val df = StreamingLineGate.admitBatchBloom(batch, frozen, lineLen = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_probe"),
      s"scrub must ride the codegen'd BloomProbe filter:\n$plan")
    assert(!plan.contains("LeftAnti"),
      s"the frozen set must never materialize as a join side:\n$plan")
  }
}
