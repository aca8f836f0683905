package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSpec, Tables}
import graft.extensions.LineDedup

/** MemoryStream proof of the admission-time line gate: with the
  * boilerplate set frozen from the corpus census, replaying that
  * corpus in micro-batches reproduces the static
  * [[LineDedup.dedupLines]] EXACTLY (the scrub is per-doc given the
  * set), and the running removal-mass report folds to the corpus
  * totals under any batch split. */
class StreamingLineGateSpec extends SparkSpec {
  import spark.implicits._

  test("replayed corpus under the frozen census equals static dedupLines; report folds exactly") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val frozen = StreamingLineGate.freezeBoilerplate(docs).localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = Seq(
      rows.filter(_._1 % 3 == 0).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq,
      rows.filter(_._1 % 3 == 2).toSeq)

    var report = StreamingLineGate.emptyReport(spark).localCheckpoint()
    val scrubbedBatches = mutable.ArrayBuffer.empty[DataFrame]
    val input = MemoryStream[(Long, String)]
    val q = StreamingLineGate.sink(
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
    assert(streamed == static, "scrub is the batch operator verbatim")

    val (nDocs, total, dropped) = report
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    val staticMass = LineDedup.dedupLines(docs)
      .selectExpr("count(1)", "sum(n_lines)", "sum(n_lines - n_kept)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert((nDocs, total, dropped) == staticMass)
    // the corpus genuinely exercises the gate: boilerplate was dropped
    assert(dropped > 0 && dropped < total)
  }

  test("batch not in the census freeze window: frozen set still applies, new dups invisible") {
    // two docs sharing a line that is NOT in the frozen set: kept —
    // the documented freshness trade of freezing on crawl cadence.
    val frozen = Seq("old boilerplate line x y z").toDF("line")
    val live = Seq(
      (1L, "old boilerplate line x y z fresh dup line a b c"),
      (2L, "fresh dup line a b c unique tail q r s"))
      .toDF("doc_id", "text")
    val out = StreamingLineGate.admitBatch(live, frozen)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, "fresh dup line a b c")),
      2L -> ((2L, 2L, "fresh dup line a b c unique tail q r s"))))
  }

  test("re-freeze alarm: a drifted template population reads ~zero drop under the stale census and recovers after re-freeze") {
    // old crawl: template T repeated across docs; new crawl: template U
    val oldCrawl = Seq(
      (1L, "cookie banner accept all now ok body one a b c"),
      (2L, "cookie banner accept all now ok body two d e f"))
      .toDF("doc_id", "text")
    val newCrawl = Seq(
      (3L, "subscribe to our newsletter today ok body three g h i"),
      (4L, "subscribe to our newsletter today ok body four j k l"))
      .toDF("doc_id", "text")
    val stale = StreamingLineGate.freezeBoilerplate(oldCrawl).localCheckpoint()
    def dropped(batch: org.apache.spark.sql.DataFrame,
        census: org.apache.spark.sql.DataFrame): Long =
      StreamingLineGate.admitBatch(batch, census)
        .selectExpr("sum(n_lines - n_kept)").head.getLong(0)
    // stale census still scrubs the old templates...
    assert(dropped(oldCrawl, stale) == 2L)
    // ...but reads ZERO on the drifted crawl — the frac_dropped → 0
    // alarm the scaladoc promises a pipeline watches for
    assert(dropped(newCrawl, stale) == 0L)
    // re-freeze on the new crawl restores the scrub
    val refrozen = StreamingLineGate.freezeBoilerplate(newCrawl).localCheckpoint()
    assert(dropped(newCrawl, refrozen) == 2L)
  }

  test("mergeReports: sums with an empty side") {
    val z = StreamingLineGate.emptyReport(spark)
    val a = Seq((3L, 10L, 4L)).toDF("n_docs", "total_lines", "dropped_lines")
    val m = StreamingLineGate.mergeReports(z, a)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(m == ((3L, 10L, 4L)))
  }
}
