package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.extensions.QualityRules

/** MemoryStream proof of the admission-time Gopher gate: replaying the
  * corpus in micro-batches and summing per-batch reports reproduces
  * the whole-corpus [[QualityRules.gopherReport]] EXACTLY (per-doc
  * independent sums are additive under any batch split), and the
  * per-batch flags are the batch operator verbatim. */
class StreamingGopherGateSpec extends SparkSpec {
  import spark.implicits._

  private def reportMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("replayed corpus: running report equals the batch gopherReport; flags union equals gopherFlags") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = Seq(
      rows.filter(_._1 % 3 == 0).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq,
      rows.filter(_._1 % 3 == 2).toSeq)

    var report = StreamingGopherGate.emptyReport(spark).localCheckpoint()
    val flagBatches = mutable.ArrayBuffer.empty[DataFrame]
    val input = MemoryStream[(Long, String)]
    val q = StreamingGopherGate.sink(
      report,
      input.toDF().toDF("doc_id", "text"),
      onBatch = (flags, merged, _) => {
        report = merged.localCheckpoint()
        flagBatches.synchronized { flagBatches += flags.localCheckpoint() }
      })
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(reportMap(report) == reportMap(QualityRules.gopherReport(docs)))
    val streamed = flagBatches.reduce(_ unionByName _)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val batch = QualityRules.gopherFlags(docs)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == batch, "flags are the batch operator verbatim")
    // the corpus genuinely exercises the gate both ways
    assert(reportMap(report)("pass") > 0)
    assert(reportMap(report).exists { case (r, n) => r != "pass" && n > 0 })
  }

  test("mergeReports: per-rule sums, absent rules kept") {
    val a = Seq(("r_word_count", 3L), ("pass", 5L)).toDF("rule", "n_docs")
    val b = Seq(("r_word_count", 2L), ("r_stopword", 1L)).toDF("rule", "n_docs")
    val m = reportMap(StreamingGopherGate.mergeReports(a, b))
    assert(m == Map("r_word_count" -> 5L, "pass" -> 5L, "r_stopword" -> 1L))
  }
}
