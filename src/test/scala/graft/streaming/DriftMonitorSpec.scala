package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.extensions.TextAnalysis

/** MemoryStream proof of the live drift monitor: each micro-batch's
  * emitted frame equals the batch [[TextAnalysis.driftVsProfile]] on the
  * same documents against the same profile, and a content shift raises
  * the divergence within the batch that carries it. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def scores(df: DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("per-batch drift equals the batch driftVsProfile; shifts alarm in-batch") {
    implicit val sqlCtx = spark.sqlContext
    // historical corpus: two sources, shared vocabulary
    val corpus = (1L to 40L).map(i =>
      (i, "spark table query join batch row", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val profile = TextAnalysis.vocabProfile(corpus, topN = 10).localCheckpoint()

    // batch 1 looks like the corpus; batch 2's source "a" flips content
    val batch1 = Seq((100L, "spark table query join batch row", "a"),
      (101L, "spark table query join batch row", "b"))
    val batch2 = Seq((200L, "zz yy xx ww vv uu", "a"),
      (201L, "spark table query join batch row", "b"))

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "source")

    val perBatch = mutable.Map.empty[Long, Map[String, Double]]
    val q = DriftMonitor.sink(docs, profile,
      (drift, id) => perBatch.synchronized { perBatch(id) = scores(drift) })
      .start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    def expected(rows: Seq[(Long, String, String)]): Map[String, Double] =
      scores(TextAnalysis.driftVsProfile(
        rows.toDF("doc_id", "text", "source"), profile))

    assert(perBatch(0L) == expected(batch1), "batch 0: stream ≡ batch")
    assert(perBatch(1L) == expected(batch2), "batch 1: stream ≡ batch")
    assert(perBatch(0L)("a") == 0.0, "in-distribution batch scores 0")
    // a zero-overlap source is the zero measure: only the corpus-side
    // term contributes, analytically ln(2)/2 ≈ 0.3466
    assert(perBatch(1L)("a") == 0.3466,
      "disjoint-vocab batch must score the analytic ln(2)/2")
    assert(perBatch(1L)("b") == 0.0, "the healthy source stays quiet")
  }

  test("alerts keeps only sources over threshold") {
    val drift = Seq(("a", 3L, 10L, 0.6), ("b", 5L, 12L, 0.01))
      .toDF("source", "n_vocab_hits", "src_total", "js_div")
    val hot = DriftMonitor.alerts(drift, 0.2).collect()
    assert(hot.map(_.getString(0)).toSeq == Seq("a"))
  }
}
