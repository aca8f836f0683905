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

  test("sinkWithRefresh: the baseline moves at the refresh boundary, parity holds throughout") {
    implicit val sqlCtx = spark.sqlContext
    val corpusA = (1L to 40L).map(i =>
      (i, "spark table query join batch row", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val corpusB = (1L to 40L).map(i =>
      (i, "zz yy xx ww vv uu", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    // the "accumulated corpus": a mutable source, as a re-read parquet
    // path would be in the admission pipeline
    var source = corpusA

    val batch0 = Seq((100L, "spark table query join batch row", "a"))
    val drifted = Seq((200L, "zz yy xx ww vv uu", "a"))

    val input = MemoryStream[(Long, String, String)]
    val perBatch = mutable.Map.empty[Long, Map[String, Double]]
    val q = DriftMonitor.sinkWithRefresh(
      input.toDF().toDF("doc_id", "text", "source"),
      () => source, topN = 10, refreshEvery = 2,
      (drift, id) => perBatch.synchronized { perBatch(id) = scores(drift) })
      .start()
    try {
      input.addData(batch0) // id 0: refresh boundary -> profile(A)
      q.processAllAvailable()
      source = corpusB // the corpus shifts AFTER the batch-0 build
      input.addData(drifted) // id 1: still scored against profile(A)
      q.processAllAvailable()
      input.addData(drifted.map { case (i, t, s) => (i + 100, t, s) }) // id 2: rebuild -> profile(B)
      q.processAllAvailable()
    } finally q.stop()

    def vs(rows: Seq[(Long, String, String)], corpus: org.apache.spark.sql.DataFrame) =
      scores(TextAnalysis.driftVsProfile(
        rows.toDF("doc_id", "text", "source"),
        TextAnalysis.vocabProfile(corpus, topN = 10)))

    // batch 0: in-distribution vs A
    assert(perBatch(0L) == vs(batch0, corpusA))
    assert(perBatch(0L)("a") == 0.0)
    // batch 1: the corpus already shifted but the boundary hasn't passed
    // — scored against the STALE profile(A), the bounded-staleness window
    assert(perBatch(1L) == vs(drifted, corpusA))
    assert(perBatch(1L)("a") == 0.3466, "disjoint vocab vs the stale baseline")
    // batch 2: boundary passed — the same content scores 0 vs profile(B)
    assert(perBatch(2L) == vs(drifted, corpusB))
    assert(perBatch(2L)("a") == 0.0, "the refreshed baseline absorbs the shift")
  }

  test("alerts keeps only sources over threshold") {
    val drift = Seq(("a", 3L, 10L, 0.6), ("b", 5L, 12L, 0.01))
      .toDF("source", "n_vocab_hits", "src_total", "js_div")
    val hot = DriftMonitor.alerts(drift, 0.2).collect()
    assert(hot.map(_.getString(0)).toSeq == Seq("a"))
  }
}
