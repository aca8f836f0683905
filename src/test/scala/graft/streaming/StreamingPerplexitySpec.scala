package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.extensions.DataSelection

/** MemoryStream proof of the streaming reference-LM scorer: every
  * micro-batch's frame equals the batch scorer on the same rows against
  * the same frozen LM, the union over batches equals one batch pass
  * over all rows (the frozen yardstick makes parity EXACT, not
  * boundary-dependent), and the batch-sliced replay of a row scores
  * identically wherever it lands. */
class StreamingPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Map[Long, (Long, Option[Double])] =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

  // the reference corpus (all rows are reference here: ids ≡ 0 mod 5)
  private def reference: DataFrame = Seq(
    (0L, "the cat sat on the mat", "en"),
    (5L, "the cat sat on the mat again", "en"),
    (10L, "the dog sat on the mat", "en")
  ).toDF("doc_id", "text", "lang")

  private val batch1 = Seq(
    (101L, "the cat sat on the mat", "en"),
    (102L, "zq xv qq pp", "en"))
  private val batch2 = Seq(
    (201L, "the dog sat", "en"),
    (202L, "solo", "en"),
    // content-identical to a batch-1 doc: must score the same number
    (203L, "the cat sat on the mat", "en"))

  test("stream ≡ batch per micro-batch and over the union; scores are content-pure") {
    implicit val sqlCtx = spark.sqlContext
    val lm = StreamingPerplexity.frozenLm(reference)

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "lang")
    val perBatch = mutable.Map.empty[Long, Map[Long, (Long, Option[Double])]]
    val q = StreamingPerplexity.sink(docs, lm,
      (scored, id) => perBatch.synchronized { perBatch(id) = rows(scored) })
      .start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    def expected(b: Seq[(Long, String, String)]) =
      rows(StreamingPerplexity.scoreBatch(
        b.toDF("doc_id", "text", "lang"), lm))

    assert(perBatch(0L) == expected(batch1), "batch 0: stream ≡ batch")
    assert(perBatch(1L) == expected(batch2), "batch 1: stream ≡ batch")
    // union over batches ≡ one pass over all rows: the LM is frozen, so
    // batch boundaries cannot move any score
    assert(perBatch(0L) ++ perBatch(1L) == expected(batch1 ++ batch2),
      "sliced ≡ one-shot under a frozen yardstick")
    // content-pure: the same text scores the same number in any batch
    assert(perBatch(0L)(101L) == perBatch(1L)(203L))
    // and the semantics carried over: reference-like beats gibberish,
    // <2 tokens is NULL
    assert(perBatch(0L)(101L)._2.get > perBatch(0L)(102L)._2.get)
    assert(perBatch(1L)(202L) == (0L, None))
  }

  test("frozen LM equals the batch pipeline's reference LM") {
    // the full-corpus batch path (reference slice inline) and the
    // frozen streaming path must score a doc identically
    val corpus = reference.union(
      Seq((101L, "the cat sat on the mat", "en")).toDF("doc_id", "text", "lang"))
    val batchScore = rows(DataSelection.perplexityScore(corpus))
    val lm = StreamingPerplexity.frozenLm(corpus)
    val streamScore = rows(StreamingPerplexity.scoreBatch(
      Seq((101L, "the cat sat on the mat", "en")).toDF("doc_id", "text", "lang"),
      lm))
    assert(batchScore(101L) == streamScore(101L))
  }
}
