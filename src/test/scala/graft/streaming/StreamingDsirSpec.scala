package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.extensions.DataSelection

/** MemoryStream proof of the streaming DSIR scorer: per-batch frames
  * equal the batch scorer on the same rows against the same frozen
  * ratio table, scores are content-pure across batch boundaries, and
  * the FULL-DOMAIN ratio contract holds — a document made entirely of
  * tokens the fitting corpus never saw still scores every token
  * instead of silently dropping them. */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Map[Long, (Long, Option[Double])] =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  // fitting corpus: ids ≡ 0 mod 5 are the reference slice
  private def corpus: DataFrame = Seq(
    (0L, "the cat sat on the mat", "en"),
    (5L, "the cat sat on the mat again", "en"),
    (1L, "random web junk text here", "en"),
    (2L, "more raw pool words", "en")
  ).toDF("doc_id", "text", "lang")

  private val batch1 = Seq(
    (101L, "the cat sat"),
    (102L, "random junk"))
  private val batch2 = Seq(
    (201L, "the cat sat"), // content-identical to 101
    // every token UNSEEN by the fitting corpus: the full-domain ratio
    // must still score all 3 tokens (n_tok = 3, weight ≈ the all-zero
    // smoothed ratio), not drop them
    (202L, "zzz qqq www"),
    (203L, ""))

  test("stream ≡ batch; unseen tokens score via the full-domain ratio") {
    implicit val sqlCtx = spark.sqlContext
    val ratio = StreamingDsir.frozenRatio(corpus, buckets = 64)
    assert(ratio.count() == 64, "full feature domain materialized")

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val perBatch = mutable.Map.empty[Long, Map[Long, (Long, Option[Double])]]
    val q = StreamingDsir.sink(docs, ratio,
        (w, id) => perBatch.synchronized { perBatch(id) = rows(w) },
        buckets = 64)
      .start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    def expected(b: Seq[(Long, String)]) =
      rows(StreamingDsir.scoreBatch(b.toDF("doc_id", "text"), ratio, 64))
    assert(perBatch(0L) == expected(batch1), "batch 0: stream ≡ batch")
    assert(perBatch(1L) == expected(batch2), "batch 1: stream ≡ batch")
    // content-pure across boundaries
    assert(perBatch(0L)(101L) == perBatch(1L)(201L))
    // the never-seen-token doc scored ALL its tokens
    assert(perBatch(1L)(202L)._1 == 3L,
      s"unseen tokens must not be dropped: ${perBatch(1L)(202L)}")
    assert(perBatch(1L)(202L)._2.isDefined)
    // reference-like text outweighs never-seen text
    assert(perBatch(0L)(101L)._2.get > perBatch(1L)(202L)._2.get)
    // empty doc: n_tok 0, weight NULL
    assert(perBatch(1L)(203L) == (0L, None))
  }

  test("frozen ratio equals the batch pipeline's weights") {
    val ratio = StreamingDsir.frozenRatio(corpus, buckets = 64)
    val streamed = rows(StreamingDsir.scoreBatch(
      Seq((1L, "random web junk text here")).toDF("doc_id", "text"),
      ratio, 64))
    val batch = rows(DataSelection.dsirWeights(corpus, buckets = 64))
    assert(streamed(1L) == batch(1L),
      "the shared scorer + frozen ratio reproduce the batch weight")
  }
}
