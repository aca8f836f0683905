package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** MemoryStream proof of the streaming quality classifier
  * ([[StreamingClassifier]]): frozen weights separate a junk-shaped
  * arrival from a quality-shaped one, stream ≡ static, unseen tokens
  * count toward length but contribute no weight, zero streaming
  * state. */
class StreamingClassifierSpec extends SparkSpec {
  import spark.implicits._

  // weak label = length median: long docs carry "excellent thorough
  // analysis", short docs carry "junk spam filler" — so the trained
  // weights load those tokens with the right signs
  private val corpus = Seq(
    (1L, "excellent thorough analysis of the quarterly engineering metrics pipeline", 74),
    (2L, "another excellent thorough analysis with careful methodology and detail", 72),
    (3L, "deep excellent thorough analysis covering the storage layer end to end", 71),
    (4L, "junk spam filler", 16),
    (5L, "junk spam filler again", 22),
    (6L, "total junk spam filler text", 27)
  ).toDF("doc_id", "text", "n_chars")

  private val batch = Seq(
    (101L, "an excellent thorough analysis arriving now", 44),
    (102L, "junk spam filler arriving now", 29),
    (103L, "zzz qqq www", 11) // entirely outside the frozen vocab
  )

  test("stream ≡ static; quality kept, junk dropped, unseen-vocab doc scores 0") {
    implicit val sqlCtx = spark.sqlContext
    val w = StreamingClassifier.weights(corpus)

    val static = StreamingClassifier.admitBatch(
      batch.toDF("doc_id", "text", "n_chars"), w)
    val rows = static.as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(101L)._4, s"quality doc dropped: $rows")
    assert(!rows(102L)._4, s"junk doc kept: $rows")
    // unseen vocab: dl counts its 3 tokens, weights contribute nothing
    assert(rows(103L)._2 == 3L && rows(103L)._3 == 0.0 && !rows(103L)._4,
      s"unseen-vocab doc must score exactly 0 over dl=3: $rows")

    val input = MemoryStream[(Long, String, Int)]
    val perBatch = mutable.Map.empty[Long, Set[(Long, Long, Double, Boolean)]]
    val q = StreamingClassifier.sink(w,
      input.toDF().toDF("doc_id", "text", "n_chars"),
      (scored, id) => perBatch.synchronized {
        perBatch(id) = scored.as[(Long, Long, Double, Boolean)].collect().toSet
      })
      .start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "classifier admission must keep zero streaming state")
    } finally q.stop()
    assert(perBatch(0L) == rows.values.toSet,
      s"stream ${perBatch(0L)} != static ${rows.values.toSet}")
  }
}
