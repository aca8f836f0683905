package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.UnigramLm
import graft.queries.Round19Queries

/** MemoryStream proof of the tokenizer-health admission twin
  * ([[StreamingTokenizerStats]]): stream ≡ static, the reduction
  * agrees with a hand computation on a frozen tiny vocab, a vocab
  * WITHOUT full character coverage bills unsegmentable occurrences in
  * unseg_frac instead of dropping them, and the sink keeps zero
  * streaming state. */
class StreamingTokenizerStatsSpec extends SparkSpec {
  import spark.implicits._

  // "ab" -> 1 piece; "abc" -> ab+c (2); "zz" has NO vocab cover
  private val vocab = Map(
    "a" -> -2.0, "b" -> -2.5, "c" -> -3.0, "ab" -> -1.0)

  private val batch = Seq(
    (1L, "ab abc ab"),
    (2L, "abc zz"))

  test("hand computation: fertility over segmentable mass, unsegmentable billed in unseg_frac") {
    val row = StreamingTokenizerStats.admitBatch(
      batch.toDF("doc_id", "text"), vocab).head()
    // words: ab(freq 2), abc(freq 2), zz(freq 1)
    assert(row.getLong(0) == 3 && row.getLong(1) == 5, s"counts: $row")
    // segmentable: ab -> 1 piece (x2), abc -> ab c = 2 pieces (x2)
    assert(row.getLong(2) == 4 && row.getLong(3) == 6, s"pieces: $row")
    assert(row.getDouble(4) == 1.5, s"fertility 6/4: $row")
    assert(row.getDouble(5) == 0.2, s"unseg 1/5: $row")
  }

  test("full-coverage vocab at the registry fixture: twin ≡ the q_unigram_segment reduction") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val twin = StreamingTokenizerStats.admitBatch(
      docs, Round19Queries.uniVocab.toMap).head()
    val seg = UnigramLm.viterbiSegment(
      UnigramLm.wordFreqs(docs), Round19Queries.uniVocab.toMap, 4)
    val exp = seg.agg(count(lit(1)), sum("freq"),
      sum(col("freq") * col("n_pieces"))).head()
    assert(twin.getLong(0) == exp.getLong(0))
    assert(twin.getLong(1) == exp.getLong(1))
    assert(twin.getLong(2) == exp.getLong(1), "full coverage: seg_freq == total_freq")
    assert(twin.getLong(3) == exp.getLong(2))
    assert(twin.getDouble(5) == 0.0, "full coverage: unseg_frac 0")
  }

  test("empty batch: zero counts, NULL rates, no crash (the day-one contract)") {
    val row = StreamingTokenizerStats.admitBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), vocab).head()
    assert(row.getLong(0) == 0 && row.getLong(1) == 0 &&
      row.getLong(2) == 0 && row.getLong(3) == 0, s"zeros: $row")
    assert(row.isNullAt(4) && row.isNullAt(5),
      s"rates undefined on an empty batch: $row")
  }

  test("stream ≡ static; zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val static = StreamingTokenizerStats.admitBatch(
      batch.toDF("doc_id", "text"), vocab).head().toSeq

    val input = MemoryStream[(Long, String)]
    val got = mutable.Map.empty[Long, Seq[Any]]
    val q = StreamingTokenizerStats.sink(vocab,
      input.toDF().toDF("doc_id", "text"),
      (stats, id) => got.synchronized { got(id) = stats.head().toSeq })
      .start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "tokenizer stats must keep NO streaming state")
      assert(got.values.toSeq == Seq(static), s"stream ≠ static: $got")
    } finally q.stop()
  }
}
