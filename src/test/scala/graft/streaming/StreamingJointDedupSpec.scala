package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.extensions.Dedup
import graft.multimodal.{Multimodal, TestAudio, TestImages}

object StreamingJointDedupSpec {
  /** One arriving row of the paired stream: a document AND its
    * attachment, keyed by the same id on both channels. */
  case class PairedRow(doc_id: Long, text: String, kind: String,
                       payload: Array[Byte], meta: Multimodal.MediaMeta)
}

/** MemoryStream proof of the JOINT admission story
  * ([[StreamingJointDedup]]): per-batch channel attribution over real
  * PNG aHash + text SimHash is exact, equals the static composition run
  * on the same batch, and the stream keeps zero state. */
class StreamingJointDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamingJointDedupSpec.PairedRow

  private val noMeta = Multimodal.MediaMeta(None, None, None, None)
  private def row(id: Long, text: String, seed: Int,
                  perturb: Boolean = false): PairedRow =
    PairedRow(id, text, "image", TestImages.seededPng(seed, perturb), noMeta)

  private val t1 = "senior spark engineer wanted for the lakehouse team"
  private val t2 = "completely unrelated caption about embedded firmware qa"
  private val t3 = "a third caption describing the quarterly data audit"

  // corpus: three paired docs with mutually-unrelated captions + images
  private val corpus = Seq(row(1L, t1, 1), row(2L, t2, 9), row(3L, t3, 77))

  private def indexes(): (DataFrame, DataFrame) = {
    val docs = corpus.toDF().select(col("doc_id"), col("text"))
    val media = corpus.map(r =>
      Multimodal.MediaRow(r.doc_id, r.kind, r.payload, r.meta)).toDS()
    val ti = Dedup.hammingBands(
      Dedup.simHash(docs, share = false), "doc_id", "simhash")
      .localCheckpoint()
    val mi = Dedup.hammingBands(
      Multimodal.imageHashes(media).toDF(), "media_id", "ahash")
      .localCheckpoint()
    (ti, mi)
  }

  private def channels(df: DataFrame): Map[(Long, Long), String] =
    df.select("corpus_id", "new_id", "channel")
      .as[(Long, Long, String)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap

  // the arriving batch exercises all four shapes:
  //   101: d1's caption verbatim, novel image      -> text with 1
  //   102: novel caption, near-dup of d2's image   -> media with 2
  //   103: d3's caption verbatim, near-dup image   -> both with 3
  //   104: novel caption, novel image              -> nothing
  private val batch = Seq(
    row(101L, t1, 42),
    row(102L, "totally new words about gardening and tea", 9, perturb = true),
    row(103L, t3, 77, perturb = true),
    row(104L, "yet another disjoint caption on marine biology", 55))

  private val expected = Map(
    (1L, 101L) -> "text",
    (2L, 102L) -> "media",
    (3L, 103L) -> "both")

  test("sink: channel attribution exact per micro-batch; zero streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val (ti, mi) = indexes()
    val input = MemoryStream[PairedRow]
    val perBatch = mutable.Map.empty[Long, Map[(Long, Long), String]]
    val q = StreamingJointDedup.sink(ti, mi, input.toDF(),
      (pairs, id) => perBatch.synchronized { perBatch(id) = channels(pairs) })
      .start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "joint admission must keep zero streaming state")
    } finally q.stop()
    assert(perBatch(0L) == expected, perBatch.toString)
  }

  test("stream ≡ static: the sink's per-batch frame is jointCandidates on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val (ti, mi) = indexes()
    val staticGot = channels(StreamingJointDedup.jointCandidates(
      spark, ti, mi, batch.toDF()))
    assert(staticGot == expected, staticGot.toString)
    // and the hamming columns agree pairwise with the static run
    val input = MemoryStream[PairedRow]
    var streamed: Set[(Long, Long, Option[Int], Option[Int])] = Set.empty
    val q = StreamingJointDedup.sink(ti, mi, input.toDF(), (pairs, _) =>
      streamed = pairs
        .select("corpus_id", "new_id", "t_hamming", "m_hamming")
        .as[(Long, Long, Option[Int], Option[Int])].collect().toSet)
      .start()
    try { input.addData(batch); q.processAllAvailable() } finally q.stop()
    val static = StreamingJointDedup.jointCandidates(spark, ti, mi, batch.toDF())
      .select("corpus_id", "new_id", "t_hamming", "m_hamming")
      .as[(Long, Long, Option[Int], Option[Int])].collect().toSet
    assert(streamed == static, s"stream $streamed != static $static")
  }

  test("modality-complete media channel: audio attachments probe the envelope index, never cross-kind") {
    implicit val sqlCtx = spark.sqlContext
    // corpus: d1 image-attached, d4 AUDIO-attached (kind-segregated
    // indexes — an ahash and an ehash must never be compared)
    val audioCorpusRow = PairedRow(4L,
      "a fourth caption narrating the incident postmortem call",
      "audio", TestAudio.seededWav(7), noMeta)
    val full = corpus :+ audioCorpusRow
    val docs = full.toDF().select(col("doc_id"), col("text"))
    val media = full.map(r =>
      Multimodal.MediaRow(r.doc_id, r.kind, r.payload, r.meta)).toDS()
    val ti = Dedup.hammingBands(
      Dedup.simHash(docs, share = false), "doc_id", "simhash")
      .localCheckpoint()
    val ii = Dedup.hammingBands(
      Multimodal.imageHashes(media).toDF(), "media_id", "ahash")
      .localCheckpoint()
    val ai = Dedup.hammingBands(
      Multimodal.audioHashes(media).toDF(), "media_id", "ehash")
      .localCheckpoint()
    // arriving: 201 audio near-dup of d4's clip (1-sample nudge), novel
    // caption -> media; 202 d4's caption + near-dup clip -> both;
    // 203 novel audio + novel caption -> nothing; 101 (image leg) must
    // keep working beside the audio leg
    val audioBatch = Seq(
      batch.head, // 101: d1's caption, novel image -> text with 1
      PairedRow(201L, "novel words on the migration of arctic terns",
        "audio", TestAudio.seededWav(7, perturbAt = 777), noMeta),
      PairedRow(202L, audioCorpusRow.text, "audio",
        TestAudio.seededWav(7, perturbAt = 1234), noMeta),
      PairedRow(203L, "entirely fresh caption on sourdough hydration",
        "audio", TestAudio.seededWav(40), noMeta))
    val got = channels(StreamingJointDedup.jointCandidates(
      spark, ti, ii, audioBatch.toDF(), audioIndex = Some(ai)))
    assert(got == Map(
      (1L, 101L) -> "text",
      (4L, 201L) -> "media",
      (4L, 202L) -> "both"), got.toString)
  }

  test("fails fast on attachment kinds with no matching index — no silent unprobed admission") {
    // r16 ADVICE: an audio re-post arriving while audioIndex = None used
    // to be admitted as novel with zero signal that a modality went
    // unprobed. Now the batch is rejected loudly.
    val (ti, mi) = indexes()
    val audioRow = PairedRow(301L, "caption that rides an audio attachment",
      "audio", graft.multimodal.TestAudio.seededWav(3), noMeta)
    val e = intercept[IllegalArgumentException] {
      StreamingJointDedup.jointCandidates(
        spark, ti, mi, (batch :+ audioRow).toDF())
    }
    assert(e.getMessage.contains("audio"), e.getMessage)
    // and the same batch WITH the audio index supplied goes through
    val ai = Dedup.hammingBands(
      Multimodal.audioHashes(Seq(Multimodal.MediaRow(4L, "audio",
        graft.multimodal.TestAudio.seededWav(7), noMeta)).toDS()).toDF(),
      "media_id", "ehash").localCheckpoint()
    val got = channels(StreamingJointDedup.jointCandidates(
      spark, ti, mi, (batch :+ audioRow).toDF(), audioIndex = Some(ai)))
    assert(got == expected, got.toString)
  }

  test("a NULL kind reaches the diagnostic, not an NPE out of sorted") {
    // r17 ADVICE: the unprobed-kind guard collected a null element and
    // NPE'd inside Ordering[String].sorted before its require message
    // could print — the one failure mode worse than admitting the row.
    val (ti, mi) = indexes()
    val nullKindRow = PairedRow(302L, "caption whose kind column is null",
      null, TestImages.seededPng(13), noMeta)
    val e = intercept[IllegalArgumentException] {
      StreamingJointDedup.jointCandidates(
        spark, ti, mi, (batch :+ nullKindRow).toDF())
    }
    assert(e.getMessage.contains("null"), e.getMessage)
    assert(e.getMessage.contains("no matching index"), e.getMessage)
  }

  test("both probe legs stay banded equi-joins — no cartesian, no nested loop") {
    val (ti, mi) = indexes()
    val p = StreamingJointDedup.jointCandidates(spark, ti, mi, batch.toDF())
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
