package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.extensions.Dedup
import graft.multimodal.Multimodal

/** MemoryStream proof of the media admission story: per-batch
  * candidates equal the batch-mode probe of the same images against the
  * same index, the stream stays stateless, and appending admitted band
  * rows grows the index — [[StreamingDedup]]'s contract, third
  * modality. */
class StreamingMediaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def photo(seed: Int): Multimodal.MediaRow =
    Multimodal.syntheticPhotos(spark, seed + 1).collect().last

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("corpus_id", "new_id").as[(Long, Long)].collect().toSet

  test("sink: an exact copy surfaces against the corpus index, a novel image does not; zero state") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Multimodal.syntheticPhotos(spark, 10)
    val index = Dedup.hammingBands(
      Multimodal.imageHashes(corpus).toDF(), "media_id", "ahash")
      .localCheckpoint()
    val batch = Seq(
      photo(3).copy(media_id = 101L), // exact copy: hamming 0 candidate
      photo(77).copy(media_id = 102L)) // novel: no candidate
    val input = MemoryStream[Multimodal.MediaRow]
    val perBatch = mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = StreamingMediaDedup.sink(index, input.toDS(),
      (pairs, id) => perBatch.synchronized { perBatch(id) = pairSet(pairs) })
      .start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "media admission must keep zero streaming state")
    } finally q.stop()
    assert(perBatch(0L) == Set((3L, 101L)),
      s"the exact copy must surface, the novel must not: ${perBatch(0L)}")
  }

  test("growing bucketed index: a dup of an earlier ADMITTED image surfaces, no restart") {
    implicit val sqlCtx = spark.sqlContext
    // the StreamingDedup growth discipline, third modality: the
    // admission loop probes the bucketed catalog table (refreshing ITS
    // session's cached relation first) and appends each admitted
    // batch's band rows — a later batch then sees earlier stream media
    val corpus = Multimodal.syntheticPhotos(spark, 4)
    graft.plans.Layout.writeBucketed(
      Dedup.hammingBands(Multimodal.imageHashes(corpus).toDF(),
        "media_id", "ahash"),
      "md_grow_idx", Seq("i", "bv"), 4)
    val novel = photo(77)
    val input = MemoryStream[Multimodal.MediaRow]
    val perBatch = mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = input.toDS().writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Multimodal.MediaRow], id: Long) =>
          spark.catalog.refreshTable("md_grow_idx")
          val pairs = StreamingMediaDedup
            .candidates(spark.table("md_grow_idx"), batch).distinct()
          perBatch.synchronized { perBatch(id) = pairSet(pairs) }
          graft.plans.Layout.appendBucketed(
            Dedup.hammingBands(Multimodal.imageHashes(batch).toDF(),
              "media_id", "ahash"),
            "md_grow_idx", Seq("i", "bv"), 4)
      }
      .start()
    try {
      input.addData(Seq(novel.copy(media_id = 102L))) // novel: admitted
      q.processAllAvailable()
      input.addData(Seq(novel.copy(media_id = 201L))) // dup of the admitted
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS md_grow_idx")
    }
    assert(perBatch(0L).isEmpty, "a novel image matches nothing")
    assert(perBatch(1L) == Set((102L, 201L)),
      s"the appended admission must be probed by the next batch: ${perBatch(1L)}")
  }

  test("stream/batch parity: candidates equal hammingBandPairs restricted to cross pairs") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Multimodal.syntheticPhotos(spark, 8)
    val index = Dedup.hammingBands(
      Multimodal.imageHashes(corpus).toDF(), "media_id", "ahash")
      .localCheckpoint()
    val batch = Seq(photo(2).copy(media_id = 300L), photo(55).copy(media_id = 301L))
    val input = MemoryStream[Multimodal.MediaRow]
    var got = Set.empty[(Long, Long)]
    val q = StreamingMediaDedup.sink(index, input.toDS(),
      (pairs, _) => got = pairSet(pairs)).start()
    try {
      input.addData(batch)
      q.processAllAvailable()
    } finally q.stop()
    // batch-mode oracle: complete banded pairing over corpus ∪ batch,
    // restricted to (corpus, batch) pairs
    val merged = corpus.union(spark.createDataset(batch))
    val all = Dedup.hammingBandPairs(
      Multimodal.imageHashes(merged).toDF(), "media_id", "ahash")
      .select("a", "b").as[(Long, Long)].collect().toSet
    val expected = all.filter { case (a, b) => a < 300L && b >= 300L }
    assert(got == expected, s"stream $got != batch $expected")
  }
}
