package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.extensions.Dedup
import graft.multimodal.Multimodal

/** Streaming twin of the JOINT multimodal↔text dedup composition
  * (q_media_text_dedup): one arriving stream of paired (doc, media)
  * rows is checked against the accumulated corpus on BOTH channels
  * before admission, and every candidate pair is channel-attributed —
  * `text` (same caption, new image), `media` (same image, new caption),
  * or `both` (straight re-post) — the triage a curation pipeline runs
  * on re-uploads.
  *
  * Shape: the corpus persists TWO band indexes, text SimHash and image
  * perceptual hash, both `(id, h, i, bv)` frames from
  * [[Dedup.hammingBands]] (at 100 TB each written bucketed by
  * `(i, bv)`, so per-batch probes need no index-side shuffle — the
  * [[StreamingDedup]] bucketed-index contract). ALL per-batch work runs
  * INSIDE foreachBatch, where the micro-batch is a plain DataFrame:
  * SimHash needs a per-doc shingle aggregation that would be a stateful
  * streaming aggregation on the raw stream side, but inside the batch
  * it is ordinary batch work — the same placement [[StreamingDsir]] /
  * [[StreamingPerplexity]] use for their scoring joins. The two
  * candidate frames are both batch-derived, so the channel-attribution
  * full-outer join is a plain batch join too, never a stream-stream
  * join with state.
  *
  * With `numBands > maxHamming` BOTH probes are pigeonhole-complete
  * ([[Dedup.hammingBandPairs]]'s contract): every within-threshold
  * (corpus, arriving) pair surfaces on its channel — so the attribution
  * is exact, not banding-shaped. Parity with the static composition is
  * pinned in StreamingJointDedupSpec; the output is a pure function of
  * the micro-batch, so replay re-produces it bitwise (idempotent
  * handoff via the batchId, like every foreachBatch sink here).
  *
  * Index growth works like the single-channel twins: append the
  * admitted batch's band rows to each index and later batches see
  * them. */
object StreamingJointDedup {

  /** Probe one 64-bit Hamming band index with an arriving hash frame:
    * (corpus_id, new_id, hamming ≤ maxHamming). The exact-distance
    * filter runs after the band-equality join, so the join itself is an
    * equi-join a bucketed index serves shuffle-free. */
  private def probe(
      index: DataFrame,
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int,
      numBands: Int): DataFrame =
    index.alias("x")
      .join(Dedup.hammingBands(hashes, idCol, hashCol, numBands).alias("y"),
        col("x.i") === col("y.i") && col("x.bv") === col("y.bv") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("corpus_id"), col("y.id").as("new_id"),
        expr("CAST(bit_count(x.h ^ y.h) AS INT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** The per-batch composition over a STATIC paired frame
    * (`doc_id`, `text`, media payload columns of
    * [[Multimodal.MediaRow]] keyed by doc_id = media_id): probe both
    * indexes, full-outer join on the pair key, attribute the channel.
    * Exposed so the spec (and any batch backfill) can run the exact
    * code path the sink runs per micro-batch. */
  def jointCandidates(
      spark: SparkSession,
      textIndex: DataFrame,
      mediaIndex: DataFrame,
      batch: DataFrame,
      maxHamming: Int = 3,
      numBands: Int = 4): DataFrame = {
    import spark.implicits._
    val textCands = probe(textIndex,
      Dedup.simHash(batch.select(col("doc_id"), col("text")), share = false),
      "doc_id", "simhash", maxHamming, numBands)
      .withColumnRenamed("hamming", "t_hamming")
    val media = batch
      .select(col("doc_id").as("media_id"), col("kind"), col("payload"),
        col("meta"))
      .as[Multimodal.MediaRow]
    val mediaCands = probe(mediaIndex,
      Multimodal.imageHashes(media).toDF(), "media_id", "ahash",
      maxHamming, numBands)
      .withColumnRenamed("hamming", "m_hamming")
    textCands.join(mediaCands, Seq("corpus_id", "new_id"), "full_outer")
      .select(col("corpus_id"), col("new_id"), col("t_hamming"),
        col("m_hamming"),
        when(col("t_hamming").isNotNull && col("m_hamming").isNotNull,
          lit("both"))
          .when(col("t_hamming").isNotNull, lit("text"))
          .otherwise(lit("media")).as("channel"))
  }

  /** foreachBatch sink over [[jointCandidates]]: hands each micro-batch's
    * channel-attributed pair frame to `onBatch` with the batch id
    * (idempotent under replay — the frame is a pure function of the
    * batch). Call `.start()` on the result. */
  def sink(
      textIndex: DataFrame,
      mediaIndex: DataFrame,
      arriving: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      maxHamming: Int = 3,
      numBands: Int = 4): DataStreamWriter[Row] =
    arriving.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        onBatch(jointCandidates(batch.sparkSession, textIndex, mediaIndex,
          batch.toDF(), maxHamming, numBands), batchId)
      }
}
