package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ship-it artifact — the final training set a data pipeline
  * actually delivers to a trainer, composed end-to-end from operators
  * that are each oracle-verified on their own:
  *
  *   [[Dedup.trainEvalSplit]]  (leakage-safe fold ∘ mixture admission)
  *   ∘ [[TextAnalysis.exactSubstrApply]]  (span-level scrub of the TEXT)
  *   ∘ [[Packing.packChunks]]  (fixed-budget sequence packing)
  *
  * The composition is where interface drift hides: packing runs on the
  * SCRUBBED text, so a scrub that changes token counts silently
  * re-chunks everything downstream — q_training_set pins exactly that
  * coupling (the oracle derives the packed token counts through the
  * INDEPENDENT n_tok − n_removed route, so apply/clean divergence
  * surfaces as a hash mismatch; ExactSubstrSpec pins the same identity
  * unit-side).
  *
  * Policy: `dropped` docs (mixture-rejected) never ship; docs scrubbed
  * to emptiness don't ship either (a chunk of zero tokens is not a
  * training sequence). Shard = assignment:shardCol, so train and eval
  * pack into disjoint shard streams and a loader never mixes them.
  *
  * Scale shape: the CC labeling (bounded star iterations) + the
  * exact-substring window shuffle (`hashWindows` moves 8-byte keys at
  * 100 TB) + two doc_id equi-joins + ONE windowed cumulative sum on the
  * shard key — no new shuffle class beyond the composed pieces;
  * assignment rides the shard string so the packed output needs no
  * extra join back. */
object TrainingSet {

  def compose(
      documents: DataFrame,
      budget: Int = 64,
      k: Int = 6,
      hashWindows: Boolean = false,
      nFolds: Int = 10,
      evalFoldMin: Int = 8,
      alpha: Double = 0.5,
      buckets: Int = 100,
      shardCol: String = "lang"): DataFrame = {
    val assign = Dedup.trainEvalSplit(documents, nFolds, evalFoldMin, alpha, buckets)
    val scrub = TextAnalysis.exactSubstrApply(documents, k, hashWindows)
    val shipped = documents.select(col("doc_id"), col(shardCol))
      .join(assign.select("doc_id", "assignment"), "doc_id")
      .filter(col("assignment") =!= "dropped")
      .join(scrub, "doc_id")
      .filter(col("clean_text") =!= "")
      .select(col("doc_id"),
        concat_ws(":", col("assignment"), col(shardCol)).as("shard"),
        col("clean_text").as("text"))
    Packing.packChunks(shipped, budget, "shard")
      .withColumn("assignment", substring_index(col("shard"), ":", 1))
  }

  /** [[compose]] WITH its payload — the manifest joined back to the
    * shipped text (compose's packing rows are metadata only), the frame
    * a writer actually serializes to training shards.
    *
    * @param piiScrub when set, the text additionally passes
    *   [[Pii.cleanColumn]] — the privacy leg of the artifact. Safe to
    *   bolt on AFTER the packing decisions exactly because the PII
    *   scrub is whitespace-token-count-preserving (no pattern spans a
    *   space, no placeholder contains one): the manifest — policy,
    *   shard streams, chunk geometry — is bit-identical with the leg
    *   on or off, only the text differs (spec-pinned in GatesSpec).
    *   The scrub frame is the SAME memoized exact-substring frame
    *   compose consumed, so the join-back costs one doc_id equi-join,
    *   not a recompute. */
  def composeText(
      documents: DataFrame,
      budget: Int = 64,
      k: Int = 6,
      hashWindows: Boolean = false,
      piiScrub: Boolean = false): DataFrame = {
    val text = TextAnalysis.exactSubstrApply(documents, k, hashWindows)
      .select(col("doc_id"),
        (if (piiScrub) Pii.cleanColumn(col("clean_text"))
         else col("clean_text")).as("text"))
    compose(documents, budget, k, hashWindows).join(text, "doc_id")
  }

  /** [[compose]] with TOKEN-BALANCED shards instead of the lang
    * passthrough: each assignment class (train / eval separately — a
    * loader must never mix them) is dealt serpentine over `numShards`
    * lanes by SCRUBBED token count ([[Packing.shardAssign]] on the
    * clean text), so every data-parallel worker gets the same token
    * budget instead of whatever a skewed lang distribution hands it.
    * Shard = assignment:lane. Ranking by the scrubbed count is the
    * point — balancing on pre-scrub counts would re-skew by exactly
    * the removed-span mass.
    *
    * Scale adds one metadata-only [[Packing.globalRowNumber]] pass per
    * class and a doc_id join-back on top of [[compose]]'s shape; the
    * packing window and everything below is unchanged. */
  def composeBalanced(
      documents: DataFrame,
      numShards: Int = 8,
      budget: Int = 64,
      k: Int = 6,
      hashWindows: Boolean = false,
      nFolds: Int = 10,
      evalFoldMin: Int = 8,
      alpha: Double = 0.5,
      buckets: Int = 100): DataFrame = {
    val assign = Dedup.trainEvalSplit(documents, nFolds, evalFoldMin, alpha, buckets)
    val scrub = TextAnalysis.exactSubstrApply(documents, k, hashWindows)
    // FOUR consumers read this frame (each class's filter + the
    // shardAssign metadata pass inside each) — unmaterialized, the
    // whole split∘scrub subtree re-ran per consumer (12 corpus scans
    // in the r13 census, the q_pipeline_funnel bug class); one
    // checkpoint is the stage boundary a cluster run persists anyway
    val shipped = documents.select(col("doc_id"))
      .join(assign.select("doc_id", "assignment"), "doc_id")
      .filter(col("assignment") =!= "dropped")
      .join(scrub, "doc_id")
      .filter(col("clean_text") =!= "")
      .select(col("doc_id"), col("assignment"), col("clean_text").as("text"))
      .localCheckpoint()
    val dealt = Seq("train", "eval").map { cls =>
      val sub = shipped.filter(col("assignment") === cls)
      sub.join(
        Packing.shardAssign(sub, numShards).select("doc_id", "shard"), "doc_id")
    }.reduce(_ unionByName _)
    val withShard = dealt.select(col("doc_id"),
      concat_ws(":", col("assignment"), col("shard")).as("shard"), col("text"))
    Packing.packChunks(withShard, budget, "shard")
      .withColumn("assignment", substring_index(col("shard"), ":", 1))
  }
}
