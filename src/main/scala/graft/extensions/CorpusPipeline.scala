package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the composition every
  * LLM-data pipeline runs, built entirely from this engine's operators:
  *
  *   quality gate → exact dedup → near-dup removal (MinHash-LSH) →
  *   deterministic train/val split
  *
  * Every stage is a DataFrame transform (no collects, no UDFs), so the
  * whole pipeline is one Catalyst plan: at 100 TB it runs as a handful
  * of shuffles (quality gate is narrow; exact dedup shuffles on the
  * content hash; LSH shuffles on band keys; the split is narrow again).
  *
  * Near-dup policy is greedy-keep-lowest: every pair (a < b) drops b, so
  * the lowest doc_id of each near-dup chain survives. Deterministic and
  * order-independent. The split hashes doc_id (content-independent, so
  * re-cleaning with new thresholds never migrates surviving docs across
  * splits). */
object CorpusPipeline {

  final case class Thresholds(
      minTokens: Long = 20,
      maxTokens: Long = 70,
      maxStopRatio: Double = 0.12,
      trainHexBound: String = "c") // md5 first hex < bound → train (c = 75%)

  /** @param containmentTau as [[cleanFull]]'s: when set, the near-dup
    *   stage drops the CONTAINED side of each candidate pair instead of
    *   blindly dropping b. */
  def clean(documents: DataFrame, t: Thresholds = Thresholds(),
      containmentTau: Option[Double] = None): DataFrame = {
    // 1. quality gate (TextAnalysis metrics, filtered before anything heavy)
    val quality = TextAnalysis.qualityScore(documents)
      .filter(col("n_tok").between(t.minTokens, t.maxTokens) &&
        col("stop_ratio") <= t.maxStopRatio)
      .select("doc_id")
    dedupAndSplit(documents, documents.join(quality, "doc_id"), t,
      containmentTau = containmentTau)
  }

  /** [[clean]] plus the two remaining gates a pretraining pipeline runs —
    * a repetition/boilerplate gate and benchmark decontamination:
    *
    *   quality gate → repetition gate → decontamination → exact dedup →
    *   near-dup removal (MinHash-LSH) → deterministic split
    *
    * Gate order is cost order: the two narrow per-row gates (quality,
    * duplicate-bigram ratio) drop rows before the decontamination
    * broadcast probe, which drops rows before anything that shuffles
    * (content-hash dedup, LSH banding).
    *
    * The decontaminated frame is materialized once (localCheckpoint):
    * the dedup tail references it several times (hash keepers, the
    * keeper join, the LSH semi side, the final anti-join), and leaving
    * it lazy re-evaluates the whole gate chain — shuffles included —
    * per reference (measured 20 s vs 3 s at sf0.1). At cluster scale
    * this is the natural stage boundary a pipeline persists to storage
    * between gating and dedup. */
  /** @param containmentTau when set, the near-dup stage's drop
    *   DIRECTION is decided by containment instead of position: a
    *   candidate pair whose a-side is the contained one (cont_a ≥ tau,
    *   cont_b < tau) drops a — the quote, the re-post, the
    *   boilerplate-wrapped subset — where the default rule blindly
    *   drops b and can keep the fragment over its container
    *   (Round9OpsSpec pins exactly that reversal). Mutual or sub-tau
    *   containment falls back to the usual drop-b rule, so symmetric
    *   near-dups behave as before. Computed from the stage's own
    *   shingles and LSH pairs ([[Dedup.containmentFrom]]) — no extra
    *   signature build, only the candidate-driven intersection joins. */
  def cleanFull(
      documents: DataFrame,
      benchmark: DataFrame,
      t: Thresholds = Thresholds(),
      maxDupBigram: Double = 0.2,
      contamGram: Int = 5,
      containmentTau: Option[Double] = None): DataFrame = {
    val decon = gatedDecon(documents, benchmark, t, maxDupBigram, contamGram)
    // shareShingles=false: the checkpointed frame's plan is unique per
    // run, so session-memoizing shingles keyed on it would only grow the
    // memo without ever hitting
    dedupAndSplit(decon, decon, t, shareShingles = false,
      containmentTau = containmentTau)
  }

  /** [[cleanFull]]'s GATE stage, exposed as the pipeline's natural
    * seam (and the decade lever's stage boundary — TimeDecadeLever
    * bills it solo at sf1/sf10): quality → repetition →
    * decontamination, MATERIALIZED. Returns the checkpointed
    * decontaminated frame the dedup tail consumes. */
  def gatedDecon(
      documents: DataFrame,
      benchmark: DataFrame,
      t: Thresholds = Thresholds(),
      maxDupBigram: Double = 0.2,
      contamGram: Int = 5): DataFrame = {
    val quality = TextAnalysis.qualityScore(documents)
      .filter(col("n_tok").between(t.minTokens, t.maxTokens) &&
        col("stop_ratio") <= t.maxStopRatio)
      .select("doc_id")
    // repetition gate: narrow — computed in the filter itself, no join
    val grams = TextAnalysis.wordNgrams(2)
    val nBi = size(grams).cast("long")
    val nDis = size(array_distinct(grams)).cast("long")
    val dupRatio = when(nBi > 0, (nBi - nDis) * lit(1.0) / nBi).otherwise(lit(0.0))
    val gated = documents.filter(dupRatio <= maxDupBigram).join(quality, "doc_id")
    // decontamination: drop docs sharing any contamGram-gram with the
    // benchmark (5 by default — the eval-leak gram should be long enough
    // that coincidental phrase reuse does not wipe the corpus)
    val contaminated = TextAnalysis
      .contaminationHits(gated, benchmark, contamGram).select("doc_id")
    gated.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint()
  }

  /** Shared tail of [[clean]]/[[cleanFull]]: exact dedup → LSH near-dup
    * removal (± containment gate) → split, over `gated` (a filtered
    * view of `documents`). */
  private[graft] def dedupAndSplit(
      documents: DataFrame, gated: DataFrame, t: Thresholds,
      shareShingles: Boolean = true,
      containmentTau: Option[Double] = None): DataFrame = {
    // exact dedup: keep the smallest doc_id per content hash
    val keepers = gated
      .groupBy(md5(lower(coalesce(col("text"), lit(""))).cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val exactDeduped = gated.join(keepers, "doc_id")

    // near-dup removal: MinHash-LSH candidates, drop the b of each pair.
    // The filtered corpus' shingles are derived from the session-shared
    // FULL-corpus shingle frame by a semi-join on the surviving ids —
    // identical rows (per-doc shingles are independent), but the scan +
    // explode + distinct shuffle happens once per session instead of once
    // per pipeline; the keeper-id side is small and broadcasts.
    val sh = Dedup.shingles(documents, share = shareShingles)
      .join(exactDeduped.select("doc_id"), "doc_id")
    val pairs = Dedup.minHashLshFromShingles(sh)
    // optional containment gate: same drop-one-per-pair cardinality,
    // but the DIRECTION follows the content — the contained side goes,
    // whichever position it holds (see cleanFull scaladoc). The SAME
    // shingles and LSH pairs feed the containment scores, so the gate
    // adds only the candidate-driven intersection joins.
    val removed = containmentTau match {
      case Some(tau) =>
        Dedup.containmentFrom(sh, pairs)
          .select(when(col("cont_a") >= tau && col("cont_b") < tau, col("a"))
            .otherwise(col("b")).as("doc_id"))
          .distinct()
      case None => pairs.select(col("b").as("doc_id")).distinct()
    }
    val surviving = exactDeduped.join(removed, Seq("doc_id"), "left_anti")

    // deterministic content-independent split
    surviving.select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < t.trainHexBound,
        lit("train")).otherwise(lit("val")).as("split"))
  }

  /** "Where did my corpus go?" — first-fail attribution for
    * [[cleanFull]]'s whole gate chain, in [[Funnel]]'s report shape:
    * (stage_idx, rule, n_dropped, n_remaining) over
    *
    *   quality → repetition → contamination → exact_dup → near_dup →
    *   pass
    *
    * Each doc is attributed to the FIRST stage that drops it, so the
    * per-stage counts sum exactly to `total − survivors` and the pass
    * row's n_remaining equals [[cleanFull]]'s survivor count (pinned in
    * GatesSpec) — the release-note table every corpus ship includes
    * beside its [[DataCard]].
    *
    * Attribution recomputes the SAME stage frames the pipeline runs
    * (same operators, same filtered populations: contamination is
    * probed on the gated set, exact-dup keepers on the decontaminated
    * set, near-dup pairs among the exact-deduped survivors — a
    * stage's verdict on a doc that earlier stages already dropped is
    * never computed, matching what [[cleanFull]] actually does).
    * Scale shape: the stage id-sets are narrow one-column frames,
    * membership is five key joins, and the report collapses to a
    * stages-cardinality frame before its (bounded) windows. */
  def funnelFull(
      documents: DataFrame,
      benchmark: DataFrame,
      t: Thresholds = Thresholds(),
      maxDupBigram: Double = 0.2,
      contamGram: Int = 5): DataFrame = {
    // each stage's verdict feeds BOTH the next stage's population and
    // the final attribution joins — so the two NARROW per-row gates
    // are fused into ONE flags frame over one corpus scan and
    // materialized once (unchecked, the plan re-ran the whole gate
    // chain per consumer: 14 corpus scans at the same answer; and one
    // checkpoint per gate still serialized three corpus passes).
    // The quality predicate replicates TextAnalysis.qualityScore's
    // exact arithmetic (unfiltered space split, round-4 stop ratio) —
    // the oracle re-derives both gates independently, so drift between
    // this inline form and cleanFull's qualityScore gate breaks the
    // q_pipeline_funnel hash AND the GatesSpec reconciliation pin.
    val arr = split(coalesce(col("text"), lit("")), " ")
    val nTok = size(arr).cast("long")
    val stopArr = array(lit("the"), lit("a"))
    val nStop = size(filter(arr, x => array_contains(stopArr, x))).cast("long")
    val qPred = nTok.between(t.minTokens, t.maxTokens) &&
      round(nStop * lit(1.0) / nTok, 4) <= t.maxStopRatio
    val grams = TextAnalysis.wordNgrams(2)
    val nBi = size(grams).cast("long")
    val nDis = size(array_distinct(grams)).cast("long")
    val dupRatio =
      when(nBi > 0, (nBi - nDis) * lit(1.0) / nBi).otherwise(lit(0.0))
    val flags = documents
      .select(col("doc_id"),
        coalesce(qPred, lit(false)).as("_q"),
        coalesce(dupRatio <= maxDupBigram, lit(false)).as("_r"))
      .localCheckpoint()
    val gated = documents
      .join(flags.filter(col("_q") && col("_r")).select("doc_id"), "doc_id")
    val contaminated = TextAnalysis
      .contaminationHits(gated, benchmark, contamGram).select("doc_id")
      .localCheckpoint()
    val decon = gated.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint() // same stage boundary as cleanFull (see above)
    val keepers = decon
      .groupBy(md5(lower(coalesce(col("text"), lit(""))).cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val ed = decon.join(keepers, "doc_id").select("doc_id")
    val sh = Dedup.shingles(decon, share = false).join(ed, "doc_id")
    val removed = Dedup.minHashLshFromShingles(sh)
      .select(col("b").as("doc_id")).distinct()

    def mark(ids: DataFrame, name: String) =
      ids.withColumn(name, lit(true))
    val stageIdx = flags
      .join(mark(contaminated, "_c"), Seq("doc_id"), "left_outer")
      .join(mark(keepers, "_k"), Seq("doc_id"), "left_outer")
      .join(mark(removed, "_nd"), Seq("doc_id"), "left_outer")
      .select(when(!col("_q"), 0)
        .when(!col("_r"), 1)
        .when(col("_c").isNotNull, 2)
        .when(col("_k").isNull, 3)
        .when(col("_nd").isNotNull, 4)
        .otherwise(5).as("stage_idx"))
    Funnel.shape(stageIdx, Seq(
      "quality", "repetition", "contamination", "exact_dup", "near_dup"))
  }
}
